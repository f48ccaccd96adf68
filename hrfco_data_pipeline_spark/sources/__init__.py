"""Batch/streaming sources: parquet star schema + observation wire format."""

from hrfco_data_pipeline_spark.sources.tables import TABLES, load_table, load_tables
from hrfco_data_pipeline_spark.sources.synthetic import (
    synthetic_observations,
    synthetic_stations,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "synthetic_observations",
    "synthetic_stations",
]
