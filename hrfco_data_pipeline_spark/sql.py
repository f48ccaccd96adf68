"""SQL surface: register the engine's tables as temp views.

SURVEY §7 Phase 1: the same queries must run through ``spark.sql``.
``register_all`` exposes the star schema plus the derived hydrology
tables (observations/stations/classified/alerts), so any §2 operator
can be expressed either through the DataFrame API (plans/*) or ANSI
SQL over these views — both compile to the same Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hrfco_data_pipeline_spark.operators.classify import (
    build_alerts,
    process_observations,
)
from hrfco_data_pipeline_spark.sources.synthetic import (
    synthetic_observations,
    synthetic_stations,
)
from hrfco_data_pipeline_spark.sources.tables import load_tables


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every engine table as a temp view; returns the frames."""
    frames = dict(load_tables(spark, sf_dir))
    frames["observations"] = synthetic_observations(spark, sf_dir)
    frames["stations"] = synthetic_stations(spark)
    frames["classified"] = process_observations(
        frames["observations"], frames["stations"]
    )
    frames["alerts"] = build_alerts(frames["classified"], extra_cols=("obs_id",))
    for name, df in frames.items():
        df.createOrReplaceTempView(name)
    return frames


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views then run a SQL query against them."""
    register_all(spark, sf_dir)
    return spark.sql(query)
