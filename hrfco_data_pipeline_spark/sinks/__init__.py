"""Sinks: partitioned archive, fact table, station upsert, DLQ."""

from hrfco_data_pipeline_spark.sinks.writers import (
    write_archive,
    write_fact,
    write_dlq,
    merge_stations,
)

__all__ = ["write_archive", "write_fact", "write_dlq", "merge_stations"]
