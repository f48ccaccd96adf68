"""Structured Streaming bindings of the batch transforms."""

from hrfco_data_pipeline_spark.streaming.pipeline import (
    observations_file_stream,
    run_stream,
)

__all__ = ["observations_file_stream", "run_stream"]
