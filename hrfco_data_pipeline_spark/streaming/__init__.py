"""Structured Streaming bindings of the batch transforms."""

from hrfco_data_pipeline_spark.streaming.pipeline import (
    observations_file_stream,
    run_stream,
)
from hrfco_data_pipeline_spark.streaming.serving import (
    AlertBroadcaster,
    active_stream_count,
    attach_broadcast,
    serve_memory,
)

__all__ = [
    "AlertBroadcaster",
    "active_stream_count",
    "attach_broadcast",
    "observations_file_stream",
    "run_stream",
    "serve_memory",
]
