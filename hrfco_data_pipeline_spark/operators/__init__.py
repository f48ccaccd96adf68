"""Relational / dataflow operators of the engine."""

from hrfco_data_pipeline_spark.operators.validate import (
    required_fields_filter,
    range_valid_flag,
    DEFAULT_MIN_WATER_LEVEL,
    DEFAULT_MAX_WATER_LEVEL,
    DEFAULT_MIN_FLOW_RATE,
    DEFAULT_MAX_FLOW_RATE,
)
from hrfco_data_pipeline_spark.operators.classify import (
    parse_observations,
    join_thresholds,
    classify,
    build_alerts,
    valid_threshold_count,
    flood_warning_level,
)

__all__ = [
    "required_fields_filter",
    "range_valid_flag",
    "parse_observations",
    "join_thresholds",
    "classify",
    "build_alerts",
    "valid_threshold_count",
    "flood_warning_level",
    "DEFAULT_MIN_WATER_LEVEL",
    "DEFAULT_MAX_WATER_LEVEL",
    "DEFAULT_MIN_FLOW_RATE",
    "DEFAULT_MAX_FLOW_RATE",
]
