"""Scalar expression library (all JVM-side Spark SQL expressions)."""

from hrfco_data_pipeline_spark.functions.coercion import (
    java_double,
    reformat_ymdhm,
    parse_obs_time_kst,
    blank_to_null,
)
from hrfco_data_pipeline_spark.functions.alerts import alert_message

__all__ = [
    "java_double",
    "reformat_ymdhm",
    "parse_obs_time_kst",
    "blank_to_null",
    "alert_message",
]
