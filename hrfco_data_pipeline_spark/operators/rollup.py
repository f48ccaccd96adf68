"""Hypertable-style time-bucket rollups (continuous-aggregate analog).

The reference stores observations in a TimescaleDB hypertable
partitioned on observation_time (TimescaleDBRepository.java:100-104);
the query-side counterpart is the time_bucket rollup. Spark-native:
``date_trunc``-keyed aggregation — partial-aggregated map-side, one
shuffle on (bucket, key); writing the result partitioned by bucket date
gives the cascading 1h→1d rollup chain of a continuous aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(col: Column | str, width: str = "hour") -> Column:
    """Truncate an (NTZ) timestamp column to the bucket boundary."""
    return F.date_trunc(width, col)


def rollup_by_bucket(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    aggs: list[Column],
    width: str = "hour",
    bucket_name: str = "bucket",
) -> DataFrame:
    """Generic rollup: group by (time bucket, keys) and aggregate."""
    return df.groupBy(
        time_bucket(time_col, width).alias(bucket_name), *keys
    ).agg(*aggs)
