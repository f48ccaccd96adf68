"""Parquet table loading for the driver's synthetic star schema.

At 100 TB these reads are the dominant cost; everything here keeps the
scan prunable: no casts or projections are applied at load time, so
Catalyst can push filters and prune columns all the way into the
parquet reader (check ``PushedFilters`` / ``ReadSchema`` in
``.explain("formatted")``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_to_ntz(col: F.Column) -> F.Column:
    """INT64 nano-epoch (naive wall time) → TIMESTAMP_NTZ, independent of
    the session timezone.

    ``timestamp_micros`` yields an instant; casting to NTZ renders it in
    the session TZ, so converting that rendering session-TZ→UTC recovers
    the original naive wall time no matter what the session TZ is.
    """
    ltz = F.timestamp_micros((col / F.lit(1000)).cast("long"))
    return F.convert_timezone(
        F.current_timezone(), F.lit("UTC"), ltz.cast("timestamp_ntz")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table.

    `events.ts` is physically TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; we read it as a long (legacy conf) and rebuild a
    TIMESTAMP_NTZ column, which matches how DuckDB sees the same file
    (naive nanosecond timestamp, truncated to micros).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", _nanos_to_ntz(F.col("ts")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
