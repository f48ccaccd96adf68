"""Bucketing: pre-shuffled storage for co-located joins.

At 100 TB the lineitem⋈orders shuffle dominates TPC-H-style plans.
Writing both fact tables bucketed by the join key (same bucket count)
lets Spark plan a sort-merge join with NO exchange on either side —
the shuffle is paid once at write time and amortized over every
subsequent join. This is the persistent complement to the broadcast
(dim) and AQE (runtime) strategies used elsewhere in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    With matching bucket counts Spark elides both shuffle Exchanges
    (verify via ``.explain``: no "Exchange hashpartitioning" above either
    scan). ``force_sort_merge`` adds a MERGE hint — useful to observe the
    zero-shuffle plan when the data is small enough that AQE would
    otherwise broadcast one side.
    """
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on)


def morton_interleave(qx, qy, bits: int = 8):
    """Morton (Z-order) code of two pre-quantized columns: bit i of
    ``qx`` lands at position 2i, bit i of ``qy`` at 2i+1. Pure shift/
    mask arithmetic — stays inside whole-stage codegen and is exactly
    reproducible in any engine with integer bit ops.

    This is the layout key behind multi-dimensional data skipping
    (Delta/Iceberg OPTIMIZE ZORDER BY): sorting or range-sharding by
    the interleaved key clusters rows so every output file covers a
    small rectangle in (x, y) space, letting min/max file stats prune
    on BOTH columns instead of just the leading sort key.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    zorder_col,
    n_files: int = 16,
) -> None:
    """Write ``df`` laid out by a Z-order key: range-exchange into
    ``n_files`` Morton-key ranges (sampled boundaries, no global sort)
    with a within-partition sort, one file per range. Each output file
    then covers a contiguous Morton range = a small set of rectangles
    in the interleaved key space, so per-file min/max column stats
    prune scans filtered on EITHER interleaved dimension — verified
    file-by-file in tests/test_bucketing.py.
    """
    (
        df.withColumn("__z", zorder_col)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
