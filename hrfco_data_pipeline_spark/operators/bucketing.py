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


def hilbert_index(x, y, bits: int = 8):
    """Hilbert-curve index of two pre-quantized columns (the xy2d
    walk, loop unrolled into one pure-integer expression tree — no
    UDF, stays inside whole-stage codegen, exactly reproducible in
    any engine with integer bit ops).

    The Hilbert curve is the stronger Z-order: Morton interleaving
    has long diagonal jumps at power-of-two boundaries, while every
    Hilbert step moves to an adjacent cell, so range-sharding by this
    key gives output files strictly tighter (x, y) bounding boxes —
    better min/max pruning on both columns at the same file count.
    Each unrolled level substitutes the previous (x, y) expressions,
    so the tree doubles per level — fine at the 8-bit default (256
    leaves), do not call with bits much past 12.
    """
    from pyspark.sql import functions as F

    d = F.lit(0).cast("long")
    s = 1 << (bits - 1)
    while s > 0:
        rx = (
            F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        ry = (
            F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        d = d + F.lit(s * s).cast("long") * (F.lit(3) * rx).bitwiseXOR(ry)
        flipped_x = F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)
        flipped_y = F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)
        x, y = (
            F.when(ry == 0, flipped_y).otherwise(x),
            F.when(ry == 0, flipped_x).otherwise(y),
        )
        s //= 2
    return d


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
