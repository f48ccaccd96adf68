"""Distributed interval-overlap join (range join).

Spark has no native interval join; the naive theta join
(``l.start <= r.end AND r.start <= l.end``) plans as a nested-loop
cartesian — unusable beyond toy scale. The distributed standard is
BUCKETED overlap: explode each interval into the fixed-width time
buckets it touches, hash-join on the bucket id, then verify the exact
overlap predicate. Work is proportional to (interval length / bucket
width) × true-ish matches per bucket, never |L| × |R|.

Duplicate elimination WITHOUT a distinct: a pair that overlaps is seen
once per shared bucket, so instead of deduping downstream each pair is
CLAIMED exactly once — in the bucket containing
``max(l.start, r.start)``, which both sides necessarily explode when
(and only when) the closed intervals overlap. One equi-join, zero
extra exchanges.

Pick ``bucket_us`` near the typical interval length: too small
multiplies the explode fan-out, too large packs unrelated intervals
into one bucket and shifts cost to the post-join filter (classic
range-join binning trade-off).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Join rows whose CLOSED integer intervals [l_start, l_end] and
    [r_start, r_end] overlap. Column sets of ``left`` and ``right``
    must be disjoint; output = left columns + right columns, one row
    per overlapping pair."""
    if bucket_us < 1:
        raise ValueError("bucket_us must be >= 1")
    w = F.lit(int(bucket_us))

    def buckets(s: str, e: str):
        return F.explode(
            F.sequence(F.floor(F.col(s) / w), F.floor(F.col(e) / w))
        )

    lb = left.withColumn("_lb", buckets(l_start, l_end))
    rb = right.withColumn("_rb", buckets(r_start, r_end))
    claimed = F.floor(F.greatest(F.col(l_start), F.col(r_start)) / w)
    return (
        lb.join(rb, F.col("_lb") == F.col("_rb"))
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_lb") == claimed)
        )
        .drop("_lb", "_rb")
    )
