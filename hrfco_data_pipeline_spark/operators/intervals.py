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
    per overlapping pair.

    Inverted intervals (end < start) are dropped before the explode:
    ``F.sequence`` would otherwise silently emit a DESCENDING bucket
    list for them, scattering garbage rows across the join (r7
    advisor item). Bucket ids use integer arithmetic throughout —
    ``floor(col / lit)`` routes through double division, which is
    exact only for |value| < 2^53 and would mis-bucket boundary
    values for arbitrary long inputs; ``(c - pmod(c, w)) div w`` is
    exact over the full long range (and handles negative starts,
    where ``div`` alone truncates toward zero instead of flooring)."""
    if bucket_us < 1:
        raise ValueError("bucket_us must be >= 1")
    w = int(bucket_us)
    W = F.lit(w)

    def bucketed(df: DataFrame, s: str, e: str, out: str) -> DataFrame:
        lo = F.col(s).cast("long")
        hi = F.col(e).cast("long")
        return (
            df.filter(hi >= lo)
            .withColumn("_lo_q", lo - F.pmod(lo, W))
            .withColumn("_hi_q", hi - F.pmod(hi, W))
            .withColumn(
                out,
                F.explode(
                    F.sequence(
                        F.expr(f"_lo_q div {w}"), F.expr(f"_hi_q div {w}")
                    )
                ),
            )
            .drop("_lo_q", "_hi_q")
        )

    lb = bucketed(left, l_start, l_end, "_lb")
    rb = bucketed(right, r_start, r_end, "_rb")
    cs = F.greatest(F.col(l_start), F.col(r_start)).cast("long")
    return (
        lb.join(rb, F.col("_lb") == F.col("_rb"))
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
        )
        .withColumn("_cs_q", cs - F.pmod(cs, W))
        .filter(F.col("_lb") == F.expr(f"_cs_q div {w}"))
        .drop("_lb", "_rb", "_cs_q")
    )
