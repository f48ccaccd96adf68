#!/usr/bin/env python
"""Reproducible scale probe for the AGGREGATE-TO-THE-VALUE-DOMAIN
median (SCALE.md §r12, plans/hydro.level_mad_outliers).

When a statistic needs only the value DISTRIBUTION (median / MAD /
quantiles / exceedance counts), ranking RAW rows is strictly worse
than aggregating to (group, value) first whenever the value domain is
bounded: the rank input drops from O(rows) to O(groups × domain) and
any expensive substrate is evaluated exactly once. This probe
measures the gap on the exact shape that shipped:

1. RAW two-pass — per-group lower median via the partitioned
   range-bucketed two-pass rank (operators/ranking.ranked_cumsum)
   over all N rows, cut at rank (n+1) div 2. (The r12 first
   implementation; here over a CHEAP substrate, so the measured gap
   is the rank-input size alone — the shipped case also paid ~2
   extra evaluations of a ~10 s parse chain on top.)
2. DOMAIN aggregate — groupBy(group, value) → count, then the
   weighted lower median: smallest value whose per-group running
   count reaches (n+1) div 2, via a plain window over the
   domain-bounded aggregate (≤ |domain| rows per group per task).

Both arms produce the identical per-group median (lower-median
through ties is weighting-invariant); the probe asserts equality
group for group before reporting times.

Synthetic data: N rows, 120 groups (the hydro station count), values
integer cents uniform in a 6001-wide domain (the F2 [-10, 50] m band)
— the shipped cardinalities.

Usage: python tools/scale_probe_domain_agg.py [quick]
(``quick`` divides sizes by 10 for a fast smoke.)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hrfco_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    sizes = [2_000_000, 20_000_000]
    if quick:
        sizes = [n // 10 for n in sizes]
    n_groups = 120
    domain = 6001

    spark = get_spark(app_name="scale-probe-domain-agg")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from hrfco_data_pipeline_spark.operators.ranking import ranked_cumsum

    print(f"{'rows':>12} {'raw_two_pass_s':>15} {'domain_agg_s':>13} "
          f"{'speedup':>8}")
    for n in sizes:
        base = spark.range(n).select(
            F.col("id").alias("rid"),
            (F.col("id") % n_groups).cast("string").alias("grp"),
            # xxhash64 spreads values uniformly over the domain,
            # deterministic across runs
            (F.pmod(F.xxhash64("id"), F.lit(domain)) - F.lit(1000)).alias(
                "cents"
            ),
        )

        # arm 1: partitioned two-pass rank over raw rows
        t0 = time.perf_counter()
        ranked = ranked_cumsum(
            base,
            F.col("cents").cast("double"),
            [F.asc("cents"), F.asc("rid")],
            sample_key=F.col("rid"),
            rank_name="rnk",
            partition_cols=["grp"],
        )
        counts = base.groupBy("grp").agg(F.count("*").alias("n"))
        med_raw = (
            ranked.join(F.broadcast(counts), "grp")
            .filter(F.col("rnk") == F.expr("(n + 1) div 2"))
            .select("grp", F.col("cents").alias("med"))
        )
        raw_rows = {r.grp: r.med for r in med_raw.collect()}
        t_raw = time.perf_counter() - t0

        # arm 2: aggregate to the value domain, weighted median
        t0 = time.perf_counter()
        agg = base.groupBy("grp", "cents").agg(F.count("*").alias("w"))
        wcum = (
            Window.partitionBy("grp")
            .orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wall = Window.partitionBy("grp")
        r = agg.select(
            "grp",
            "cents",
            F.sum("w").over(wcum).alias("cum"),
            F.sum("w").over(wall).alias("n"),
        )
        med_dom = (
            r.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
            .groupBy("grp")
            .agg(F.min("cents").alias("med"))
        )
        dom_rows = {r.grp: r.med for r in med_dom.collect()}
        t_dom = time.perf_counter() - t0

        assert raw_rows == dom_rows, "arms disagree — probe bug"
        print(f"{n:>12,} {t_raw:>15.2f} {t_dom:>13.2f} "
              f"{t_raw / t_dom:>7.2f}x")


if __name__ == "__main__":
    main()
