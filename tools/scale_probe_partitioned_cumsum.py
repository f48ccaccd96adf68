#!/usr/bin/env python
"""Reproducible scale probe for the PARTITIONED bucketed two-pass
cumulative sum (SCALE.md §r11; the events_mann_whitney /
events_ks_two_sample wiring).

Same-session A/B, local[$SPARK_GRAFT_CPUS]: 20M rows spread over 5
partition keys (the |event types| shape) with a high-cardinality
value domain — the regime where a plain ``PARTITION BY type ORDER BY
value`` window funnels each type's ENTIRE distinct-value order
through one task. Compares the per-row inclusive cumulative sum:

1. PLAIN window — ``sum(w) OVER (PARTITION BY p ORDER BY v, id ROWS
   UNBOUNDED PRECEDING .. CURRENT ROW)``: 5 tasks, each sorting and
   walking ~n/5 rows sequentially.
2. PARTITIONED two-pass (the shipped shape) —
   ``operators/ranking.ranked_cumsum(partition_cols=["p"])``: global
   sampled boundaries on v split each partition's order across
   buckets; per-(p, bucket) local windows + a broadcast
   |p|×n_buckets offset join.

Both arms reduce to one checksum row (count, sum of cumsums, max
cumsum — exact integers), asserted equal before timing is reported.

Usage: python tools/scale_probe_partitioned_cumsum.py [quick]
(``quick`` divides sizes by 10 for a fast smoke.)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hrfco_data_pipeline_spark.operators.ranking import ranked_cumsum  # noqa: E402
from hrfco_data_pipeline_spark.session import get_spark  # noqa: E402


def checksum(df, cum_col):
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.col(cum_col)).alias("s"),
        F.max(F.col(cum_col)).alias("m"),
    ).collect()[0]


def main() -> None:
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    n = 2_000_000 if quick else 20_000_000

    spark = get_spark(app_name="scale-probe-partitioned-cumsum")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(2_000_000_000).selectExpr("sum(id)").collect()
    calib = round(time.perf_counter() - t0, 3)
    print(f"calibration_s={calib}")

    base = (
        spark.range(n)
        .select(
            "id",
            F.pmod(F.xxhash64("id"), F.lit(5)).cast("string").alias("p"),
            # high-cardinality value domain: ~n distinct doubles
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n * 4)))
            .cast("double")
            .alias("v"),
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)).alias("w"),
        )
        .persist()
    )
    base.count()

    w = Window.partitionBy("p").orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    plain = base.select("p", F.sum("w").over(w).alias("cum"))
    two_pass = ranked_cumsum(
        base,
        F.col("v"),
        [F.asc("v"), F.asc("id")],
        sample_key=F.col("id"),
        sums={"cum": F.col("w")},
        rank_name="_rn",
        partition_cols=["p"],
    )

    results = {}
    for name, df, col in (
        ("plain_window", plain, "cum"),
        ("two_pass", two_pass, "cum"),
    ):
        t0 = time.perf_counter()
        row = checksum(df, col)
        dt = time.perf_counter() - t0
        # min-of-2: second run avoids first-run shuffle-write noise
        t0 = time.perf_counter()
        row2 = checksum(df, col)
        dt = min(dt, time.perf_counter() - t0)
        assert (row.n, row.s, row.m) == (row2.n, row2.s, row2.m)
        results[name] = (dt, row)
        print(f"{name}: {dt:.2f}s  n={row.n} sum={row.s} max={row.m}")

    a, b = results["plain_window"][1], results["two_pass"][1]
    assert (a.n, a.s, a.m) == (b.n, b.s, b.m), "checksum mismatch!"
    ratio = results["plain_window"][0] / results["two_pass"][0]
    print(f"speedup plain/two_pass = {ratio:.2f}x at n={n}")
    base.unpersist()


if __name__ == "__main__":
    main()
