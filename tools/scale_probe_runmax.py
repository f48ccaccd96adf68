#!/usr/bin/env python
"""Reproducible scale probe for the bucketed two-pass RUNNING MAX
(SCALE.md §r9, plans/relational.events_watermark_lateness_audit).

Same-session A/B on a synthetic arrival stream,
local[$SPARK_GRAFT_CPUS]: 20M rows, arrival id 0..N-1, event time =
arrival time minus a skewed synthetic delay (so the high-water mark
moves realistically). Compares the per-row "max event time seen over
all STRICTLY EARLIER arrivals":

1. GLOBAL window — ``max(us) OVER (ORDER BY id ROWS UNBOUNDED
   PRECEDING .. 1 PRECEDING)`` with no partition key: Spark plans a
   single-partition sort + one task walking all N rows (the same
   WindowExec cliff ranked_cumsum was built for, here for MAX).
2. BUCKETED two-pass (the shipped shape) — per-bucket maxima
   (bucket = id div B), a running max over the BOUNDED bucket
   aggregate, then an in-bucket prefix window partitioned by bucket;
   per-row mark = greatest(previous-buckets max, in-bucket prefix
   max). Value-identical for any B (max is associative over any
   prefix split) — the probe asserts equality row for row.

Both arms aggregate the resulting lateness to one checksum row (sum +
max + count), so the timed work is the window, not a collect.

Usage: python tools/scale_probe_runmax.py [quick]
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
    n = 2_000_000 if quick else 20_000_000
    bucket_rows = 4096

    spark = get_spark(app_name="scale-probe-runmax")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(2_000_000_000).selectExpr("sum(id)").collect()
    calib = round(time.perf_counter() - t0, 3)
    print(f"calibration_s={calib}")

    # arrival id -> event time: base advances 1s per arrival, minus a
    # skewed delay (1% of rows up to ~2h late, rest under a minute)
    base = spark.range(n).select(
        F.col("id"),
        (
            F.col("id") * 1_000_000
            - F.when(
                F.col("id") % 100 == 7,
                (F.col("id") * 2654435761 % 7200) * 1_000_000,
            ).otherwise(F.col("id") * 7919 % 60 * 1_000_000)
        ).alias("us"),
        F.floor(F.col("id") / F.lit(bucket_rows)).cast("long").alias("bkt"),
    )
    base.write.mode("overwrite").parquet("/tmp/probe_runmax")
    df = spark.read.parquet("/tmp/probe_runmax")

    def checksum(lat):
        return lat.agg(
            F.count("*").alias("n"),
            F.sum("lateness").alias("s"),
            F.max("lateness").alias("m"),
        ).collect()[0]

    def timed(fn):
        t = time.perf_counter()
        out = fn()
        dt = round(time.perf_counter() - t, 3)
        spark.catalog.clearCache()
        return out, dt

    def global_arm():
        w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
        lat = df.select(
            (
                F.greatest(
                    F.lit(0),
                    F.coalesce(F.max("us").over(w), F.lit(0)) - F.col("us"),
                )
            ).alias("lateness")
        )
        return checksum(lat)

    def bucketed_arm():
        bmax = df.groupBy("bkt").agg(F.max("us").alias("b_max"))
        wrun = Window.orderBy("bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        pre = bmax.select(
            "bkt", F.max("b_max").over(wrun).alias("prev_max")
        )
        win = (
            Window.partitionBy("bkt")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        lat = (
            df.join(pre, "bkt")
            .withColumn("in_max", F.max("us").over(win))
            .select(
                F.greatest(
                    F.lit(0),
                    F.greatest(
                        F.coalesce(F.col("prev_max"), F.lit(0)),
                        F.coalesce(F.col("in_max"), F.lit(0)),
                    )
                    - F.col("us"),
                ).alias("lateness")
            )
        )
        return checksum(lat)

    g, g_s = timed(global_arm)
    b, b_s = timed(bucketed_arm)
    print(f"global_window: {g_s}s  checksum={tuple(g)}")
    print(f"bucketed_2pass: {b_s}s  checksum={tuple(b)}")
    assert tuple(g) == tuple(b), "arms must be value-identical"
    print(f"speedup: {round(g_s / b_s, 2)}x (identical checksums)")


if __name__ == "__main__":
    main()
