#!/usr/bin/env python
"""Reproducible scale probes for the r7 join operators (SCALE.md §r7).

Same-session A/Bs on synthetic data, local[$SPARK_GRAFT_CPUS]:
1. salted_join vs plain joins at 20M rows with 90% of rows behind ONE
   key (the shape salting exists for) — against sort-merge with AQE
   skew-split enabled, a forced shuffle-hash join, and the broadcast
   counter-case where salting deliberately loses.
2. bucketed overlap_join over a 2M x 50k interval space vs the theta
   join on a 1/100 slice (the theta plan is a single-partition
   nested loop — it cannot use the cluster at all).

Usage: python tools/scale_probe_joins.py [quick]
(``quick`` divides sizes by 10 for a fast smoke.)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from hrfco_data_pipeline_spark.operators.intervals import overlap_join  # noqa: E402
from hrfco_data_pipeline_spark.operators.skew import salted_join  # noqa: E402
from hrfco_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    div = 10 if quick else 1
    spark = get_spark(app_name="scale-probe-joins")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label: str, df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{label:48s} {dt:7.2f} s")
        return dt

    t0 = time.time()
    spark.range(2_000_000_000).selectExpr("sum(id)").collect()
    print("calibration_s", round(time.time() - t0, 3))

    n, dimn, salt = 20_000_000 // div, 200_000 // div, 32
    big = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % dimn)
        .alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    small = spark.range(dimn).select(
        F.col("id").alias("sk"), (F.col("id") % 97).alias("w")
    )
    agg = lambda j: j.groupBy().agg(  # noqa: E731
        F.sum(F.col("v") + F.col("w")).alias("s")
    )

    t_sm = timed(
        "plain sort-merge + AQE skew split",
        agg(big.join(small.hint("merge"), big["k"] == small["sk"])),
    )
    t_sh = timed(
        "plain forced shuffle-hash",
        agg(big.join(small.hint("shuffle_hash"), big["k"] == small["sk"])),
    )
    t_salt = timed(
        f"salted_join salt={salt}",
        agg(salted_join(big, small, "k", "sk", scatter_on=F.col("row_id"), salt=salt)),
    )
    print(
        f"salted speedup: {t_sm / t_salt:.2f}x vs sort-merge, "
        f"{t_sh / t_salt:.2f}x vs shuffle-hash"
    )
    a = agg(big.join(small, big["k"] == small["sk"])).collect()[0].s
    b = agg(
        salted_join(big, small, "k", "sk", scatter_on=F.col("row_id"), salt=salt)
    ).collect()[0].s
    assert a == b, (a, b)
    print("salted result parity ok")

    lcount, rcount = 2_000_000 // div, 50_000 // div
    hour = 3_600_000_000
    left = spark.range(lcount).select(
        F.col("id").alias("lid"),
        (F.col("id") * 104729 % 864000 * F.lit(100_000)).alias("ls"),
    ).withColumn("le", F.col("ls") + (F.col("lid") * 7919 % 7200) * F.lit(500_000))
    right = spark.range(rcount).select(
        F.col("id").alias("rid"),
        (F.col("id") * 15485863 % 864000 * F.lit(100_000)).alias("rs"),
    ).withColumn("re", F.col("rs") + (F.col("rid") * 6151 % 14400) * F.lit(500_000))

    timed(
        f"bucketed overlap_join {lcount} x {rcount}",
        overlap_join(left, right, "ls", "le", "rs", "re", bucket_us=hour)
        .groupBy()
        .agg(F.count("*").alias("n")),
    )
    lt, rt = left.limit(lcount // 10), right.limit(rcount // 10)
    theta = (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    timed(
        "theta join on a 1/100 slice (single task)",
        lt.join(rt, theta).groupBy().agg(F.count("*")),
    )
    g = overlap_join(lt, rt, "ls", "le", "rs", "re", bucket_us=hour).count()
    w = lt.join(rt, theta).count()
    assert g == w, (g, w)
    print(f"interval slice parity ok ({g} pairs)")


if __name__ == "__main__":
    main()
