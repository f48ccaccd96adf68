#!/usr/bin/env python
"""Measured probe: conditional row fan-out via union-with-filtered-self
vs in-place copies-sequence explode (the wire_dedup_replay r13 lesson).

A pipeline that re-delivers a subset of rows (redelivery simulation,
oversampling, class rebalancing) can express the fan-out two ways:

  (a) base.unionByName(base.filter(cond))       -- re-embeds the source
      subtree: TWO scans + two evaluations of every upstream projection;
  (b) base.withColumn("i", explode(sequence(1, when(cond, 2).otherwise(1))))
      -- ONE scan, one Generate.

On a cheap scan the union costs ~2x the I/O; when the upstream chain is
compute-heavy (parse, regex, hashing — the wire path), it costs ~2x the
CPU too. This probe measures both forms over a synthetic frame with a
md5-heavy upstream projection, at two sizes.

Usage: python tools/scale_probe_union_vs_explode.py [rows [rows2]]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from hrfco_data_pipeline_spark.session import get_spark  # noqa: E402


def run(spark, n: int) -> dict:
    base = (
        spark.range(n)
        .select(
            F.col("id"),
            # the compute-heavy upstream chain both forms share
            F.md5(F.concat_ws("|", F.col("id"), F.md5(F.col("id").cast("string")))).alias("payload"),
        )
    )
    cond = F.col("id") % 11 == 0

    def agg(df):
        return (
            df.groupBy(F.substring("payload", 1, 2).alias("k"))
            .agg(F.count("*").alias("c"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    t0 = time.time()
    agg(base.unionByName(base.filter(cond)))
    t_union = time.time() - t0

    t0 = time.time()
    fanned = base.withColumn(
        "copy_no", F.explode(F.sequence(F.lit(1), F.when(cond, 2).otherwise(1)))
    ).drop("copy_no")
    agg(fanned)
    t_explode = time.time() - t0
    return {"rows": n, "union_s": round(t_union, 2),
            "explode_s": round(t_explode, 2),
            "ratio": round(t_union / t_explode, 2)}


def main() -> None:
    import json

    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 20_000_000]
    spark = get_spark(app_name="probe-union-vs-explode")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        run(spark, n)  # warm the JIT once per size
        print(json.dumps(run(spark, n)))


if __name__ == "__main__":
    main()
