#!/usr/bin/env python
"""Isolated single-query benchmark — the A/B harness behind the
BASELINE.md drift verdicts (r4 resample bisect, r6 semantic-dedup
A/B, r8 sessionize A/B).

In-bench per-query numbers swing with session position (JIT-hot
kernels and populated footer caches after 1000+ stages flatter late
queries), so the rule is: no in-bench drift is believed or dismissed
without THIS — a fresh JVM, a 1M-row warm-up, the same 2e9-row
calibration probe bench.py records, then a cold run and N warm runs
of ONE query with ``clearCache()`` between, all against the same
testdata. Compare runs across commits via ``git worktree add`` +
``PYTHONPATH`` so each commit's own module tree executes.

Usage:
    python tools/ab_single_query.py QUERY [SF_DIR] [WARM_REPS]

Prints one JSON line: {"query", "sf_dir", "calibration_s",
"calibration_shuffle_s", "cold_s", "warm_s": [...], "warm_median_s"}.
Both bench.py calibration anchors are recorded (r16 verdict item 4):
the scalar 2e9-row sum AND the stage-shaped sf0.001 scan+shuffle+agg
probe, so A/B legs can be matched the same way bench runs are.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: python tools/ab_single_query.py QUERY [SF_DIR] [WARM_REPS]")
        return 2
    query = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import __spark_entry__ as entry_mod
    from hrfco_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"ab-{query}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(2_000_000_000).selectExpr("sum(id)").collect()
    calibration_s = round(time.perf_counter() - t0, 3)

    # Stage-shaped anchor — identical to bench.py's second probe.
    from pyspark.sql import functions as F

    from hrfco_data_pipeline_spark.sources.tables import load_table

    def _shuffle_probe() -> None:
        (
            load_table(spark, "/root/testdata/sf0.001", "events")
            .repartition(32)
            .groupBy("event_type", (F.col("user_id") % 64).alias("u"))
            .agg(F.count("*"), F.sum("value"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    _shuffle_probe()
    t0 = time.perf_counter()
    for _ in range(3):
        _shuffle_probe()
    calibration_shuffle_s = round(time.perf_counter() - t0, 3)

    fn = entry_mod.queries()[query]

    def run() -> float:
        t = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t
        spark.catalog.clearCache()
        return round(dt, 3)

    cold = run()
    warms = [run() for _ in range(reps)]
    print(
        json.dumps(
            {
                "query": query,
                "sf_dir": sf_dir,
                "calibration_s": calibration_s,
                "calibration_shuffle_s": calibration_shuffle_s,
                "cold_s": cold,
                "warm_s": warms,
                "warm_median_s": round(statistics.median(warms), 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
