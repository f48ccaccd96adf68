#!/usr/bin/env python
"""Scale-sensitive bench leg (r16 verdict item 4): time a SUBSET of the
headline queries against any data directory — typically the K=10
replication of sf0.1 built by tools/gen_scaled_testdata.py — with the
same methodology as bench.py (noop sink, cold + warm, clearCache
between runs, both calibration anchors).

The sf0.1 bench contract is untouched; this is an ADDITIVE instrument
whose output goes to a separate JSON file. Every invocation computes
from the parquet inputs — nothing is cached across runs.

Usage:
  python tools/bench_subset.py --sf DIR --out FILE.json QUERY [QUERY ...]
  python tools/bench_subset.py --sf DIR --out FILE.json --movers
      (--movers = the r17 scale-leg list: the structurally rewritten
       queries plus the bench's standing top tier)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

# The r17 scale leg: every query whose r16/r17 optimization was kept on
# a structural argument ("wins at scale") plus the standing top tier of
# the sf0.1 bench. ks/layout/cms/kmv/pagerank are the adjudication
# targets the r16 verdict names.
MOVERS = [
    "nation_trade_pagerank",
    "brand_itemset3_support",
    "stream_batch_ks_parity",
    "events_ks_two_sample",
    "layout_pruning_report",
    "stream_batch_cms_parity",
    "stream_batch_kmv_parity",
    "events_kmv_setops",
    "stream_batch_psi_parity",
    "stream_batch_bm25_parity",
    "stream_batch_lateness_parity",
    "docs_leakage_safe_split",
    "hydro_station_crosscorr",
    "hydro_resample_10min",
    "dedup_chaining_threshold_sweep",
    "copurchase_bfs_levels",
    "ann_ivf_pq_agreement",
    "ann_recall_by_occupancy",
    "docs_cms_heavy_hitters",
    "hydro_double_mass",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/tmp/testdata_sf1"
    out = None
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    names = MOVERS if "--movers" in args else [a for a in args if a != "--movers"]
    if not names:
        print(__doc__)
        return 2

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from hrfco_data_pipeline_spark.session import get_spark
    from hrfco_data_pipeline_spark.sources.tables import load_table

    spark = get_spark(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(2_000_000_000).selectExpr("sum(id)").collect()
    calibration_s = round(time.perf_counter() - t0, 3)

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

    queries = entry_mod.queries()
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in names:
        fn = queries[name]

        def run() -> float:
            t = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t
            spark.catalog.clearCache()
            return round(dt, 3)

        spark.sparkContext.setJobDescription(f"bench_subset: {name}")
        cold[name] = run()
        warm[name] = run()
        spark.sparkContext.setJobDescription(None)
        print(f"  {name}: cold {cold[name]} warm {warm[name]}", file=sys.stderr)

    rec = {
        "metric": "subset_queries_total",
        "value": round(sum(cold.values()), 3),
        "warm_total": round(sum(warm.values()), 3),
        "unit": "sec",
        "queries": cold,
        "warm": warm,
        "calibration_s": calibration_s,
        "calibration_shuffle_s": calibration_shuffle_s,
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
    }
    if out:
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
