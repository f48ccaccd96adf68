#!/usr/bin/env python
"""Reproducible scale probe for the KMV set-operation sketch
(SCALE.md §r8, plans/relational.events_kmv_setops).

Same-session A/B on synthetic events, local[$SPARK_GRAFT_CPUS]:
40M (type, user) rows, 8M distinct users, 8 types with overlapping
user ranges. Compares, for ALL 28 type pairs:

1. EXACT set ops — the per-user self-join the batch face's QA arms
   use: distinct (type, user), join on user across type pairs, count.
   Shuffles the full distinct user set and materializes O(pairs·users)
   join rows.
2. KMV naive — distinct (type, user) once, bottom-64 per type
   (two-phase windows over the FULL distinct frame), then pair
   estimates. The distinct shuffle and the bucket window both carry
   the whole user set.
3. KMV prefiltered (kmv_bottomk_from_raw, the shipped shape) — one
   map-side HLL NDV pass over the RAW frame, broadcast threshold
   prune BELOW the distinct, so every wide exchange after the scan is
   sketch-sized (~c·k rows per type).

Arms 2 and 3 must produce IDENTICAL estimates (the prune keeps every
true bottom-k hash; the probe asserts it). The prefiltered arm's
advantage grows with user cardinality — its post-scan cost is
constant while the naive arms scale with users.

Usage: python tools/scale_probe_kmv.py [quick]
(``quick`` divides sizes by 10 for a fast smoke.)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from hrfco_data_pipeline_spark.plans.relational import (  # noqa: E402
    kmv_bottomk_from_raw,
    kmv_hash,
    kmv_kmin,
    kmv_pair_estimates,
)
from hrfco_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    div = 10 if quick else 1
    spark = get_spark(app_name="scale-probe-kmv")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(2_000_000_000).selectExpr("sum(id)").collect()
    print("calibration_s", round(time.time() - t0, 3))

    n, users, types = 40_000_000 // div, 8_000_000 // div, 8
    # type t sees users in [t*users/16, t*users/16 + users/2): adjacent
    # types overlap heavily, distant ones barely — realistic audiences
    ev = spark.range(n).select(
        (F.col("id") % types).cast("string").alias("event_type"),
        (
            (F.col("id") % types) * (users // 16)
            + F.pmod(F.xxhash64("id"), F.lit(users // 2))
        ).alias("user_id"),
    )
    ev.write.mode("overwrite").parquet("/tmp/kmv_probe_events")
    ev = spark.read.parquet("/tmp/kmv_probe_events")

    def timed(label: str, df):
        spark.catalog.clearCache()
        t0 = time.time()
        rows = df.collect()
        dt = time.time() - t0
        print(f"{label:48s} {dt:7.2f} s   ({len(rows)} rows)")
        return dt, rows

    base = ev.distinct()

    exact = (
        base.alias("x")
        .join(
            base.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("exact_inter"))
    )
    t_exact, exact_rows = timed("exact pairwise intersections (self-join)", exact)

    raw = ev.select("event_type", kmv_hash(F.col("user_id")).alias("h"))

    # materialize=False: keep construction lazy so timed() covers the
    # FULL pipeline (upstream distinct/prefilter + windows + estimates),
    # not just a checkpoint-fed tail (ADVICE r16)
    naive = kmv_pair_estimates(kmv_kmin(raw.distinct()), materialize=False)
    t_naive, naive_rows = timed("KMV naive (full-distinct windows)", naive)

    pre = kmv_pair_estimates(kmv_bottomk_from_raw(raw), materialize=False)
    t_pre, pre_rows = timed("KMV prefiltered (kmv_bottomk_from_raw)", pre)

    key = lambda r: (r["type_a"], r["type_b"])  # noqa: E731
    nv = {key(r): (r["kmv_a"], r["kmv_b"], r["kmv_union"], r["kmv_inter"]) for r in naive_rows}
    pv = {key(r): (r["kmv_a"], r["kmv_b"], r["kmv_union"], r["kmv_inter"]) for r in pre_rows}
    assert nv == pv, "prefilter changed the sketch — threshold dropped a true bottom-k hash"
    print("prefiltered == naive estimates: OK (bit-identical)")

    # accuracy: median relative error of the intersection estimate
    ex = {key(r): r["exact_inter"] for r in exact_rows}
    errs = sorted(
        abs(r["kmv_inter"] - ex.get(key(r), 0)) / max(ex.get(key(r), 0), 1)
        for r in pre_rows
        if ex.get(key(r), 0) > 0
    )
    print(f"speedup exact/naive:  {t_exact / t_naive:.2f}x")
    print(f"speedup exact/prefil: {t_exact / t_pre:.2f}x")
    print(f"speedup naive/prefil: {t_naive / t_pre:.2f}x")
    print(
        f"intersection rel-err: median {errs[len(errs) // 2]:.3f}, "
        f"max {errs[-1]:.3f} over {len(errs)} pairs "
        "(k=64 -> ~13% SE per estimate; inclusion-exclusion compounds it)"
    )


if __name__ == "__main__":
    main()
