#!/usr/bin/env python
"""Reproducible scale probe for Bloom-semijoin runtime pruning
(SCALE.md §r10, plans/relational.lineitem_bloom_semijoin_prune).

The 100 TB question the scorecard query measures but does not time:
when a selective dim predicate survives too many keys to broadcast
the KEYS, does shipping a compact Bloom BITSET and dropping fact rows
map-side beat shuffling the whole fact side into a sort-merge join?
And does Spark 4's own runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.enabled) already inject the
same thing on this shape?

Same-session A/B, local[$SPARK_GRAFT_CPUS], 20M fact rows keyed into
a 5M-key domain, dim filtered to 2% (100k keys) by a non-key
predicate:

1. SMJ-nofilter  — merge-hint join, runtime bloom OFF: the whole
   fact side shuffles.
2. SMJ-runtime   — merge-hint join, runtime bloom ON (the default):
   whether the engine's own filter fires is read off the plan
   (BloomFilterMightContain) and reported.
3. SMJ-manualbloom — the shipped query shape: m=2^20/k=3 double-hash
   positions built from the dim, broadcast as a distinct set-bit
   table, fact rows dropped by a k-way broadcast semi-probe BEFORE
   the merge join.

All arms reduce to one checksum row (count + sum of a payload), so
the timed work is the join pipeline; checksums are asserted equal
(the Bloom pass is a superset filter — the join itself restores
exactness).

Usage: python tools/scale_probe_bloom.py [quick]
(``quick`` divides sizes by 10.)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from hrfco_data_pipeline_spark.session import get_spark  # noqa: E402

M_BITS = 1 << 20
K = 3


def main() -> None:
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    n_fact = 2_000_000 if quick else 20_000_000
    n_dim = 500_000 if quick else 5_000_000

    spark = get_spark(app_name="scale-probe-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(2_000_000_000).selectExpr("sum(id)").collect()
    print(f"calibration_s={round(time.perf_counter() - t0, 3)}")

    fact = spark.range(n_fact).select(
        ((F.col("id") * 2654435761) % n_dim).alias("key"),
        (F.col("id") % 997).alias("payload"),
    )
    # dim filtered by a NON-key predicate to 2% of the domain — the
    # regime where the optimizer cannot prune statically
    dim = (
        spark.range(n_dim)
        .select(
            F.col("id").alias("key"),
            (F.xxhash64(F.col("id")) % 50).alias("seg"),
        )
        .filter(F.col("seg") == 0)
        .select("key")
    )

    def checksum(df):
        return df.agg(
            F.count("*").alias("n"), F.sum("payload").alias("s")
        ).collect()[0]

    def timed(label, make):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        row = checksum(make())
        dt = time.perf_counter() - t0
        print(f"{label:18s} {dt:7.2f}s  n={row.n} sum={row.s}")
        return row, dt

    def smj():
        return fact.join(dim.hint("merge"), "key")

    # report whether the engine's own runtime filter fires on this
    # plan (read before timing; it stays at its default=on for arm 2)
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    plan = smj()._jdf.queryExecution().executedPlan().toString().lower()
    print(f"runtime-bloom-in-plan={'bloom' in plan}")

    # arm 3: the shipped manual shape — broadcast set-bit table,
    # k-way conjunction probe, then the merge join
    def manual():
        h1 = (F.xxhash64(F.col("key")).bitwiseAND(F.lit((1 << 31) - 1))).alias("h1")
        h2 = (
            F.xxhash64(F.col("key"), F.lit(17)).bitwiseAND(F.lit((1 << 31) - 1))
        ).alias("h2")
        positions = (
            dim.select(h1, h2)
            .select(
                F.explode(
                    F.array(
                        *[
                            (
                                (F.col("h1") + F.lit(j) * F.col("h2"))
                                % M_BITS
                            )
                            for j in range(K)
                        ]
                    )
                ).alias("pos")
            )
            .distinct()
        )
        probed = fact.select(
            "key",
            "payload",
            (F.xxhash64(F.col("key")).bitwiseAND(F.lit((1 << 31) - 1))).alias("h1"),
            (
                F.xxhash64(F.col("key"), F.lit(17)).bitwiseAND(F.lit((1 << 31) - 1))
            ).alias("h2"),
        )
        for j in range(K):
            pj = positions.select(
                F.col("pos").alias(f"p{j}")
            )
            probed = probed.join(
                F.broadcast(pj),
                ((F.col("h1") + F.lit(j) * F.col("h2")) % M_BITS)
                == F.col(f"p{j}"),
                "leftsemi",
            )
        return probed.select("key", "payload").join(dim.hint("merge"), "key")

    # two interleaved rounds per arm, min-of (JIT/order bias guard)
    arms = {}
    for _ in range(2):
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        r, t = timed("smj-nofilter", smj)
        arms.setdefault("nofilter", []).append((r, t))
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        r, t = timed("smj-runtime", smj)
        arms.setdefault("runtime", []).append((r, t))
        r, t = timed("smj-manualbloom", manual)
        arms.setdefault("manual", []).append((r, t))
    best = {k: min(t for _, t in v) for k, v in arms.items()}
    rows = {k: v[0][0] for k, v in arms.items()}
    assert (
        (rows["nofilter"].n, rows["nofilter"].s)
        == (rows["runtime"].n, rows["runtime"].s)
        == (rows["manual"].n, rows["manual"].s)
    ), "checksum split"
    print(
        f"min-of-2: nofilter={best['nofilter']:.2f}s "
        f"runtime={best['runtime']:.2f}s manual={best['manual']:.2f}s  "
        f"speedup runtime={best['nofilter'] / best['runtime']:.2f}x "
        f"manual={best['nofilter'] / best['manual']:.2f}x"
    )


if __name__ == "__main__":
    main()
