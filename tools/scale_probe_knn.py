#!/usr/bin/env python
"""Reproducible scale probe for embedding_mutual_knn's sub-sharded
pair blocks (SCALE.md §r9, plans/llm.embedding_mutual_knn).

A label-blocked kNN does the same O(n_label²) cosine work either way —
what the sub-shard scheme changes is WHERE: a plain label self-join
hash-partitions on the label, so a hot label's entire n² pair block
lands in ONE task (the straggler that stalls the stage — same failure
class as the r8 wedge join); the pair-block scheme spreads it over
~k²/2 blocks with no task above ~max_block² pairs, at a replication
cost of k+1 copies per row (linear in skew).

Synthetic skew: one hot label holding half the corpus, the rest spread
thin. Both arms compute directed top-3 neighbour lists; the probe
asserts the EDGE SETS are identical (sub-sharding is a physical
rewrite — every unordered pair still meets exactly once).

Usage: python tools/scale_probe_knn.py [quick]
(``quick`` divides sizes by 4.)
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
    n_hot = 3_000 if quick else 8_000
    n_cold = n_hot  # spread over 100 labels
    dim = 16
    k = 3

    spark = get_spark(app_name="scale-probe-knn")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(2_000_000_000).selectExpr("sum(id)").collect()
    print(f"calibration_s={round(time.perf_counter() - t0, 3)}")

    base = spark.range(n_hot + n_cold).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") < n_hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 100).cast("string")))
        .alias("label"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: ((F.col("id") * 7919 + i * 104729) % 1000).cast(
                "double"
            )
            / 1000.0,
        ).alias("v"),
    )
    base.write.mode("overwrite").parquet("/tmp/probe_knn")
    emb = spark.read.parquet("/tmp/probe_knn")

    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    wn = emb.select(
        "vec_id", "label", "v", F.sqrt(dot("v", "v")).alias("nrm")
    )

    def topk_edges(directed):
        w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("nbr"))
        return (
            directed.select(
                "src", "nbr", F.row_number().over(w).alias("rank")
            )
            .filter(F.col("rank") <= k)
        )

    def run(fn):
        t = time.perf_counter()
        out = fn()
        cnt = out.count()
        dt = round(time.perf_counter() - t, 3)
        spark.catalog.clearCache()
        return out, cnt, dt

    def naive():
        a = wn.select(
            F.col("vec_id").alias("src"),
            F.col("label").alias("la"),
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
        )
        b = wn.select(
            F.col("vec_id").alias("nbr"),
            F.col("label").alias("lb"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
        )
        # force the shuffle plan a corpus-scale label join takes (a
        # 100M-vector side cannot broadcast); AQE's skew handling is
        # free to split the hot partition — that IS the comparison,
        # the salted-join-vs-AQE precedent applied to kNN blocks
        pairs = a.hint("merge").join(
            b, (F.col("la") == F.col("lb")) & (F.col("src") != F.col("nbr"))
        ).select(
            "src",
            "nbr",
            (dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        return topk_edges(pairs)

    def sharded(max_block=64):
        counts = wn.groupBy("label").agg(F.count("*").alias("n_lbl"))
        sh = (
            wn.join(F.broadcast(counts), "label")
            .withColumn(
                "kk",
                F.greatest(
                    F.lit(1), F.ceil(F.col("n_lbl") / F.lit(max_block))
                ).cast("int"),
            )
            .withColumn(
                "s", F.pmod(F.xxhash64("vec_id"), F.col("kk")).cast("int")
            )
        )
        a = sh.select(
            F.col("vec_id").alias("id_a"),
            "label",
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
            F.col("s").alias("bl_a"),
            F.explode(F.sequence(F.col("s"), F.col("kk") - 1)).alias("br_a"),
        )
        b = sh.select(
            F.col("vec_id").alias("id_b"),
            F.col("label").alias("lb"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
            F.explode(F.sequence(F.lit(0), F.col("s"))).alias("bl_b"),
            F.col("s").alias("br_b"),
        )
        pairs = a.join(
            b,
            (F.col("label") == F.col("lb"))
            & (F.col("bl_a") == F.col("bl_b"))
            & (F.col("br_a") == F.col("br_b"))
            & (F.col("id_a") != F.col("id_b")),
        ).filter(
            (F.col("bl_a") != F.col("br_a")) | (F.col("id_a") < F.col("id_b"))
        )
        scored = pairs.select(
            "id_a",
            "id_b",
            (dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        directed = scored.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("nbr")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("nbr")
                    ),
                )
            ).alias("e"),
            "cos",
        ).select("e.src", "e.nbr", "cos")
        return topk_edges(directed)

    n_edges, nv, t_naive = run(naive)
    s_edges, sv, t_shard = run(lambda: sharded())
    print(f"naive_label_join: {t_naive}s  edges={nv}")
    print(f"subsharded_blocks: {t_shard}s  edges={sv}")
    diff = n_edges.exceptAll(s_edges).count() + s_edges.exceptAll(n_edges).count()
    assert diff == 0, f"edge sets differ by {diff} rows"
    print(
        f"speedup: {round(t_naive / t_shard, 2)}x (identical top-{k} edge sets)"
    )


if __name__ == "__main__":
    main()
