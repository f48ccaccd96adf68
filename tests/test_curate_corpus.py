"""End-to-end corpus curation workflow: invariants over the written
training corpus (plans/curate.curate_corpus)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hrfco_data_pipeline_spark.plans.curate import curate_corpus


def test_curate_corpus_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus")
    report = curate_corpus(spark, "/root/testdata/sf0.001", out)

    # funnel is monotone non-increasing and every stage retains data
    stages = [
        "input",
        "quality_gated",
        "exact_deduped",
        "near_deduped",
        "decontaminated",
        "written",
    ]
    for a, b in zip(stages, stages[1:]):
        assert report[a] >= report[b], (a, b, report)
    assert report["written"] > 0

    corpus = spark.read.parquet(out)

    # no exact duplicates survive
    n = corpus.count()
    assert corpus.select(F.md5(F.lower("text"))).distinct().count() == n

    # split assignment covers only the three labels; shard within range
    splits = {r.split for r in corpus.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    shards = [r.shard for r in corpus.select("shard").distinct().collect()]
    assert all(0 <= s < 4 for s in shards)

    # curriculum positions are unique
    assert corpus.select("position").distinct().count() == n

    # no eval docs in the written corpus, and no train doc shares an
    # 8-gram with the eval set (decontamination invariant)
    assert corpus.filter(F.col("doc_id") % 97 == 0).count() == 0

    # partition pruning works: reading one (split, shard) leaf returns
    # exactly its rows
    one = corpus.limit(1).collect()[0]
    pruned = spark.read.parquet(out).filter(
        (F.col("split") == one.split) & (F.col("shard") == one.shard)
    )
    assert pruned.count() == corpus.filter(
        (F.col("split") == one.split) & (F.col("shard") == one.shard)
    ).count()


def test_curate_corpus_is_deterministic(spark, tmp_path):
    out1 = str(tmp_path / "c1")
    out2 = str(tmp_path / "c2")
    r1 = curate_corpus(spark, "/root/testdata/sf0.001", out1)
    r2 = curate_corpus(spark, "/root/testdata/sf0.001", out2)
    assert r1 == r2
    a = {
        (r.doc_id, r.split, r.shard, r.position)
        for r in spark.read.parquet(out1).collect()
    }
    b = {
        (r.doc_id, r.split, r.shard, r.position)
        for r in spark.read.parquet(out2).collect()
    }
    assert a == b


def test_corpus_diff_statuses(spark):
    from hrfco_data_pipeline_spark.plans.curate import corpus_diff

    old = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "ccc")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "bbb"), (3, "CCC changed"), (4, "ddd")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "added",
    }
