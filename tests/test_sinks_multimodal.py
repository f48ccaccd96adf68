"""Sink writers (W2-W5) and multimodal plumbing tests."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from hrfco_data_pipeline_spark.operators.multimodal import (
    extract_features,
    to_multimodal,
)
from hrfco_data_pipeline_spark.sinks.writers import merge_stations
from hrfco_data_pipeline_spark.sources.synthetic import synthetic_stations

SF = "/root/testdata/sf0.001"


def test_merge_stations_upsert(spark, tmp_path):
    path = str(tmp_path / "stations")
    st = synthetic_stations(spark)
    merge_stations(spark, path, st)
    assert spark.read.parquet(path).count() == 100

    updates = spark.createDataFrame(
        [("0", "renamed", "addr", "9.0", None, None, None),
         ("999", "new", "addr", None, None, None, None)],
        "wlobscd string, obsnm string, addr string, attwl string, "
        "wrnwl string, almwl string, srswl string",
    )
    merge_stations(spark, path, updates)
    merged = spark.read.parquet(path)
    assert merged.count() == 101  # 1 update + 1 insert
    row = merged.filter(F.col("wlobscd") == "0").collect()[0]
    assert row.obsnm == "renamed" and row.attwl == "9.0"


def test_merge_stations_failure_leaves_table_intact(spark, tmp_path, monkeypatch):
    """A crash during the merge write must not lose the live table."""
    path = str(tmp_path / "stations")
    merge_stations(spark, path, synthetic_stations(spark))
    before = spark.read.parquet(path).count()

    bad = spark.createDataFrame([("x",)], "wlobscd string").withColumn(
        "boom", F.lit(1) / F.lit(0)  # ANSI mode: division by zero throws at write
    )
    with pytest.raises(Exception):
        merge_stations(spark, path, bad)
    assert spark.read.parquet(path).count() == before

    # crash at the swap itself: staging written, renames blocked
    import os as _os

    def no_rename(*a, **k):
        raise OSError("simulated crash at swap")

    monkeypatch.setattr(_os, "rename", no_rename)
    good = spark.createDataFrame(
        [("999", "new")], "wlobscd string, obsnm string"
    )
    with pytest.raises(OSError):
        merge_stations(spark, path, good)
    monkeypatch.undo()
    assert spark.read.parquet(path).count() == before


def test_multimodal_plumbing(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    mm = to_multimodal(docs)
    assert mm.schema["content"].dataType.typeName() == "binary"
    feats = extract_features(mm, fake=True, n_bins=8).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-9  # normalized histogram
        assert r.n_bytes > 0


def test_multimodal_decode_stub_raises(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(1)
    mm = to_multimodal(docs)
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        extract_features(mm, fake=False).collect()


def test_sharded_split_write_roundtrip(spark, tmp_path):
    """The training-output write path end-to-end: hash shard + split
    assignment as partitionBy keys; read-back is lossless and a
    single-shard read prunes to that partition's files."""
    import os

    import pyspark.sql.functions as F

    from hrfco_data_pipeline_spark.operators.sampling import hash_bucket
    from hrfco_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pct = hash_bucket("doc_id", 100)
    out = str(tmp_path / "corpus")
    staged = docs.select(
        "doc_id",
        "text",
        hash_bucket("doc_id", 4).alias("shard"),
        F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test").alias("split"),
    )
    staged.write.partitionBy("split", "shard").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition dirs exist for every split
    assert {d.name for d in os.scandir(out) if d.is_dir()} >= {
        "split=train", "split=val", "split=test"
    }
    # partition-pruned read touches one shard only and matches the plan
    one = spark.read.parquet(out).filter(
        (F.col("split") == "train") & (F.col("shard") == 1)
    )
    want = staged.filter((F.col("split") == "train") & (F.col("shard") == 1)).count()
    assert one.count() == want > 0
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "split=train" not in plan


def test_range_sharded_write_sorted_disjoint(spark, tmp_path):
    """write_range_sharded: every shard file is internally sorted and
    shard key ranges are pairwise disjoint — the global order exists
    across files without a global sort."""
    import glob

    from hrfco_data_pipeline_spark.sinks.writers import write_range_sharded
    from hrfco_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "n_chars"
    )
    out = str(tmp_path / "ranged")
    write_range_sharded(docs, out, "n_chars", 4)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 2
    ranges, total = [], 0
    for f in files:
        rows = [r["n_chars"] for r in spark.read.parquet(f).collect()]
        total += len(rows)
        if not rows:
            continue
        assert rows == sorted(rows), f"{f} not internally sorted"
        ranges.append((rows[0], rows[-1]))
    assert total == docs.count()
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "shard ranges overlap"
