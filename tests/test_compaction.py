"""Compaction: row-parity, file-count reduction, crash safety."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hrfco_data_pipeline_spark.sinks.compaction import (
    _count_data_files,
    compact_partitions,
)


def _fragmented_table(spark, path: str) -> int:
    """Write a date-partitioned table as many tiny files (append x4)."""
    df = spark.range(0, 2000).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("d"),
        (F.col("id") * 2.5).alias("v"),
    )
    for i in range(4):
        (
            df.filter(F.col("id") % 4 == i)
            .repartition(8)
            .write.partitionBy("d")
            .mode("append")
            .parquet(path)
        )
    return 2000


def test_compaction_reduces_files_keeps_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    n = _fragmented_table(spark, path)
    before = _count_data_files(path)
    assert before > 40  # genuinely fragmented

    stats = compact_partitions(spark, path, ["d"])
    assert stats["rows"] == n
    assert stats["files_after"] <= 5  # one file per date partition
    assert stats["files_after"] < stats["files_before"] == before

    got = spark.read.parquet(path)
    assert got.count() == n
    # partition pruning still works post-compaction
    assert got.filter(F.col("d") == "3").count() == 400
    # idempotent: re-compacting is a no-op in file count
    again = compact_partitions(spark, path, ["d"])
    assert again["files_after"] == stats["files_after"]


def test_compaction_failed_swap_rolls_back(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "tbl")
    n = _fragmented_table(spark, path)

    # fail the staging→live rename (the worst moment: live dir already
    # moved aside) and assert the rollback restores the original
    import hrfco_data_pipeline_spark.sinks.compaction as comp

    real_rename = comp.os.rename

    def flaky_rename(src, dst):
        if src.endswith(".compact-staging"):
            raise OSError("simulated rename failure")
        real_rename(src, dst)

    monkeypatch.setattr(comp.os, "rename", flaky_rename)
    with pytest.raises(OSError, match="simulated"):
        comp.compact_partitions(spark, path, ["d"])
    monkeypatch.undo()

    # original (uncompacted) table restored intact
    assert spark.read.parquet(path).count() == n


def test_prune_partitions_drops_only_older(spark, tmp_path):
    from hrfco_data_pipeline_spark.sinks.compaction import prune_partitions

    path = str(tmp_path / "fact")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-03")],
        "id long, obs_date string",
    )
    df.write.partitionBy("obs_date").parquet(path)
    res = prune_partitions(path, "obs_date", keep_from="2024-01-02")
    assert res == {"dropped": 1, "kept": 2}
    back = spark.read.parquet(path)
    # partition values type-infer to DATE on read-back
    assert sorted(
        str(r.obs_date) for r in back.select("obs_date").collect()
    ) == ["2024-01-02", "2024-01-03"]


def test_backfill_replaces_only_named_partitions(spark, tmp_path):
    from hrfco_data_pipeline_spark.sinks.compaction import backfill_partitions

    path = str(tmp_path / "fact")
    spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-02")],
        "id long, obs_date string",
    ).write.partitionBy("obs_date").parquet(path)
    # replay day 2 with corrected rows (one row instead of two)
    fix = spark.createDataFrame(
        [(99, "2024-01-02")], "id long, obs_date string"
    )
    backfill_partitions(fix, path, ["obs_date"])
    back = spark.read.parquet(path)
    rows = {(r.id, str(r.obs_date)) for r in back.collect()}
    assert rows == {(1, "2024-01-01"), (99, "2024-01-02")}


def test_observed_metrics_on_curation(spark):
    """df.observe: free pipeline instrumentation — kept/dropped
    counters ride the job with no extra pass over the data."""
    from pyspark.sql import functions as F
    from pyspark.sql import Observation

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    obs = Observation("curation")
    gated = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_in"),
        F.sum((F.length("text") >= 100).cast("long")).alias("n_long"),
    ).filter(F.length("text") >= 100)
    n_out = gated.count()
    assert obs.get["n_in"] == docs.count()
    assert obs.get["n_long"] == n_out
