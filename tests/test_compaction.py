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
