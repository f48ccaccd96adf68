"""Batch/micro-batch sinks mirroring the reference's storage fan-out.

Reference semantics → Spark-idiomatic form:
- W3 MinIO JSON archive (HRFCOStorageService.java:143-158):
  ``{kind}/{date}`` partitioned files. We partition by *event* date by
  default (the reference uses wall-clock now — HRFCOStorageService.java:
  207 — set ``parity_mode=True`` to reproduce that quirk).
- W4 Timescale hypertable append (TimescaleDBRepository.java:136-161):
  date-partitioned parquet — hypertable ≙ time partitioning; bucket or
  Z-order by observation_code stands in for the secondary indexes.
- W2 Mongo station upsert (MongoDBRepository.java:90-108): keyed MERGE.
  Without a transactional table format in this container we implement
  merge-by-rewrite (full-outer join + overwrite); on a real deployment
  this is one ``MERGE INTO`` on Delta/Iceberg.
- W8 DLQ (DeadLetterQueueProducer.java:49-86): append-only envelope
  dataset.

All writers take already-classified DataFrames; the 3-way fan-out
(W6) is ``persist() → three writes → unpersist()`` in
streaming/pipeline.py, replacing the reference's 3-thread executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_archive(
    classified: DataFrame,
    path: str,
    fmt: str = "json",
    parity_mode: bool = False,
) -> None:
    """W3: kind/date-partitioned raw archive."""
    kind = F.when(F.col("is_anomaly"), "anomalies").otherwise("normal")
    if parity_mode:
        date = F.date_format(F.current_timestamp(), "yyyy-MM-dd")
    else:
        date = F.substring("obs_time_str", 1, 10)
    out = classified.withColumn("kind", kind).withColumn("obs_date", date)
    (
        out.write.partitionBy("kind", "obs_date")
        .mode("append")
        .format(fmt)
        .save(path)
    )


def write_fact(classified: DataFrame, path: str) -> None:
    """W4: the relational fact table (hypertable analog).

    Schema mirrors hrfco.water_level_data (TimescaleDBRepository.java:
    81-93); partitioned by observation date so time-range queries prune.
    """
    from hrfco_data_pipeline_spark.functions.coercion import parse_obs_time_kst

    fact = classified.select(
        F.col("wlobscd").alias("observation_code"),
        parse_obs_time_kst("obs_time_str").alias("observation_time"),
        F.col("water_level"),
        F.col("flow_rate"),
        F.coalesce("is_anomaly", F.lit(False)).alias("is_anomaly"),
        F.col("flood_warning_level"),
        F.current_timestamp().alias("created_at"),
    ).withColumn("obs_date", F.to_date("observation_time"))
    fact.write.partitionBy("obs_date").mode("append").parquet(path)


def write_dlq(dlq: DataFrame, path: str) -> None:
    """W8: append failure envelopes (adds publish timestamp)."""
    (
        dlq.withColumn("timestamp", F.unix_millis(F.current_timestamp()))
        .write.mode("append")
        .parquet(path)
    )


def recover_swap(table_path: str, marker: str = "_SUCCESS") -> str | None:
    """Complete or roll back an interrupted staged swap for
    ``table_path`` (the ``<table>__staging__`` / ``<table>__old__``
    protocol shared by merge_stations and streaming.curation.
    merge_lm_counts).

    A crash between the two commit renames leaves NO live table while
    the only full copies sit in the staging dir (the just-merged
    result) and/or the backup dir (the pre-merge state). Without this
    recovery, the next merge call would treat the table as absent,
    delete both dirs, and silently rebuild from the new batch alone —
    losing all accumulated state.

    Resolution order when the live table is missing:
    1. staging dir containing ``marker`` (written strictly after the
       data, so its presence proves the merge fully committed) →
       roll FORWARD: rename staging to live.
    2. otherwise a backup dir → roll BACK: rename backup to live (the
       merge that crashed mid-write is retried by the caller's
       at-least-once replay).
    When the live table exists, leftover staging/backup dirs are stale
    (crash after the final rename) and are removed.

    Returns ``"forward"``, ``"back"``, or ``None`` (nothing to do).
    """
    import os
    import shutil

    staging = f"{table_path}__staging__"
    backup = f"{table_path}__old__"
    if os.path.isdir(table_path):
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(backup, ignore_errors=True)
        return None
    if os.path.isdir(staging) and os.path.exists(os.path.join(staging, marker)):
        os.rename(staging, table_path)
        shutil.rmtree(backup, ignore_errors=True)
        return "forward"
    if os.path.isdir(backup):
        os.rename(backup, table_path)
        shutil.rmtree(staging, ignore_errors=True)
        return "back"
    return None


def merge_stations(
    spark: SparkSession, table_path: str, updates: DataFrame, key: str = "wlobscd"
) -> None:
    """W2: upsert station metadata by key (PutMongo Upsert=true analog).

    Merge-by-rewrite: existing rows not in `updates` are kept, matched
    keys are replaced, new keys inserted. The stations dim is tiny, so
    a full rewrite is cheap at any scale; swap for Delta/Iceberg
    ``MERGE INTO`` where a transactional format is available.

    Durability: the merged result is fully written to a STAGING dir
    while the live table is still untouched (the merge plan reads the
    live table lazily, so nothing may overwrite it mid-computation),
    then swapped in with two renames — live → backup, staging → live —
    and the backup removed. A crash anywhere before the first rename
    leaves the live table intact; a crash between the renames is
    healed by ``recover_swap`` on the next call (roll forward from the
    committed staging dir, else roll back from the backup). Never a
    state where the only copy is a half-written directory.
    Rename-as-commit assumes a filesystem with atomic dir rename
    (local/HDFS); on S3-like stores use a transactional table format
    instead.

    Commit evidence is an explicit ``_committed`` file written by this
    function strictly after the staging write returns — NOT the Hadoop
    committer's ``_SUCCESS``, whose presence depends on a deployment
    config (``mapreduce.fileoutputcommitter.marksuccessfuljobs``); on
    a cluster that disables it the roll-forward path would silently
    never engage (same contract as merge_lm_counts' ``_batch_id``).
    """
    import os
    import shutil

    recover_swap(table_path, marker="_committed")
    staging = f"{table_path}__staging__"
    backup = f"{table_path}__old__"
    shutil.rmtree(staging, ignore_errors=True)

    try:
        current = spark.read.parquet(table_path)
        exists = True
    except Exception:
        current, exists = None, False

    if exists:
        merged = current.join(updates, on=key, how="left_anti").unionByName(
            updates, allowMissingColumns=True
        )
    else:
        merged = updates

    merged.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, "_committed"), "w") as fh:
        fh.write("1")
    shutil.rmtree(backup, ignore_errors=True)
    if exists:
        os.rename(table_path, backup)
    os.rename(staging, table_path)
    shutil.rmtree(backup, ignore_errors=True)


def write_range_sharded(
    df: DataFrame, path: str, col: str, n_shards: int
) -> None:
    """Range-partitioned, within-shard-sorted output — the 100 TB
    pattern for key-ordered shard files (index-friendly parquet,
    merge-joinable downstream reads).

    ``repartitionByRange`` computes shard boundaries from a distributed
    reservoir sample (no global sort, one range-exchange) and
    ``sortWithinPartitions`` orders each shard locally — so the global
    order exists across files without any single node seeing the whole
    data. The equal-depth twin a small-scale oracle can check is
    ``plans/llm.docs_range_shards`` (window ntile); this writer is the
    scale path.
    """
    (
        df.repartitionByRange(n_shards, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def snapshot_sink(out_dir: str):
    """foreachBatch sink that maintains an always-consistent SNAPSHOT
    of a complete/update-mode streaming aggregate: each batch writes
    the full current result to a staging dir and atomically renames it
    over the previous snapshot (readers always see one complete
    version — the parquet analog of a materialized view refresh).
    Idempotent across batch replays: re-writing batch N just re-renames
    the same content."""
    import os
    import shutil

    def _write(batch_df, batch_id: int) -> None:
        staging = out_dir.rstrip("/") + f".staging-{batch_id}"
        backup = out_dir.rstrip("/") + ".old"
        shutil.rmtree(staging, ignore_errors=True)
        batch_df.write.mode("overwrite").parquet(staging)
        shutil.rmtree(backup, ignore_errors=True)
        if os.path.exists(out_dir):
            os.rename(out_dir, backup)
        os.rename(staging, out_dir)
        shutil.rmtree(backup, ignore_errors=True)

    return _write
