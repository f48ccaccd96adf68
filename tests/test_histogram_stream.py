"""Streaming histogram rollup: stream partials ≡ batch daily histogram."""
from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from hrfco_data_pipeline_spark.sources.tables import load_table
from hrfco_data_pipeline_spark.streaming.analytics import histogram_rollup_stream

SF = "/root/testdata/sf0.001"


def test_histogram_rollup_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    batch_ev = load_table(spark, SF, "events")
    batch_ev.write.mode("overwrite").parquet(str(src / "part"))
    stream = (
        spark.readStream.schema(batch_ev.schema)
        .parquet(str(src / "part"))
    )
    q = (
        histogram_rollup_stream(stream)
        .writeStream.format("memory")
        .queryName("hist_partials")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    # a wall-clock day may straddle two eviction windows in non-UTC
    # sessions: merge partials per (type, day, bucket) exactly as the
    # batch face does (integer adds)
    got: dict = {}
    for r in spark.sql("SELECT * FROM hist_partials").collect():
        k = (r.event_type, r.day, r.bucket)
        got[k] = got.get(k, 0) + r.n
    assert got, "no finalized partial windows"
    bucket = F.least(F.floor("value").cast("int"), F.lit(511))
    # day from the NTZ wall clock — identical to the stream's label
    # in ANY session timezone
    want_df = (
        batch_ev.filter(F.col("value").isNotNull() & (F.col("value") >= 0))
        .groupBy(
            "event_type",
            F.to_date("ts").alias("day"),
            bucket.alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )
    want = {
        (r.event_type, r.day, r.bucket): r.n for r in want_df.collect()
    }
    # availableNow + watermark finalize all but the last open day(s):
    # every fully-finalized day must equal its batch twin exactly (the
    # max emitted day may have a still-open second eviction window in
    # non-UTC sessions, so it is excluded from the exact compare)
    last_day = max(k[1] for k in got)
    for k, n in got.items():
        if k[1] != last_day:
            assert want.get(k) == n, k
    # and the stream must have finalized the overwhelming majority
    assert len(got) >= 0.8 * len(want)
