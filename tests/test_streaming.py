"""E2E streaming pipeline test: file source → foreachBatch 3-way fan-out."""

from __future__ import annotations

from hrfco_data_pipeline_spark.plans.wire import synthetic_wire
from hrfco_data_pipeline_spark.sources.synthetic import synthetic_stations
from hrfco_data_pipeline_spark.streaming import (
    observations_file_stream,
    run_stream,
)

SF = "/root/testdata/sf0.001"


def test_stream_fanout(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    synthetic_wire(spark, SF).select("value").coalesce(2).write.mode(
        "overwrite"
    ).text(src)

    q = run_stream(
        spark,
        observations_file_stream(spark, src),
        synthetic_stations(spark),
        out,
        ckpt,
    )
    assert q.awaitTermination(300)

    archive = spark.read.json(f"{out}/archive")
    fact = spark.read.parquet(f"{out}/fact")
    dlq = spark.read.parquet(f"{out}/dlq")
    alerts = spark.read.parquet(f"{out}/alerts")

    n = archive.count()
    assert n > 0 and n == fact.count() == alerts.count()
    # parse-corrupt records are DLQ'd (W8), F1 drops are NOT (silent)
    assert dlq.count() > 0
    kinds = {r["kind"] for r in archive.select("kind").distinct().collect()}
    assert kinds == {"normal", "anomalies"}
    levels = {r["warning_level"] for r in alerts.select("warning_level").distinct().collect()}
    assert "ANOMALY" in levels and "NORMAL" in levels
    # C5: internal levels never leak into the published alerts
    assert not levels & {"NO_THRESHOLD", "PARTIAL_THRESHOLD"}


def test_stream_restart_exactly_once_fact_rows(spark, tmp_path):
    """R3/W4 continuity: stop after batch 1, add data, restart on the
    same checkpoint — the fact sink ends with exactly the union of both
    runs' valid rows, no duplicates and no loss."""
    import pyspark.sql.functions as F

    src, out, ckpt = str(tmp_path / "src2"), str(tmp_path / "o2"), str(tmp_path / "ck2")
    wire = synthetic_wire(spark, SF).select("obs_id", "value")
    first = wire.filter(F.col("obs_id") < 500)
    second = wire.filter(F.col("obs_id") >= 500)
    first.select("value").coalesce(1).write.mode("overwrite").text(src)

    def run_once():
        q = run_stream(
            spark,
            observations_file_stream(spark, src),
            synthetic_stations(spark),
            out,
            ckpt,
        )
        assert q.awaitTermination(300)

    run_once()
    n1 = spark.read.parquet(f"{out}/fact").count()
    assert n1 > 0

    # land the second half as NEW files (append-only source contract)
    second.select("value").coalesce(1).write.mode("append").text(src)
    run_once()
    n2 = spark.read.parquet(f"{out}/fact").count()
    assert n2 > n1
    # exactly-once: fact row count equals the batch twin over BOTH
    # landed files — a replayed batch would overshoot, a lost one undershoot
    from hrfco_data_pipeline_spark.operators.classify import process_observations

    batch_raw = (
        spark.read.text(src)
        .select(
            F.from_json(
                "value", "wlobscd string, ymdhm string, wl string, fw string"
            ).alias("r")
        )
        .select("r.*")
        .filter(F.col("wlobscd").isNotNull())
    )
    want = process_observations(batch_raw, synthetic_stations(spark)).count()
    assert n2 == want


def test_snapshot_sink_complete_mode(spark, tmp_path):
    """A complete-mode aggregate materialized through snapshot_sink is
    a consistent, atomically-replaced parquet view of the latest state
    and equals the batch aggregate over the same input."""
    import json as _json

    from hrfco_data_pipeline_spark.sinks.writers import snapshot_sink

    src = tmp_path / "src"
    src.mkdir()
    rows = [{"k": "a"}, {"k": "b"}, {"k": "a"}, {"k": "c"}, {"k": "a"}]
    (src / "1.json").write_text("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema("k string").json(str(src))
    agg = stream.groupBy("k").count()
    out = str(tmp_path / "snap")
    q = (
        agg.writeStream.foreachBatch(snapshot_sink(out))
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {r.k: r["count"] for r in spark.read.parquet(out).collect()}
    assert got == {"a": 3, "b": 1, "c": 1}
    import os

    assert not [
        d for d in os.listdir(tmp_path) if ".staging" in d or d.endswith(".old")
    ]
