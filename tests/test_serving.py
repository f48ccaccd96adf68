"""W9/A8 serving plane: push broadcast, memory-sink poll, gauges.

Mirrors AlertService.java semantics: keyed subscriber sets with an
"all" key, initial connected event, per-station filtered delivery,
remove-on-send-failure, and the total subscriber count.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hrfco_data_pipeline_spark.operators.classify import (
    build_alerts,
    process_observations,
)
from hrfco_data_pipeline_spark.plans.wire import synthetic_wire
from hrfco_data_pipeline_spark.sources.synthetic import synthetic_stations
from hrfco_data_pipeline_spark.streaming import observations_file_stream
from hrfco_data_pipeline_spark.streaming.pipeline import OBS_WIRE_SCHEMA
from hrfco_data_pipeline_spark.streaming.serving import (
    AlertBroadcaster,
    active_stream_count,
    attach_broadcast,
    serve_memory,
)

SF = "/root/testdata/sf0.001"


def _stage(spark, src: str) -> None:
    synthetic_wire(spark, SF).select("value").coalesce(2).write.mode(
        "overwrite"
    ).text(src)


def _alerts_stream(spark, src: str):
    stream = observations_file_stream(spark, src)
    good = stream.filter(F.col("_corrupt").isNull()).drop("value", "_corrupt")
    return build_alerts(process_observations(good, synthetic_stations(spark)))


def _expected_alerts(spark, src: str):
    """Batch twin of the streaming transform chain, for oracle counts."""
    raw = spark.read.text(src)
    rec = F.from_json(
        "value",
        OBS_WIRE_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    parsed = raw.select(rec.alias("rec")).select("rec.*")
    good = parsed.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    return build_alerts(process_observations(good, synthetic_stations(spark)))


def test_broadcast_push_filtering_and_pruning(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    _stage(spark, src)

    expected = _expected_alerts(spark, src)
    per_station = {
        r["observation_code"]: r["n"]
        for r in expected.groupBy("observation_code").agg(F.count("*").alias("n")).collect()
    }
    total = sum(per_station.values())
    code = sorted(per_station)[0]

    bc = AlertBroadcaster()
    all_events: list[dict] = []
    st_events: list[dict] = []
    bc.subscribe(all_events.append)
    bc.subscribe(st_events.append, station=code)

    # a subscriber whose send fails on the first alert must be pruned
    # (AlertService.java:84-95 removeIf)
    def flaky(event: dict) -> None:
        if event["event"] == "alert":
            raise ConnectionError("client went away")

    bc.subscribe(flaky)
    assert bc.subscriber_count() == 3

    q = attach_broadcast(_alerts_stream(spark, src), bc, ckpt)
    assert q.awaitTermination(300)

    # initial connected event + one event per alert, exactly
    assert all_events[0] == {"event": "connected", "station": "all"}
    assert len(all_events) - 1 == total
    # station subscriber saw only its own station, all of it
    st_alerts = [e for e in st_events if e["event"] == "alert"]
    assert len(st_alerts) == per_station[code]
    assert {e["data"]["observation_code"] for e in st_alerts} == {code}
    # flaky subscriber was pruned on first failed send
    assert bc.subscriber_count() == 2


def test_memory_sink_poll_and_gauge(spark, tmp_path):
    src = str(tmp_path / "src")
    _stage(spark, src)
    expected_n = _expected_alerts(spark, src).count()

    q = serve_memory(_alerts_stream(spark, src), "alerts_mem", available_now=False)
    try:
        assert active_stream_count(spark) >= 1
        q.processAllAvailable()
        got = spark.sql(
            "SELECT count(*) AS n, count(DISTINCT warning_level) AS lv FROM alerts_mem"
        ).first()
        assert got["n"] == expected_n and got["lv"] >= 1
    finally:
        q.stop()
