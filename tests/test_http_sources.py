"""S2/S3 HTTP ingestion + T7 dynamic station tail, on canned payloads."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from hrfco_data_pipeline_spark.sources.http import (
    fetch_hrfco,
    observations_from_json,
    stations_from_json,
)

OBS_PAYLOAD = json.dumps(
    {
        "content": [
            # clean record + an unknown field (POJO ignore-unknown)
            {"wlobscd": "42", "ymdhm": "202501011230", "wl": "5.60",
             "fw": None, "junk": 1},
            # JSON-number fields keep their literal token text
            {"wlobscd": 7, "wl": 5.60},
            # non-dict elements are skipped like a per-record parse failure
            "not-a-record",
        ]
    }
)

STATION_PAYLOAD = json.dumps(
    {
        "content": [
            {
                "wlobscd": "1",
                "attwl": "2.5",
                "wrnwl": "",
                "almwl": "x",
                "srswl": 7.5,
                "obsnm": "  Seoul  ",
                "addr": "",
                "active": True,
                "meta": {"a": 1},
                "gauge": 3,
            },
            {"noid": 1},  # no wlobscd → skipped (per-station try/catch)
        ]
    }
)


def test_observations_from_json_flatten_and_ignore_unknown(spark):
    df = observations_from_json(spark, OBS_PAYLOAD)
    assert df.columns == ["wlobscd", "ymdhm", "wl", "fw"]
    rows = {r.wlobscd: r for r in df.collect()}
    assert set(rows) == {"42", "7"}
    assert rows["42"].wl == "5.60" and rows["42"].fw is None
    # number token text preserved, missing fields null
    assert rows["7"].wl == "5.6" or rows["7"].wl == "5.60"
    assert rows["7"].ymdhm is None


def test_observations_number_token_is_literal(spark):
    payload = json.dumps({"content": [{"wlobscd": 1, "wl": 5.60}]})
    row = observations_from_json(spark, payload).collect()[0]
    # 5.60 in source text — json round-trips the token via parse hooks;
    # json.dumps already normalized OUR canned payload, so feed raw text
    raw = '{"content": [{"wlobscd": 1, "wl": 5.60}]}'
    row = observations_from_json(spark, raw).collect()[0]
    assert row.wl == "5.60"
    assert row.wlobscd == "1"


def test_observations_bad_payloads_yield_empty(spark):
    for payload in (None, "", "not json", '{"content": 3}', '{"x": []}', "[1,2]"):
        assert observations_from_json(spark, payload).count() == 0


def test_observations_feed_the_real_pipeline(spark):
    """T1/T3 through the actual hot path: canned poll → classify."""
    from hrfco_data_pipeline_spark.operators.classify import (
        build_alerts,
        process_observations,
    )
    from hrfco_data_pipeline_spark.sources.synthetic import synthetic_stations

    raw = json.dumps(
        {
            "content": [
                {"wlobscd": "0", "ymdhm": "202501011230", "wl": "9.99", "fw": "1.0"},
                {"wlobscd": "", "ymdhm": "202501011230", "wl": "1.0", "fw": "1.0"},
                {"wlobscd": "5", "ymdhm": "202501011230", "wl": "55.5", "fw": "1.0"},
            ]
        }
    )
    obs = observations_from_json(spark, raw)
    stations = synthetic_stations(spark)
    alerts = build_alerts(process_observations(obs, stations))
    rows = {r.observation_code: r for r in alerts.collect()}
    # blank code dropped by F1 (silent, not DLQ)
    assert set(rows) == {"0", "5"}
    # station 0 has the full ladder base 2.0: wl 9.99 >= srswl 8.0 → CRITICAL
    assert rows["0"].warning_level == "CRITICAL"
    # wl 55.5 out of physical range → ANOMALY
    assert rows["5"].warning_level == "ANOMALY" and rows["5"].is_anomaly


def test_stations_from_json_typing(spark):
    df = stations_from_json(spark, STATION_PAYLOAD)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.wlobscd == "1"
    assert r.attwl == 2.5
    assert r.wrnwl is None  # empty string
    assert r.almwl is None  # parse failure
    assert r.srswl == 7.5  # JSON number via literal token
    extra = r.extra
    assert extra["obsnm"] == "Seoul"  # trimmed
    assert extra["addr"] is None  # empty → null
    assert extra["active"] == "true"
    assert extra["meta"] == ""  # Jackson asText() quirk on objects
    assert extra["gauge"] == "3.0"  # number → asDouble → toString


def test_fetch_hrfco_failure_paths(monkeypatch):
    import urllib.request

    def boom(url, timeout=None):
        raise OSError("no network")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    assert fetch_hrfco("http://example.invalid/x.json") is None

    class FakeResp:
        status = 500

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return b"{}"

    monkeypatch.setattr(urllib.request, "urlopen", lambda u, timeout=None: FakeResp())
    assert fetch_hrfco("http://example.invalid/x.json") is None

    class OkResp(FakeResp):
        status = 200

        def read(self):
            return '{"content": []}'.encode()

    monkeypatch.setattr(urllib.request, "urlopen", lambda u, timeout=None: OkResp())
    assert fetch_hrfco("http://example.invalid/x.json") == '{"content": []}'


def test_dynamic_station_tail_columnar(spark):
    from hrfco_data_pipeline_spark.operators.stations import (
        dynamic_station_tail,
        explode_station_tail,
    )

    df = spark.createDataFrame(
        [("1", "2.5", "  Seoul  ", 3, True, "")],
        "wlobscd string, attwl string, obsnm string, gauge int, active boolean, addr string",
    )
    tail = dynamic_station_tail(df)
    r = tail.collect()[0]
    assert r.extra == {
        "obsnm": "Seoul",
        "gauge": "3.0",
        "active": "true",
        "addr": None,
    }
    pairs = {
        (p.field): p.value
        for p in explode_station_tail(tail).collect()
    }
    assert pairs["addr"] is None and pairs["obsnm"] == "Seoul"


def test_java_double_str_magnitude_edges():
    """Double.toString parity across the notation switch points
    (StationThresholdLoader.java:74-99 renders dynamic numeric fields
    via value.asDouble() -> Double.toString)."""
    from hrfco_data_pipeline_spark.sources.http import java_double_str as j

    # plain-decimal band: 1e-3 <= |v| < 1e7
    assert j(3.0) == "3.0"
    assert j(100.0) == "100.0"
    assert j(123.456) == "123.456"
    assert j(0.001) == "0.001"
    assert j(0.0015) == "0.0015"
    assert j(9999999.0) == "9999999.0"
    assert j(-42.5) == "-42.5"
    # scientific band with Java 'E' form (Python repr would give
    # '12345678.0', '1e+16', '0.0001', '2.5e-06')
    assert j(12345678.0) == "1.2345678E7"
    assert j(1e7) == "1.0E7"
    assert j(1e16) == "1.0E16"
    assert j(-1e16) == "-1.0E16"
    assert j(1e-4) == "1.0E-4"
    assert j(9.99e-4) == "9.99E-4"
    assert j(2.5e-6) == "2.5E-6"
    assert j(1.7976931348623157e308) == "1.7976931348623157E308"
    # specials
    assert j(float("nan")) == "NaN"
    assert j(float("inf")) == "Infinity"
    assert j(float("-inf")) == "-Infinity"
    assert j(0.0) == "0.0"
    assert j(-0.0) == "-0.0"
    # documented divergences: the legacy (pre-Ryū, JDK < 19) algorithm
    # emits non-shortest digits on a rare value set — measured ~0.3% of
    # random bit patterns, all at |v| >= ~1e16 or subnormal, none in
    # the corpus band (see test_java_double_str_jdk_cross_check).
    # Python's shortest digits: '5.0E-324' / '5.0E22'; JDK 17:
    # '4.9E-324' / '4.9999999999999996E22' (all round-trip).
    assert j(5e-324) == "5.0E-324"
    assert j(5e22) == "5.0E22"


def test_java_double_str_jdk_cross_check(tmp_path):
    """Hard wire-parity evidence: every double the synthetic wire/station
    corpus can actually produce (cents/100 values in the wl, fw, and
    threshold bands — all inside the plain-decimal notation band)
    renders byte-identically to a real JDK-17 ``Double.toString``.
    The legacy pre-Ryū divergence (non-shortest digits) only occurs at
    |v| >= ~1e16 or subnormal — magnitudes the corpus never emits.
    Skips when no JDK is on PATH."""
    import shutil
    import struct
    import subprocess

    import pytest

    from hrfco_data_pipeline_spark.sources.http import java_double_str as j

    javac = shutil.which("javac")
    java = shutil.which("java")
    if not javac or not java:
        pytest.skip("no JDK available for Double.toString cross-check")

    src = tmp_path / "DS.java"
    src.write_text(
        "import java.io.*;\n"
        "public class DS { public static void main(String[] a) throws Exception {\n"
        "  BufferedReader r = new BufferedReader(new InputStreamReader(System.in));\n"
        "  PrintWriter w = new PrintWriter(new BufferedWriter(new OutputStreamWriter(System.out)));\n"
        "  String line;\n"
        "  while ((line = r.readLine()) != null) {\n"
        "    if (line.isEmpty()) continue;\n"
        "    double d = Double.longBitsToDouble(Long.parseUnsignedLong(line, 16));\n"
        "    w.println(Double.toString(d)); }\n"
        "  w.flush(); } }\n"
    )
    subprocess.run([javac, str(src)], cwd=tmp_path, check=True)

    # the corpus value space (sources/synthetic.py): wl cents 0..1300
    # plus literals 55.0/-15.0; fw cents 0..4,000,000 plus 60000.0;
    # threshold cents 200..1000 — exhaustive over wl/thresholds,
    # stride-sampled over fw
    vals = [c / 100.0 for c in range(0, 1301)]
    vals += [-15.0, 55.0, 60000.0]
    vals += [c / 100.0 for c in range(0, 4000000, 97)]
    vals += [c / 100.0 for c in range(200, 1001, 50)]

    def bits(v: float) -> str:
        return format(struct.unpack("<Q", struct.pack("<d", v))[0], "x")

    out = subprocess.run(
        [java, "-cp", str(tmp_path), "DS"],
        input="\n".join(bits(v) for v in vals),
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    assert len(out) == len(vals)
    mismatches = [
        (v, j(v), jdk) for v, jdk in zip(vals, out) if j(v) != jdk
    ]
    assert not mismatches, mismatches[:5]


def test_java_double_str_roundtrips():
    import math
    import random
    import struct

    from hrfco_data_pipeline_spark.sources.http import java_double_str as j

    rng = random.Random(7)
    for _ in range(5000):
        v = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0]
        if math.isnan(v) or math.isinf(v):
            continue
        assert float(j(v).replace("E", "e")) == v
