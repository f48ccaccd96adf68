"""Ports of WaterLevelValidatorTest (F1/F2/C3) + AnomalyDetector (C1-C5)
decision-table tests, run through the full DataFrame pipeline.

Reference: hrfco-kafka-streams/src/test/java/.../validator/
WaterLevelValidatorTest.java (27 cases) and .../processor/AnomalyDetector
semantics (AnomalyDetector.java:46-105).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hrfco_data_pipeline_spark.operators import (
    required_fields_filter,
    range_valid_flag,
)
from hrfco_data_pipeline_spark.operators.classify import (
    parse_observations,
    process_observations,
    build_alerts,
)

OBS_SCHEMA = "wlobscd string, ymdhm string, wl string, fw string"
ST_SCHEMA = "wlobscd string, obsnm string, attwl string, wrnwl string, almwl string, srswl string"

# full-tier station: 3.0 / 5.0 / 7.0 / 9.0 (WaterLevelValidatorTest.java:121-192)
STATIONS = [
    ("FULL", "full", "3.0", "5.0", "7.0", "9.0"),
    ("PARTIAL", "one-tier", None, None, None, "9.0"),  # only critical
    ("ZEROS", "all-invalid", "0", "-1", "", "not_a_number"),  # 0 valid
    ("ALLNULL", "all-null", None, None, None, None),
    ("TWO", "two-tier", "3.0", None, None, "9.0"),
]


def _stations(spark):
    return spark.createDataFrame(STATIONS, ST_SCHEMA)


def _run(spark, rows):
    obs = spark.createDataFrame(rows, OBS_SCHEMA)
    return process_observations(obs, _stations(spark))


def _levels(spark, rows):
    out = _run(spark, rows).select("wlobscd", "ymdhm", "flood_warning_level", "is_anomaly")
    return {(r.wlobscd, r.ymdhm): (r.flood_warning_level, r.is_anomaly) for r in out.collect()}


def test_f1_required_fields_drop(spark):
    """WaterLevelValidatorTest.java:25-52: drop on missing code/time/both-measurements."""
    rows = [
        ("FULL", "202501010000", "1.0", "2.0"),  # keep
        (None, "202501010000", "1.0", "2.0"),  # no code
        ("", "202501010000", "1.0", "2.0"),  # empty code
        ("  ", "202501010000", "1.0", "2.0"),  # blank code
        ("FULL", None, "1.0", "2.0"),  # no time
        ("FULL", "", "1.0", "2.0"),  # empty time
        ("FULL", "202501010000", None, None),  # both measurements missing
        ("FULL", "202501010000", "", " "),  # both blank
        ("FULL", "202501010001", "1.0", None),  # wl only → keep
        ("FULL", "202501010002", None, "2.0"),  # fw only → keep
    ]
    kept = _run(spark, rows).count()
    assert kept == 3


@pytest.mark.parametrize(
    "wl,fw,valid",
    [
        ("0.0", "100.0", True),
        ("-10.0", "0.0", True),  # boundaries inclusive (:105-114)
        ("50.0", "50000.0", True),
        ("-10.1", "1.0", False),
        ("50.1", "1.0", False),
        ("1.0", "-0.1", False),
        ("1.0", "50000.1", False),
        (None, "1.0", True),  # null wl skips wl check
        ("1.0", None, True),
    ],
)
def test_f2_range(spark, wl, fw, valid):
    df = parse_observations(
        spark.createDataFrame([("FULL", "202501010000", wl, fw)], OBS_SCHEMA)
    )
    flagged = range_valid_flag(df)
    assert flagged.collect()[0].range_valid is valid


def test_c3_ladder_full_tiers(spark):
    """WaterLevelValidatorTest.java:121-192 ladder on 3/5/7/9 thresholds."""
    rows = [
        ("FULL", "t_norm", "2.9", None),
        ("FULL", "t_att", "3.0", None),  # exact boundary → that level (:188-192)
        ("FULL", "t_att2", "4.9", None),
        ("FULL", "t_caut", "5.0", None),
        ("FULL", "t_warn", "7.5", None),
        ("FULL", "t_crit", "9.0", None),
        ("FULL", "t_crit2", "20.0", None),
    ]
    got = _levels(spark, rows)
    assert got[("FULL", "t_norm")] == ("NORMAL", False)
    assert got[("FULL", "t_att")] == ("ATTENTION", False)
    assert got[("FULL", "t_att2")] == ("ATTENTION", False)
    assert got[("FULL", "t_caut")] == ("CAUTION", False)
    assert got[("FULL", "t_warn")] == ("WARNING", False)
    assert got[("FULL", "t_crit")] == ("CRITICAL", False)
    assert got[("FULL", "t_crit2")] == ("CRITICAL", False)


def test_c1_anomaly_short_circuits(spark):
    got = _levels(spark, [("FULL", "t", "55.0", None), ("FULL", "t2", "-15.0", None)])
    assert got[("FULL", "t")] == (None, True)
    assert got[("FULL", "t2")] == (None, True)


def test_c2_threshold_completeness(spark):
    rows = [
        ("NOSTATION", "t", "1.0", None),  # no station row → NO_THRESHOLD
        ("ZEROS", "t", "1.0", None),  # 0 valid thresholds → NO_THRESHOLD
        ("PARTIAL", "t", "1.0", None),  # 1 valid → PARTIAL_THRESHOLD
        ("PARTIAL", "t_hi", "20.0", None),  # still PARTIAL even above critical
        ("TWO", "t", "10.0", None),  # 2 valid → ladder runs → CRITICAL
        ("TWO", "t_mid", "4.0", None),  # attwl only tier matched
        ("ALLNULL", "t", "1.0", None),  # station exists, wl non-null, 0 valid → NO_THRESHOLD
        ("ALLNULL", "t_null", None, "5.0"),  # wl null → gates skipped → C3 null → NORMAL
        ("NOSTATION", "t_null", None, "5.0"),  # no station → NO_THRESHOLD even w/ null wl
        ("FULL", "t_null", None, "5.0"),  # wl null, full station → NORMAL
    ]
    got = _levels(spark, rows)
    assert got[("NOSTATION", "t")] == ("NO_THRESHOLD", False)
    assert got[("ZEROS", "t")] == ("NO_THRESHOLD", False)
    assert got[("PARTIAL", "t")] == ("PARTIAL_THRESHOLD", False)
    assert got[("PARTIAL", "t_hi")] == ("PARTIAL_THRESHOLD", False)
    assert got[("TWO", "t")] == ("CRITICAL", False)
    assert got[("TWO", "t_mid")] == ("ATTENTION", False)
    assert got[("ALLNULL", "t")] == ("NO_THRESHOLD", False)
    assert got[("ALLNULL", "t_null")] == ("NORMAL", False)
    assert got[("NOSTATION", "t_null")] == ("NO_THRESHOLD", False)
    assert got[("FULL", "t_null")] == ("NORMAL", False)


def test_c5_alert_normalization_and_message(spark):
    rows = [
        ("NOSTATION", "202501010000", "1.0", None),
        ("FULL", "202501010000", "9.5", None),
        ("FULL", "202501010010", "55.0", None),  # anomaly
        ("FULL", "202501010020", None, "70000.0"),  # anomaly via fw, null wl
    ]
    alerts = build_alerts(_run(spark, rows))
    got = {(r.observation_code, r.observation_time): r for r in alerts.collect()}
    a = got[("NOSTATION", "2025-01-01 00:00")]
    assert (a.warning_level, a.is_anomaly) == ("NORMAL", False)
    assert a.message == "관측소 NOSTATION에서 NORMAL 수위 경보 (수위: 1.00 m)"
    b = got[("FULL", "2025-01-01 00:00")]
    assert (b.warning_level, b.is_anomaly) == ("CRITICAL", False)
    c = got[("FULL", "2025-01-01 00:10")]
    assert (c.warning_level, c.is_anomaly) == ("ANOMALY", True)
    assert c.message == "관측소 FULL에서 이상치 감지 (수위: 55.00 m)"
    d = got[("FULL", "2025-01-01 00:20")]
    assert (d.warning_level, d.is_anomaly) == ("ANOMALY", True)
    assert d.message == "관측소 FULL에서 이상치 감지 (수위: nu m)"  # Java %.2f(null)


def test_threshold_string_coercion_in_join(spark):
    """Thresholds arrive as strings/numbers; garbage → null (StationThresholdTest)."""
    got = _levels(spark, [("ZEROS", "t2", "100.0", None)])
    # wl=100 is out of physical range → anomaly wins over any threshold logic
    assert got[("ZEROS", "t2")] == (None, True)


def test_w7_kafka_frame(spark):
    from hrfco_data_pipeline_spark.operators.classify import alerts_kafka_frame
    import json

    rows = [("FULL", "202501010000", "9.5", None)]
    frame = alerts_kafka_frame(build_alerts(_run(spark, rows)))
    assert frame.columns == ["key", "value"]
    r = frame.collect()[0]
    assert r.key == "FULL"
    payload = json.loads(r.value)
    assert payload["warningLevel"] == "CRITICAL"
    assert payload["isAnomaly"] is False
    assert payload["observationTime"] == "2025-01-01 00:00"
