"""T13 ports: NiFiMetricsUtils format/parse behaviors (java twins)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hrfco_data_pipeline_spark.functions.metrics import (
    format_bytes,
    format_duration,
    parse_formatted_bytes,
    parse_queued_count,
)


def _eval(spark, col_fn, values, typ="long"):
    df = spark.createDataFrame([(v,) for v in values], f"v {typ}")
    return [r.o for r in df.select(col_fn(F.col("v")).alias("o")).collect()]


def test_format_bytes(spark):
    got = _eval(spark, format_bytes, [-5, 0, 512, 2048, 5 * 1024 * 1024, 3 * 1024**3])
    assert got == ["0 B", "0 B", "512 B", "2.00 KB", "5.00 MB", "3.00 GB"]


def test_parse_formatted_bytes(spark):
    cases = {
        None: 0,
        "": 0,
        "0 B": 0,
        "512 B": 512,
        "2.00 KB": 2048,
        "5.00 MB": 5 * 1024 * 1024,
        "1.50 GB": int(1.5 * 1024**3),
        "3 TB": 3 * 1024**4,
        "queue (2.00 KB)": 2048,
        "123": 123,
        "weird unit": 0,
    }
    got = _eval(spark, parse_formatted_bytes, list(cases), "string")
    assert got == list(cases.values())


def test_format_duration(spark):
    got = _eval(spark, format_duration, [30, 90, 3700, 90000])
    assert got == ["30초 전", "1분 30초 전", "1시간 1분 전", "1일 1시간 전"]


def test_parse_queued_count(spark):
    got = _eval(spark, parse_queued_count, ["0 (0 bytes)", "1,234 (5 MB)", "x", None], "string")
    assert got == [0, 1234, 0, 0]


def test_parse_nifi_timestamp_forms(spark):
    from hrfco_data_pipeline_spark.functions.metrics import parse_nifi_timestamp

    df = spark.createDataFrame(
        [
            (1, "01/15/2024 10:30:45.123"),
            (2, "2024-01-15T10:30:45Z"),
            (3, "garbage"),
            (4, "13/45/2024 99:99:99.999"),  # slash form, unparseable
        ],
        "id long, ts string",
    )
    out = {
        r.id: r.parsed
        for r in df.select(
            "id", parse_nifi_timestamp(F.col("ts")).alias("parsed")
        ).collect()
    }
    assert out[1] is not None and out[1].year == 2024 and out[1].second == 45
    assert out[2] is not None and out[2].hour == 10
    assert out[3] is None  # engine deviation: NULL, not now()
    assert out[4] is None
