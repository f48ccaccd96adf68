"""Ports of the reference's WaterLevelDataTest / StationThresholdTest cases.

These are the executable spec for T4 (string→double) and T5 (time
reformat): same inputs, same expected outputs as the Java tests
(hrfco-kafka-streams/src/test/java/.../model/WaterLevelDataTest.java,
.../cache/StationThresholdTest.java).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from hrfco_data_pipeline_spark.functions import java_double, reformat_ymdhm


def _eval_double(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.d for r in df.select(java_double("v").alias("d")).collect()]


# (input, expected) — WaterLevelDataTest.java:12-58 plus Java-parse edge cases
T4_CASES = [
    ("1.23", 1.23),
    ("-5.5", -5.5),
    (None, None),
    ("", None),
    ("   ", None),
    (" ", None),
    ("abc", None),
    ("3", 3.0),
    (" 2.5 ", 2.5),
    ("+3", 3.0),
    ("1.2d", 1.2),  # Java Double.parseDouble accepts suffix forms
    ("1.2f", 1.2),
    ("0x1p3", 8.0),  # hex float
]


def test_java_double_parity(spark):
    got = _eval_double(spark, [c[0] for c in T4_CASES])
    for (inp, want), g in zip(T4_CASES, got):
        assert g == pytest.approx(want) if want is not None else g is None, (inp, g)


def test_java_double_nan_infinity(spark):
    got = _eval_double(spark, ["NaN", "Infinity", "-Infinity"])
    assert math.isnan(got[0])
    assert got[1] == math.inf
    assert got[2] == -math.inf


# WaterLevelDataTest.java:79-97 — reformat only when length==12, else passthrough
T5_CASES = [
    ("202512091530", "2025-12-09 15:30"),
    ("20251209", "20251209"),  # wrong length → passthrough
    ("2025120915301", "2025120915301"),
    (None, None),
    ("", ""),
    ("abcdefghijkl", "abcd-ef-gh ij:kl"),  # pure slicing, like the Java
]


def test_reformat_ymdhm(spark):
    df = spark.createDataFrame([(v,) for v in [c[0] for c in T5_CASES]], "v string")
    got = [r.t for r in df.select(reformat_ymdhm("v").alias("t")).collect()]
    assert got == [c[1] for c in T5_CASES]


# StationThresholdTest.java:63-105 — same coercion applies to thresholds
def test_threshold_coercion(spark):
    cases = [("3.0", 3.0), ("3", 3.0), ("", None), (" ", None), ("not_a_number", None)]
    got = _eval_double(spark, [c[0] for c in cases])
    assert got == [c[1] for c in cases]
