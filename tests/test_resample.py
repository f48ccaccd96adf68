"""Grouped-map resample/interpolate operator semantics."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F  # noqa: F401

from hrfco_data_pipeline_spark.operators.resample import resample_stations


def test_linear_interpolation_exact(spark):
    rows = [
        ("A", datetime(2024, 1, 1, 0, 0), 1.0),
        ("A", datetime(2024, 1, 1, 0, 30), 4.0),
        ("B", datetime(2024, 1, 1, 0, 0), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "wlobscd string, obs_ts timestamp, water_level double"
    )
    got = {
        (r.wlobscd, r.grid_ts.minute): (r.water_level, r.interpolated)
        for r in resample_stations(df, freq_minutes=10).collect()
    }
    assert got[("A", 0)] == (1.0, False)
    assert got[("A", 10)] == (2.0, True)
    assert got[("A", 20)] == (3.0, True)
    assert got[("A", 30)] == (4.0, False)
    assert got[("B", 0)] == (7.0, False)
    assert len(got) == 5


def test_no_edge_extrapolation_and_bucket_mean(spark):
    rows = [
        # two readings inside one bucket -> snapped to their mean
        ("C", datetime(2024, 1, 1, 0, 2), 2.0),
        ("C", datetime(2024, 1, 1, 0, 8), 4.0),
        ("C", datetime(2024, 1, 1, 0, 20), 9.0),
    ]
    df = spark.createDataFrame(
        rows, "wlobscd string, obs_ts timestamp, water_level double"
    )
    out = resample_stations(df, freq_minutes=10).collect()
    by_min = {r.grid_ts.minute: r for r in out}
    assert by_min[0].water_level == 3.0 and not by_min[0].interpolated
    assert by_min[10].water_level == 6.0 and by_min[10].interpolated
    assert by_min[20].water_level == 9.0 and not by_min[20].interpolated
    # grid starts/ends at data: no rows before 00:00 or after 00:20
    assert set(by_min) == {0, 10, 20}
