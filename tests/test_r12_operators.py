"""Unit tests for the operators and guard fixes added in round 12.

Each plan-level test recomputes the expected answer in pure Python
over a tiny hand-built frame, so a Spark-side regression cannot hide
behind an oracle that shares the same mistake."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_psi_pad_guard_raises_on_overfull_grid(spark):
    """psi_from_bucket_counts enforces the 10-bucket invariant loudly:
    an 11-row grid for one type must raise, not silently emit an
    empty pad (ADVICE r11)."""
    from hrfco_data_pipeline_spark.plans.relational import psi_from_bucket_counts

    rows = [Row(event_type="a", bucket=b, c1=1, c2=1) for b in range(11)]
    counts = spark.createDataFrame(rows)
    with pytest.raises(Exception, match="more than 10 bucket rows"):
        psi_from_bucket_counts(counts).collect()


def test_psi_pad_guard_ok_at_exactly_ten(spark):
    """A full 10-bucket grid with identical halves folds to PSI 0."""
    from hrfco_data_pipeline_spark.plans.relational import psi_from_bucket_counts

    rows = [Row(event_type="a", bucket=b, c1=3, c2=3) for b in range(10)]
    out = psi_from_bucket_counts(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0].n_first == 30 and out[0].n_second == 30
    assert out[0].psi == 0.0


def test_psi_decile_cut_is_integer_exact(spark):
    """The decile rank cut uses integer `div`, so it agrees with the
    exact k = floor((n*i-1)/10)+1 for values where float floor() would
    already be suspect; spot-check the expression at a few n."""
    for n in (7, 10, 12345, 2**53 + 11):
        got = (
            spark.range(1)
            .select(
                F.expr(
                    f"transform(sequence(1, 9), i -> "
                    f"(CAST({n} AS BIGINT) * i - 1) div 10 + 1)"
                ).alias("cuts")
            )
            .head()
            .cuts
        )
        want = [(n * i - 1) // 10 + 1 for i in range(1, 10)]
        assert got == want, f"n={n}"


def _write_parts(spark, tmp_path, rows):
    """rows: (partkey, retailprice, size)"""
    parts = spark.createDataFrame(
        [(k, f"part{k}", "BRAND#1", "TYPE", s, float(p)) for k, p, s in rows],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    out = str(tmp_path / "parts_tbl")
    parts.write.parquet(f"{out}/part.parquet")
    return out


def test_skyline_vs_bruteforce_dominance(spark, tmp_path):
    """The running-record frontier must equal the quadratic dominance
    definition recomputed in pure Python, including the tricky cases:
    same-price smaller-size (dominated), same-size higher-price
    (dominated), exact duplicate points (both survive)."""
    from hrfco_data_pipeline_spark.plans.relational import parts_price_size_skyline

    rows = [
        (1, 1.00, 5),
        (2, 1.00, 3),   # dominated: same price, smaller size
        (3, 0.90, 5),   # dominates 1 (cheaper, same size)
        (4, 1.10, 7),   # frontier: bigger size at higher price
        (5, 1.20, 7),   # dominated: same size as 4, pricier
        (6, 0.50, 1),   # frontier: cheapest overall
        (7, 0.90, 5),   # duplicate of 3: both must survive
    ]
    pts = [(k, round(p * 100), s) for k, p, s in rows]
    expected = {
        k
        for k, pc, s in pts
        if not any(
            qc <= pc and qs >= s and (qc < pc or qs > s)
            for _, qc, qs in pts
        )
    }
    sf = _write_parts(spark, tmp_path, rows)
    got = {r.partkey for r in parts_price_size_skyline(spark, sf).collect()}
    assert got == expected == {3, 4, 6, 7}


def test_lateness_profile_hand_computed(spark, tmp_path):
    """Crafted arrival sequence (by event_id) with one out-of-order
    event: lateness = running max(event seconds) - event seconds."""
    import datetime as dt

    from hrfco_data_pipeline_spark.plans.relational import events_lateness_profile
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    # arrival order: 10:00:00, 10:00:30, 10:00:10 (20s late),
    # 10:00:30 (0s late, ties the max), 10:01:00
    stamps = [
        "2024-01-01T10:00:00",
        "2024-01-01T10:00:30",
        "2024-01-01T10:00:10",
        "2024-01-01T10:00:30",
        "2024-01-01T10:01:00",
    ]
    rows = [
        (i, dt.datetime.fromisoformat(s), None, "a", None, None)
        for i, s in enumerate(stamps)
    ]
    out = str(tmp_path / "ev_tbl")
    spark.createDataFrame(rows, schema).write.parquet(f"{out}/events.parquet")

    secs = [
        int(dt.datetime.fromisoformat(s).timestamp())
        - int(dt.datetime(1970, 1, 1).timestamp())
        for s in stamps
    ]
    run, late = -(10**18), []
    for s in secs:
        run = max(run, s)
        late.append(run - s)

    r = events_lateness_profile(spark, out).collect()[0]
    assert r.n_events == 5
    assert r.n_late == sum(1 for x in late if x > 0) == 1
    assert r.max_lateness_sec == max(late) == 20
    assert r.avg_lateness_sec == round(sum(late) / len(late), 4)
    assert r.late_pct == round(1 / 5, 4)
