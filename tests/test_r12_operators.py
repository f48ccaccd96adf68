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
