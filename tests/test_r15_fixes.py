"""Regression tests for the four ADVICE r14 fixes (applied at r15
open): the customers_without_urgent_orders rename, the k-anon ladder's
non-nested L1→L2 rung, the audit's floordiv exemption bound, and the
snapshot-fixture oracle moduli single-sourcing."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def test_customers_without_urgent_orders_rename():
    """ADVICE r14 #1: the r14 semantic strengthening (anti join against
    the URGENT slice) kept the pre-r14 key; the registry key must now
    state the semantics, and the old key must be gone from BOTH the
    registry and the oracles."""
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    assert "customers_without_urgent_orders" in q
    assert "customers_without_urgent_orders" in o
    assert "customers_without_orders" not in q
    assert "customers_without_orders" not in o
    assert "1-URGENT" in o["customers_without_urgent_orders"]


def test_kanon_week_straddling_month_counterexample(spark, tmp_path):
    """ADVICE r14 #2: month is NOT a function of ISO week — one week of
    same-band events straddling a month boundary forms ONE L1 group but
    TWO L2 groups, so L1→L2 n_groups monotonicity is data-dependent.
    This pins the counter-example that restricts the property test to
    the genuinely nested rungs (L0→L1, L0→L2, L2→L3)."""
    from datetime import datetime

    from hrfco_data_pipeline_spark.plans.relational import (
        events_kanon_generalization_ladder,
    )

    # ISO week 2024-01-29 .. 2024-02-04 straddles Jan/Feb; all values
    # in one 50-band (and one 100-band) so the band key is constant.
    rows = [
        (i, datetime(2024, 1, 29 + i) if i < 3 else datetime(2024, 2, i - 2),
         1, "t0", 10.0, "{}")
        for i in range(6)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    out = str(tmp_path / "ev")
    ev.write.parquet(f"{out}/events.parquet")
    lv = {
        r.level: r
        for r in events_kanon_generalization_ladder(spark, out).collect()
    }
    assert lv[1].n_groups == 1  # one ISO week, one 50-band
    assert lv[2].n_groups == 2  # two months — the week split
    # the nested rungs still hold on this input
    assert lv[0].n_groups >= lv[1].n_groups
    assert lv[0].n_groups >= lv[2].n_groups
    assert lv[2].n_groups >= lv[3].n_groups


def test_audit_floordiv_exemption_requires_large_divisor():
    """ADVICE r14 #3: `CAST(a*b // 2 AS DOUBLE)` leaves the quotient
    unbounded and must flag; only a divisor >= 2^40 (the hi/lo split
    idiom) exempts a trailing floordiv. A trailing `%` by a small
    literal stays exempt (bounded by the literal)."""
    from tools.audit_antipatterns import int_double_overflow_flags

    flagged = "SELECT CAST(a * b // 2 AS DOUBLE) AS v FROM t"
    assert any(
        f.startswith("int-to-double-unbounded-product")
        for f in int_double_overflow_flags(flagged)
    )
    exempt_div = (
        "SELECT CAST(a * b // 1099511627776 AS DOUBLE) AS v FROM t"
    )
    assert not int_double_overflow_flags(exempt_div)
    exempt_mod = "SELECT CAST(a * b % 64 AS DOUBLE) AS v FROM t"
    assert not int_double_overflow_flags(exempt_mod)


def test_snapshot_oracles_interpolate_moduli_by_construction():
    """ADVICE r14 #4: the three prev-snapshot oracles must be built
    from oracles.SNAPSHOT_GAP_MOD / SNAPSHOT_REV_MOD via f-strings —
    the SOURCE must carry the placeholder, not the literal — so a
    constant change cannot desynchronize the twins even if the
    string-matching pin test is edited."""
    import inspect
    import re

    import hrfco_data_pipeline_spark.oracles as oracles

    src = inspect.getsource(oracles)
    for key in (
        "docs_snapshot_diff",
        "docs_crosssnap_containment",
        "docs_crosssnap_dup_trend",
    ):
        m = re.search(
            r'LLM_ORACLES\["' + key + r'"\]\s*=\s*r?f?"""(.*?)"""',
            src,
            re.DOTALL,
        )
        assert m, key
        body = m.group(1)
        assert "{SNAPSHOT_GAP_MOD}" in body, key
        assert "{SNAPSHOT_REV_MOD}" in body, key
        assert not re.search(r"%\s*97\b", body), key
        assert not re.search(r"%\s*89\b", body), key
        # and the rendered SQL carries the current constant values
        rendered = oracles.LLM_ORACLES[key]
        assert f"% {oracles.SNAPSHOT_GAP_MOD}" in rendered, key
        assert f"% {oracles.SNAPSHOT_REV_MOD}" in rendered, key


def test_vacuity_sweep_exits_nonzero_on_hit(monkeypatch):
    """VERDICT r14 #8: round_start folds the vacuity sweep in and
    relies on a non-zero exit for a loud failure — pin that a vacuous
    oracle flips the return code and a clean registry returns 0."""
    import __spark_entry__ as entry
    from tools import vacuity_sweep

    real_q = entry.queries()
    one = next(iter(entry.oracle_sql()))
    monkeypatch.setattr(sys, "argv", ["vacuity_sweep.py"])
    monkeypatch.setattr(
        entry, "queries", lambda: {one: real_q[one]}
    )
    monkeypatch.setattr(
        entry,
        "oracle_sql",
        lambda: {one: "SELECT 1 AS x WHERE 1 = 0"},
    )
    assert vacuity_sweep.main() == 1
    monkeypatch.setattr(
        entry, "oracle_sql", lambda: {one: "SELECT 1 AS x"}
    )
    assert vacuity_sweep.main() == 0


def test_vacuity_sweep_flags_slow_oracles(monkeypatch):
    """The r15 latency guard (SCALE.md §r15 CTE-inlining finding):
    an oracle slower than --slow-threshold flips the exit code, so
    round_start fails loud on a pathological oracle plan before the
    driver meets it. Pinned with threshold 0 (any real execution
    exceeds it) and a generous threshold (clean registry returns 0)."""
    import __spark_entry__ as entry
    from tools import vacuity_sweep

    real_q = entry.queries()
    one = next(iter(entry.oracle_sql()))
    monkeypatch.setattr(entry, "queries", lambda: {one: real_q[one]})
    monkeypatch.setattr(
        entry, "oracle_sql", lambda: {one: "SELECT 1 AS x"}
    )
    monkeypatch.setattr(
        sys, "argv", ["vacuity_sweep.py", "--slow-threshold", "0"]
    )
    assert vacuity_sweep.main() == 1
    monkeypatch.setattr(
        sys, "argv", ["vacuity_sweep.py", "--slow-threshold", "600"]
    )
    assert vacuity_sweep.main() == 0
