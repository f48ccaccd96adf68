"""Regression tests for the four ADVICE r13 fixes.

1. gk_within_tolerance: the low side of the GK rank-tolerance
   predicate must be STRICT (rank_lt < target+tol) so an element
   whose lowest attainable rank is one past tolerance fails.
2. redelivery_copies: NULL keys must still yield copies=1 — a NULL
   copies makes explode(sequence(...)) silently drop the row.
3. generate_duplication_flags: a generator argument longer than the
   paren-scan cap must surface an explicit audit flag, not be
   silently skipped.
4. parity_workdir: the stale sweep must not rmtree a >6h-old workdir
   whose owning process is still alive.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")


# ---------------------------------------------------------------- 1

def test_gk_tolerance_low_side_is_strict(spark):
    """rank_lt == target+tol means the lowest attainable rank is
    target+tol+1 (outside tolerance) -> False; one below -> True."""
    from hrfco_data_pipeline_spark.plans.relational import (
        gk_within_tolerance,
    )

    rows = [
        # (rank_lt, rank_le, target, tol, expected)
        (12, 20, 10, 2, False),  # lowest rank 13 > 12 = target+tol
        (11, 20, 10, 2, True),   # lowest rank 12 == target+tol
        (0, 7, 10, 2, False),    # rank_le 7 < 8 = target-tol
        (0, 8, 10, 2, True),     # rank_le 8 == target-tol
    ]
    df = spark.createDataFrame(
        rows, "rank_lt long, rank_le long, target long, tol long, exp boolean"
    ).withColumn(
        "got",
        gk_within_tolerance(
            F.col("rank_lt"), F.col("rank_le"), F.col("target"), F.col("tol")
        ),
    )
    bad = df.filter(F.col("got") != F.col("exp")).collect()
    assert not bad, bad


# ---------------------------------------------------------------- 2

def test_redelivery_copies_null_key_keeps_row(spark):
    from hrfco_data_pipeline_spark.plans.wire import redelivery_copies

    df = spark.createDataFrame(
        [(0,), (5,), (None,)], "k long"
    ).withColumn(
        "copy_no",
        F.explode(F.sequence(F.lit(1), redelivery_copies(F.col("k")))),
    )
    got = {
        (r["k"], r["copy_no"]) for r in df.collect()
    }
    # key 0 fans out to 2 copies, key 5 to 1, NULL key to exactly 1
    assert got == {(0, 1), (0, 2), (5, 1), (None, 1)}


# ---------------------------------------------------------------- 3

def test_audit_flags_generator_arg_past_scan_cap():
    from tools.audit_antipatterns import generate_duplication_flags

    # closing paren sits beyond the 200k scan cap — previously the
    # node was silently skipped (arg empty), hiding the very largest
    # instances of the size(gen)+explode(gen) pathology
    huge = "Generate explode(concat(" + "x#1, " * 50_000 + "x#2))"
    assert len(huge) > 200_000
    flags = generate_duplication_flags(huge)
    assert any(f.startswith("generator-arg-too-large-to-audit") for f in flags), flags


def test_audit_cap_flag_absent_on_normal_plan():
    from tools.audit_antipatterns import generate_duplication_flags

    flags = generate_duplication_flags("Generate explode(fps#123)")
    assert not flags


# ---------------------------------------------------------------- 4

def test_parity_workdir_sweep_spares_live_owner(tmp_path):
    from hrfco_data_pipeline_spark.streaming.curation import parity_workdir

    import tempfile

    prefix = "hrfco_test_sweep_r14_"
    root = tempfile.gettempdir()

    # a "concurrent session" workdir owned by THIS (live) process,
    # aged past the 6h cutoff
    live = tempfile.mkdtemp(prefix=prefix)
    with open(os.path.join(live, ".owner_pid"), "w") as fh:
        fh.write(str(os.getpid()))
    # a crashed session's workdir: dead (impossible) pid, same age
    dead = tempfile.mkdtemp(prefix=prefix)
    with open(os.path.join(dead, ".owner_pid"), "w") as fh:
        fh.write("999999999")
    # a legacy dir without a sentinel: age alone decides
    legacy = tempfile.mkdtemp(prefix=prefix)

    old = time.time() - 7 * 3600
    for d in (live, dead, legacy):
        os.utime(d, (old, old))

    fresh = parity_workdir(prefix)
    try:
        assert os.path.isdir(live), "live owner's workdir was swept"
        assert not os.path.isdir(dead), "dead owner's workdir survived"
        assert not os.path.isdir(legacy), "legacy stale dir survived"
        assert os.path.isfile(os.path.join(fresh, ".owner_pid"))
    finally:
        for d in (live, fresh):
            import shutil

            shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------- 5
# VERDICT r13 item 7: the 2^53 integer->double rule in the automated
# audit (SCALE.md r13/r14 - DuckDB HUGEINT->DOUBLE is not correctly
# rounded past 2^53).

SHARE_DRIFT_FIRST_DRAFT = """
SELECT brand,
  CAST(sum(abs(c1 * N2 - c2 * N1)) AS DOUBLE)
    / (2.0 * CAST(N1 AS DOUBLE) * CAST(N2 AS DOUBLE)) AS tv
FROM halves GROUP BY 1
"""


def test_audit_flags_share_drift_first_draft():
    """The reverted r13 supplier_share_drift form (integer-product TV
    numerator past 2^53) must flag."""
    from tools.audit_antipatterns import int_double_overflow_flags

    flags = int_double_overflow_flags(SHARE_DRIFT_FIRST_DRAFT)
    assert any(f.startswith("int-to-double-unbounded-product") for f in flags)


def test_audit_marker_suppresses():
    from tools.audit_antipatterns import int_double_overflow_flags

    marked = SHARE_DRIFT_FIRST_DRAFT.replace(
        "AS DOUBLE)", "/* int<2^53 */ AS DOUBLE)", 1
    )
    assert not int_double_overflow_flags(marked)


def test_audit_exempts_hi_lo_split_and_decimal():
    from tools.audit_antipatterns import int_double_overflow_flags

    hi_lo = """
    SELECT CAST((a * b - c) // 1099511627776 AS DOUBLE) * 1099511627776.0
         + CAST((a * b - c) % 1099511627776 AS DOUBLE) AS v FROM t
    """
    assert not int_double_overflow_flags(hi_lo)
    decimal_path = """
    SELECT CAST(sum(TRY_CAST(printf('%.2f', x * y) AS DECIMAL(12,2)))
                AS DOUBLE) AS v FROM t
    """
    assert not int_double_overflow_flags(decimal_path)


def test_audit_ignores_literal_products_and_count_star():
    from tools.audit_antipatterns import int_double_overflow_flags

    assert not int_double_overflow_flags(
        "SELECT CAST(2 * 100 AS DOUBLE) AS v FROM t"
    )
    assert not int_double_overflow_flags(
        "SELECT CAST(count(*) AS DOUBLE) AS v FROM t"
    )


def test_registry_oracles_pass_int_double_rule():
    """Every registered oracle either stays under 2^53 with a
    documented marker, uses the decimal path, or converts via the
    hi/lo split - the registry-wide sweep must be clean."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    from tools.audit_antipatterns import int_double_overflow_flags

    bad = {
        name: flags
        for name, sql in entry.oracle_sql().items()
        if (flags := int_double_overflow_flags(sql))
    }
    assert not bad, bad
