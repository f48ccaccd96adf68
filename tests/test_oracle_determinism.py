"""Oracle-side determinism pins (found r9).

DuckDB's vectorized ``list_reduce`` returns NONDETERMINISTIC results
for accumulator-BRANCHING lambdas (``CASE WHEN acc = ...``) at sf0.1
row counts: the sessions_ordered_funnel oracle flipped ~1 session in
95k between identical runs (three distinct outputs over 12 runs;
``MATERIALIZED`` did not stabilize it). Plain ``acc + x`` folds —
used by dozens of certified oracles — have never flipped. The funnel
oracle now computes its stage relationally (greedy-earliest match
indices); these pins keep the bug class out:

1. the funnel oracle must produce ONE distinct output across repeated
   runs at the row count that exposed the flake;
2. no oracle may contain an accumulator-branching list_reduce lambda.
"""

from __future__ import annotations

import re

import duckdb

import __spark_entry__ as entry


def test_funnel_oracle_is_run_deterministic():
    sql = entry.oracle_sql()["sessions_ordered_funnel"]
    outs = set()
    for _ in range(5):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.1/events.parquet')"
        )
        outs.add(tuple(sorted(con.execute(sql).fetchall())))
        con.close()
    assert len(outs) == 1, f"nondeterministic oracle outputs: {outs}"


def test_no_accumulator_branching_folds_in_oracles():
    """``list_reduce`` lambdas that branch on the accumulator (CASE
    WHEN acc ...) are the shape DuckDB vectorizes incorrectly; index-
    or element-branching and plain additive folds are fine."""
    offenders = []
    for name, sql in entry.oracle_sql().items():
        for m in re.finditer(r"list_reduce\(", sql):
            tail = sql[m.start() : m.start() + 2000]
            lam = tail.split("->", 1)
            if len(lam) < 2:
                continue
            if re.search(r"CASE\s+WHEN\s+acc\b", lam[1]):
                offenders.append(name)
                break
    assert not offenders, (
        "accumulator-branching list_reduce folds (the DuckDB "
        f"nondeterminism class) in oracles: {offenders}"
    )
