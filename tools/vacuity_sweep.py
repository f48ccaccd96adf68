#!/usr/bin/env python
"""Gate-SF vacuity + oracle-latency sweep (VERDICT r13 "Next round"
#5; latency guard added r15).

A driver window row that matches its oracle with ZERO rows certifies
only the empty result — weak evidence (`customers_without_urgent_orders`,
né `customers_without_orders`, at
sf0.01 was the observed case). This sweep runs every ORACLE (DuckDB
side only — the oracle IS the expected result, so the Spark engine
need not start) at the given SF and lists the queries whose certified
result would be empty, so rotation planning can prefer non-vacuous
evidence and the ledger can carry the annotation.

It also TIMES each oracle and fails loud on any that exceeds the slow
threshold (default 60 s): DuckDB inlines multiply-referenced CTEs and
can re-plan them pathologically — the r15 Apriori oracle ran >10 min
at sf0.1 inlined vs 0.9 s with `AS MATERIALIZED` (SCALE.md §r15). The
driver runs every window oracle at sf0.01, so a pathological oracle
is a gate-budget hazard, not just a local annoyance; this guard makes
the AS-MATERIALIZED checklist rule machine-checked at the SF that
matters. The 5 slowest are always printed for drift-watching.

    python tools/vacuity_sweep.py [sf_dir] [--slow-threshold SECONDS]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from hrfco_data_pipeline_spark.sources.tables import TABLES

    args = sys.argv[1:]
    slow_threshold = 60.0
    if "--slow-threshold" in args:
        i = args.index("--slow-threshold")
        slow_threshold = float(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    names = list(entry.queries())
    oracles = entry.oracle_sql()
    vacuous: list[str] = []
    slow: list[str] = []
    timings: list[tuple[float, str]] = []
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue  # rows-only: no oracle to certify against
        t0 = time.monotonic()
        n = con.execute(
            f"SELECT count(*) FROM ({sql}) t"  # noqa: S608
        ).fetchone()[0]
        dt = time.monotonic() - t0
        timings.append((dt, name))
        if n == 0:
            vacuous.append(name)
            print(f"VACUOUS  {name}  (0 oracle rows at {sf_dir})")
        if dt > slow_threshold:
            slow.append(name)
            print(
                f"SLOW     {name}  ({dt:.1f} s > {slow_threshold:.0f} s "
                f"at {sf_dir} — multiply-referenced CTE without "
                f"AS MATERIALIZED? See SCALE.md §r15)"
            )
    for dt, name in sorted(timings, reverse=True)[:5]:
        print(f"  slowest: {name:40s} {dt:6.2f} s")
    print(
        f"swept {len(oracles)} oracle-backed queries at {sf_dir}: "
        f"{len(vacuous)} vacuous, {len(slow)} slow"
    )
    # non-zero on any hit so tools/round_start.py fails LOUD at round
    # open (VERDICT r14 'Next round' #8)
    return 1 if (vacuous or slow) else 0


if __name__ == "__main__":
    raise SystemExit(main())
