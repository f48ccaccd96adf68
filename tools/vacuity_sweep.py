#!/usr/bin/env python
"""Gate-SF vacuity sweep (VERDICT r13 "Next round" #5).

A driver window row that matches its oracle with ZERO rows certifies
only the empty result — weak evidence (`customers_without_urgent_orders`,
né `customers_without_orders`, at
sf0.01 was the observed case). This sweep runs every ORACLE (DuckDB
side only — the oracle IS the expected result, so the Spark engine
need not start) at the given SF and lists the queries whose certified
result would be empty, so rotation planning can prefer non-vacuous
evidence and the ledger can carry the annotation.

    python tools/vacuity_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from hrfco_data_pipeline_spark.sources.tables import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    names = list(entry.queries())
    oracles = entry.oracle_sql()
    vacuous: list[str] = []
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue  # rows-only: no oracle to certify against
        n = con.execute(
            f"SELECT count(*) FROM ({sql}) t"  # noqa: S608
        ).fetchone()[0]
        if n == 0:
            vacuous.append(name)
            print(f"VACUOUS  {name}  (0 oracle rows at {sf_dir})")
    print(
        f"swept {len(oracles)} oracle-backed queries at {sf_dir}: "
        f"{len(vacuous)} vacuous"
    )
    # non-zero on any hit so tools/round_start.py fails LOUD at round
    # open (VERDICT r14 'Next round' #8)
    return 1 if vacuous else 0


if __name__ == "__main__":
    raise SystemExit(main())
