#!/usr/bin/env python
"""Local twin of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` DuckDB twin on the same parquet tables and compares
row count, column names, and the order-insensitive multiset of row
values (exact equality; floats compared by repr after -0.0/NaN
normalization). Usage:

    python tools/check_oracle.py [--window] [sf_dir] [query ...]\n\n``--window`` restricts to the first-50 driver sampling window.
"""

from __future__ import annotations

import math
import sys
from collections import Counter
from decimal import Decimal

sys.path.insert(0, ".")


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # keep -0.0 distinct from 0.0: the driver's value hash
        # distinguishes them (CORRECTNESS_r06 flagged a ±0.0 split
        # this normalization used to mask)
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", repr(v))
    if isinstance(v, Decimal):
        # surface Decimal as its own type: Python's Decimal(5) == 5
        # made this twin blind to the r9 hydro_double_mass driver
        # split (Spark Decimal vs DuckDB decimal-fetched-as-float)
        return ("dec", str(v))
    if isinstance(v, int):
        return ("i", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    return v


def row_key(row, cols_order):
    return tuple(normalize(row[i]) for i in cols_order)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from hrfco_data_pipeline_spark.session import get_spark
    from hrfco_data_pipeline_spark.sources.tables import TABLES

    args = sys.argv[1:]
    window_only = "--window" in args
    args = [a for a in args if a != "--window"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark(app_name="check-oracle")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    if window_only:  # the driver's first-50 sampling window
        queries = dict(list(queries.items())[:50])
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        if name not in oracles:
            print(f"{name:35s} rows={len(srows):8d}  (no oracle — rows-only check)")
            continue
        ddf = con.execute(oracles[name])
        dcols_raw = [d[0] for d in ddf.description]
        drows = ddf.fetchall()
        dcols = sorted(dcols_raw)
        status_parts = []
        if scols != dcols:
            status_parts.append(f"SCHEMA spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            status_parts.append(f"ROWS spark={len(srows)} duck={len(drows)}")
        if not status_parts:
            s_order = [sdf.columns.index(c) for c in scols]
            d_order = [dcols_raw.index(c) for c in dcols]
            s_multiset = Counter(row_key(r, s_order) for r in srows)
            d_multiset = Counter(row_key(r, d_order) for r in drows)
            if s_multiset != d_multiset:
                miss = list((d_multiset - s_multiset).items())[:3]
                extra = list((s_multiset - d_multiset).items())[:3]
                status_parts.append(
                    f"VALUES missing_in_spark={miss} extra_in_spark={extra}"
                )
        if status_parts:
            failures.append(name)
            print(f"{name:35s} FAIL  " + " | ".join(status_parts))
        else:
            print(f"{name:35s} OK    rows={len(srows)}")

    print()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("all queries match the oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main())
