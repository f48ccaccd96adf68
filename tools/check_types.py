#!/usr/bin/env python
"""Type-parity probe: compares Spark result dtypes with the DuckDB oracle's
arrow types column-by-column. The driver's value hash is type-sensitive
(DuckDB HUGEINT vs Spark BIGINT diverges on equal values — VERDICT.md
round 1, "What's wrong" #1), so every oracle column should land on the
same physical type as the Spark result.

Usage: python tools/check_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

# Spark simpleString -> acceptable arrow type prefixes from DuckDB
EQUIV = {
    "bigint": {"int64"},
    "int": {"int32"},
    "double": {"double"},
    "float": {"float"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
    "date": {"date32"},
    "binary": {"binary", "large_binary"},
}


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from hrfco_data_pipeline_spark.session import get_spark
    from hrfco_data_pipeline_spark.sources.tables import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="check-types")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        sdf = fn(spark, sf_dir)
        stypes = dict(sdf.dtypes)
        atable = con.execute(oracles[name]).arrow()
        mismatches = []
        for field in atable.schema:
            stype = stypes.get(field.name)
            if stype is None:
                continue  # name mismatch is caught by check_oracle
            atype = str(field.type)
            ok_prefixes = EQUIV.get(stype)
            if ok_prefixes is None:
                continue  # timestamps/decimals/arrays: value check covers them
            if not any(atype.startswith(p) for p in ok_prefixes):
                mismatches.append(f"{field.name}: spark={stype} duck={atype}")
        if mismatches:
            bad.append(name)
            print(f"{name:35s} TYPE-MISMATCH  " + "; ".join(mismatches))
        else:
            print(f"{name:35s} types ok")

    print()
    if bad:
        print(f"TYPE FAILURES: {bad}")
        return 1
    print("all oracle types line up with Spark")
    return 0


if __name__ == "__main__":
    sys.exit(main())
