"""Command-line entry point: run, list, or explain any registry query.

    python -m hrfco_data_pipeline_spark list [substr]
    python -m hrfco_data_pipeline_spark run <query> [--sf-dir DIR]
        [--limit N] [--json]
    python -m hrfco_data_pipeline_spark explain <query> [--sf-dir DIR]

A user of the reference pipeline gets the same surface as a runnable
CLI: `run` executes a query against the parquet tables in --sf-dir and
prints the result (tabular or JSON lines), `explain` prints the
formatted physical plan Catalyst chose.
"""

from __future__ import annotations

import argparse
import json
import sys


def _registry():
    # __spark_entry__ lives at the repo root (one level above this
    # package), so the CLI works from any cwd
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import __spark_entry__ as entry_mod

    return entry_mod.queries(), entry_mod.oracle_sql()


def _spark(app: str):
    from hrfco_data_pipeline_spark.session import get_spark

    s = get_spark(app_name=app)
    s.sparkContext.setLogLevel("ERROR")
    return s


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hrfco_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("substr", nargs="?", default="")
    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sub.choices["run"].add_argument("--limit", type=int, default=20)
    sub.choices["run"].add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    queries, oracles = _registry()
    if args.cmd == "list":
        for name in queries:
            if args.substr in name:
                mark = "" if name in oracles else "  [rows-only]"
                print(f"{name}{mark}")
        return 0

    if args.query not in queries:
        close = [n for n in queries if args.query in n]
        hint = f" (did you mean: {', '.join(close[:5])}?)" if close else ""
        print(f"unknown query {args.query!r}{hint}", file=sys.stderr)
        return 2

    # documented eager exceptions: these run their driver-side loop at
    # plan-build time, so `explain` would execute the full query first
    EAGER = {
        "events_median_bisect",
        "docs_train_linear_gate",
        "embedding_pca_power_iteration",
        "orders_join_strategy_report",
        # routed joins: choose_join_strategy profiles (two bounded
        # 1-row aggregates) at plan-build time since r9
        "orders_salted_revenue",
        "events_segment_enrichment",
    }
    if args.cmd == "explain" and args.query in EAGER:
        print(
            f"note: {args.query} executes a driver-side iterative loop "
            "at call time; building the plan below runs the query "
            "(see docs/QUERIES.md)",
            file=sys.stderr,
        )

    spark = _spark(f"cli-{args.cmd}-{args.query}")
    df = queries[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        print(df._jdf.queryExecution().explainString(mode))
        return 0
    if args.json:
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
