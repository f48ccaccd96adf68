#!/usr/bin/env python
"""Dump the .explain("formatted") of nation_trade_pagerank's in-Spark
shape (materialize=False, iters=1) — the registered query's eager
driver fold leaves a trivial ExistingRDD plan, so the optimization
evidence lives in this subtree (the 5-way join + probability-edge
derivation the fold collects).

Usage: python tools/dump_pagerank_subtree.py OUT_FILE [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> int:
    out = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from hrfco_data_pipeline_spark.plans.relational import (
        nation_trade_pagerank,
    )
    from hrfco_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="dump-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    df = nation_trade_pagerank(spark, sf_dir, iters=1, materialize=False)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(out, "w") as f:
        f.write(plan)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
