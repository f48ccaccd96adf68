#!/usr/bin/env python
"""Split one query's wall-clock into plan-construction vs execution.

For OPTIMIZATION rounds: with the bench testdata being small, per-query
seconds are dominated by fixed costs. This tool attributes them:

  t_build   — Python-side DataFrame construction (py4j expression
              chatter; paid on EVERY run, cold and warm)
  t_exec1   — first noop write (includes analysis, optimization,
              codegen compile, and execution)
  t_exec2.. — repeat noop writes (steady state)
  jobs/stages — how many Spark jobs and stages one execution schedules
              (scheduling overhead is per-stage; iterative/eager
              queries show up here)

Usage: python tools/profile_query.py QUERY [QUERY ...] [--sf SF_DIR]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if not args:
        print("usage: python tools/profile_query.py QUERY [...] [--sf DIR]")
        return 2

    import __spark_entry__ as entry_mod
    from hrfco_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = entry_mod.queries()
    tracker = spark.sparkContext.statusTracker()

    for name in args:
        fn = queries[name]
        rec: dict = {"query": name}

        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        rec["t_build"] = round(time.perf_counter() - t0, 3)

        jobs_before = set(tracker.getJobIdsForGroup() or [])

        def run() -> float:
            t = time.perf_counter()
            df2 = fn(spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t
            spark.catalog.clearCache()
            return round(dt, 3)

        rec["t_run1"] = run()
        rec["t_run2"] = run()
        rec["t_run3"] = run()
        jobs_after = set(tracker.getJobIdsForGroup() or [])
        new_jobs = sorted(jobs_after - jobs_before)
        # jobs for the 3 runs + build; report per-run third
        n_stages = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is not None:
                n_stages += len(ji.stageIds)
        rec["jobs_3runs"] = len(new_jobs)
        rec["stages_3runs"] = n_stages
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
