"""ranked_cumsum / int_ntile vs the global-window ground truth.

The operator must reproduce ``row_number()``, cumulative ``sum()``, and
``ntile(k)`` under the same total order EXACTLY — the whole point is
that it is a drop-in for the single-partition window, so the oracle
twins of the queries that adopt it stay untouched.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hrfco_data_pipeline_spark.operators.ranking import int_ntile, ranked_cumsum


def _base(spark, n=5000):
    # skewed, duplicate-heavy keys: exercises ties inside and around
    # bucket boundaries, plus a value column for the cumsum
    return spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(97)).alias("k"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)) + 1).alias("v"),
    )


@pytest.mark.parametrize("sample_mod", [8, 1 << 20])  # multi-bucket and degenerate
def test_rank_and_cumsum_match_global_window(spark, sample_mod):
    df = _base(spark)
    got = ranked_cumsum(
        df,
        F.col("k").cast("double"),
        [F.asc("k"), F.asc("id")],
        sample_key=F.col("id"),
        sums={"cum_v": F.col("v")},
        rank_name="rn",
        sample_mod=sample_mod,
    )
    w = Window.orderBy(F.asc("k"), F.asc("id"))
    want = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_v"),
    )
    j = got.select("id", "rn", "cum_v").alias("g").join(
        want.alias("w"), "id"
    )
    bad = j.filter(
        (F.col("g.rn") != F.col("w.rn")) | (F.col("g.cum_v") != F.col("w.cum_v"))
    )
    assert bad.count() == 0
    assert got.count() == df.count()


def test_descending_order_via_negated_bucket_key(spark):
    df = _base(spark, 3000)
    got = ranked_cumsum(
        df,
        -F.col("v").cast("double"),
        [F.desc("v"), F.asc("id")],
        sample_key=F.col("id"),
        rank_name="rn",
        sample_mod=4,
    )
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = df.select("id", F.row_number().over(w).alias("rn"))
    bad = (
        got.select("id", "rn")
        .alias("g")
        .join(want.alias("w"), "id")
        .filter(F.col("g.rn") != F.col("w.rn"))
    )
    assert bad.count() == 0


@pytest.mark.parametrize("sample_mod", [8, 1 << 20])
def test_partitioned_rank_and_cumsum_match_partitioned_window(
    spark, sample_mod
):
    """partition_cols mode (the KS/MW wiring): rank and cumsum restart
    per partition and must equal the plain PARTITION BY window exactly,
    boundaries shared across partitions or degenerate."""
    df = _base(spark).withColumn(
        "p", F.pmod(F.xxhash64("id", F.lit(13)), F.lit(5)).cast("string")
    )
    got = ranked_cumsum(
        df,
        F.col("k").cast("double"),
        [F.asc("k"), F.asc("id")],
        sample_key=F.col("id"),
        sums={"cum_v": F.col("v")},
        rank_name="rn",
        sample_mod=sample_mod,
        partition_cols=["p"],
    )
    w = Window.partitionBy("p").orderBy(F.asc("k"), F.asc("id"))
    want = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_v"),
    )
    j = got.select("id", "rn", "cum_v").alias("g").join(
        want.alias("w"), "id"
    )
    bad = j.filter(
        (F.col("g.rn") != F.col("w.rn")) | (F.col("g.cum_v") != F.col("w.cum_v"))
    )
    assert bad.count() == 0
    assert got.count() == df.count()


@pytest.mark.parametrize("k,n", [(10, 5000), (4, 4001), (7, 6), (3, 3)])
def test_int_ntile_matches_sql_ntile(spark, k, n):
    df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
    got = df.select(
        "rn", int_ntile(F.col("rn"), F.lit(n).cast("long"), k).alias("t")
    )
    want = df.select(
        "rn", F.ntile(k).over(Window.orderBy("rn")).alias("t")
    )
    bad = got.alias("g").join(want.alias("w"), "rn").filter(
        F.col("g.t") != F.col("w.t")
    )
    assert bad.count() == 0


def test_plan_has_no_single_partition_sort_over_input(spark):
    """The windowed branch must sort per-bucket (hashpartitioning on
    the bucket id), never via Exchange SinglePartition over the input;
    the only single-partition work allowed is the <= n_buckets offset
    table."""
    df = _base(spark, 2000)
    got = ranked_cumsum(
        df,
        F.col("k").cast("double"),
        [F.asc("k"), F.asc("id")],
        sample_key=F.col("id"),
        sums={"cum_v": F.col("v")},
        sample_mod=4,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_pid" in plan


def test_sample_cap_engages_and_ranks_stay_exact(spark):
    """With sample_cap far below the first-level sample size the
    second-level hash cut must engage (boundary sample ~cap rows) and
    — because the construction is boundary-invariant — the global
    ranks must still match the single-window ground truth exactly."""
    df = _base(spark, 4000)
    got = ranked_cumsum(
        df,
        F.col("k").cast("double"),
        [F.asc("k"), F.asc("id")],
        sample_key=F.col("id"),
        sums={"cum_v": F.col("v")},
        rank_name="rn",
        sample_mod=1,  # first-level sample = whole input
        sample_cap=50,  # forces a ~1-in-80 second-level cut
    )
    w = Window.orderBy(F.asc("k"), F.asc("id"))
    want = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_v"),
    )
    j = got.select("id", "rn", "cum_v").alias("g").join(want.alias("w"), "id")
    bad = j.filter(
        (F.col("g.rn") != F.col("w.rn")) | (F.col("g.cum_v") != F.col("w.cum_v"))
    )
    assert bad.count() == 0
    # the operator actually bucketed (cap did not collapse to 1 bucket)
    assert got.count() == 4000
    # ...and the second-level cut actually ENGAGED: rank exactness is
    # boundary-invariant by design, so the assertions above would pass
    # even with the cut broken and all 4000 rows collected. Recompute
    # the operator's own two-level thinning (same hash, same seed,
    # same ceil) and pin that the boundary sample this input produces
    # is ~cap rows, far below the first-level sample.
    mod2 = df.agg(
        F.greatest(
            F.lit(1).cast("long"), F.ceil(F.count("*") / F.lit(50)).cast("long")
        ).alias("m")
    ).collect()[0].m
    assert mod2 == 80  # ceil(4000 / sample_cap=50): the cut is active
    n_sampled = df.filter(
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(mod2)) == 0
    ).count()
    assert 0 < n_sampled < 200, n_sampled  # ~50 expected, never ~4000


def test_null_bucket_key_raises(spark):
    """A NULL bucket_key would silently land in bucket 0 and corrupt
    any descending-order ranking (Spark sorts NULLs last under desc)
    — the contract is enforced with a plan-level raise."""
    df = spark.range(100).select(
        F.when(F.col("id") == 57, None).otherwise(F.col("id")).alias("k"),
        F.col("id"),
    )
    got = ranked_cumsum(
        df,
        F.col("k").cast("double"),
        [F.asc("k"), F.asc("id")],
        sample_key=F.col("id"),
    )
    with pytest.raises(Exception, match="bucket_key must be non-null"):
        got.count()


@pytest.mark.parametrize("sample_mod", [8, 1 << 20])
def test_cummax_matches_partitioned_window(spark, sample_mod):
    """maxes= mode (the events_running_records wiring): the two-pass
    cumulative MAX must equal MAX OVER (PARTITION BY p ORDER BY ...
    UNBOUNDED PRECEDING..CURRENT ROW) exactly — including negative
    values (greatest() offset combine must not treat the partition
    start as 0)."""
    df = _base(spark).withColumn(
        "p", F.pmod(F.xxhash64("id", F.lit(13)), F.lit(4)).cast("string")
    ).withColumn("sv", F.col("v") - 500)  # mixed-sign values
    got = ranked_cumsum(
        df,
        F.col("k").cast("double"),
        [F.asc("k"), F.asc("id")],
        sample_key=F.col("id"),
        rank_name="rn",
        sample_mod=sample_mod,
        partition_cols=["p"],
        maxes={"run_max": F.col("sv")},
    )
    w = Window.partitionBy("p").orderBy(F.asc("k"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.select("id", F.max("sv").over(w).alias("run_max"))
    bad = (
        got.select("id", "run_max")
        .alias("g")
        .join(want.alias("w"), "id")
        .filter(F.col("g.run_max") != F.col("w.run_max"))
    )
    assert bad.count() == 0


def test_cummax_global_mode(spark):
    """maxes= without partition_cols: plain global running max."""
    df = _base(spark, 2000)
    got = ranked_cumsum(
        df,
        F.col("k").cast("double"),
        [F.asc("k"), F.asc("id")],
        sample_key=F.col("id"),
        rank_name="rn",
        sample_mod=4,
        maxes={"m": F.col("v")},
    )
    w = Window.orderBy(F.asc("k"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.select("id", F.max("v").over(w).alias("m"))
    bad = (
        got.select("id", "m")
        .alias("g")
        .join(want.alias("w"), "id")
        .filter(F.col("g.m") != F.col("w.m"))
    )
    assert bad.count() == 0
