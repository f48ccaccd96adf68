"""Round-17 optimization pins: bounded-metadata contract guards and the
exprcache context-token fix (r16 verdict items 7 and 8)."""

import pytest
from pyspark.sql import functions as F


def test_ks_from_counts_unbounded_type_domain_rejected(spark):
    """ks_from_counts generates one array slot + cumsum column per
    event type — an unbounded type domain must fail loudly (contract
    assert), not melt the plan/driver."""
    from hrfco_data_pipeline_spark.plans.relational import ks_from_counts

    wide = spark.range(1001).select(
        F.concat(F.lit("t"), F.col("id")).alias("event_type"),
        F.lit(1).alias("value"),
        F.lit(1).alias("c_t"),
    )
    with pytest.raises(ValueError, match="distinct event types"):
        ks_from_counts(wide)


def test_ks_from_counts_bounded_domain_still_works(spark):
    from hrfco_data_pipeline_spark.plans.relational import ks_from_counts

    rows = spark.createDataFrame(
        [("a", 1, 2), ("a", 2, 1), ("b", 1, 1), ("b", 3, 2)],
        "event_type string, value int, c_t long",
    )
    got = {r.event_type: r for r in ks_from_counts(rows).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"].n_t == 3 and got["a"].n_rest == 3


def test_pagerank_unbounded_graph_rejected(spark, monkeypatch, tmp_path):
    """The driver fold's collects are sanctioned by the schema-bounded
    nation-dimension contract; a graph past the bound must raise and
    point at materialize=False."""
    import hrfco_data_pipeline_spark.plans.relational as rel

    n = 1200
    fake_tables = {
        "nation": spark.range(n).select(
            F.col("id").alias("n_nationkey"),
            F.concat(F.lit("N"), F.col("id")).alias("n_name"),
        )
    }

    real_load = rel.load_table

    def fake_load(sp, sf_dir, name):
        if name == "nation":
            return fake_tables["nation"]
        return real_load(sp, sf_dir, name)

    monkeypatch.setattr(rel, "load_table", fake_load)
    with pytest.raises(ValueError, match="materialize=False"):
        rel.nation_trade_pagerank(spark, "/root/testdata/sf0.001")


def test_exprcache_token_not_id_based(spark):
    """The cache key token lives on the SparkContext instance, so a
    recycled id() can never alias a dead context's entries, and two
    calls on the live context share one token."""
    from hrfco_data_pipeline_spark.functions import exprcache

    sc = spark.sparkContext
    t1 = exprcache._context_token(sc)
    t2 = exprcache._context_token(sc)
    assert t1 == t2
    assert sc.__dict__.get("_exprcache_token") == t1

    class FakeCtx:
        pass

    other = FakeCtx()
    t3 = exprcache._context_token(other)
    assert t3 != t1  # a different context object never shares a token

    built = []
    exprcache._CACHE.pop((t1, "r17-test-key"), None)
    exprcache.cached_exprs("r17-test-key", lambda: built.append(1) or F.lit(1))
    exprcache.cached_exprs("r17-test-key", lambda: built.append(1) or F.lit(1))
    assert built == [1]  # second call served from cache


def test_connected_components_distinct_pairs_same_labels(spark):
    """distinct_pairs=True skips the edge-dedup exchange; the labeling
    is identical because min-propagation is duplicate-insensitive —
    pinned on a graph with duplicate AND reversed pair rows (the
    adversarial input the flag is NOT meant for) vs the same graph
    deduped (the in-repo generators' contract)."""
    from hrfco_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    dup_pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (5, 6), (5, 6)],
        "id_a long, id_b long",
    )
    uniq_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    expect = {(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)}
    for df, flag in [
        (uniq_pairs, True),
        (uniq_pairs, False),
        (dup_pairs, True),  # duplicates tolerated, labels unchanged
        (dup_pairs, False),
    ]:
        got = {
            (r.id, r.component)
            for r in connected_components(
                df, distinct_pairs=flag
            ).collect()
        }
        assert got == expect, (flag, got)


def test_classify_bounds_key_type_canonical(spark):
    """int and float bounds that are numerically equal must share one
    type-canonical cached tree (ADVICE r16)."""
    from hrfco_data_pipeline_spark.operators.classify import classify

    df = spark.createDataFrame(
        [(1.0, 2.0, True, 1.0, 2.0, 3.0, 4.0)],
        "water_level double, flow_rate double, station_found boolean, "
        "attwl double, wrnwl double, almwl double, srswl double",
    )
    a = classify(df, min_wl=0, max_wl=50, min_fw=0, max_fw=100)
    b = classify(df, min_wl=0.0, max_wl=50.0, min_fw=0.0, max_fw=100.0)
    assert a.schema == b.schema
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
