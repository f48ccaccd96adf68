"""The same pipeline semantics through spark.sql over registered views."""

from __future__ import annotations

from hrfco_data_pipeline_spark.sql import register_all

SF = "/root/testdata/sf0.001"


def test_sql_views_match_dataframe_api(spark):
    frames = register_all(spark, SF)

    # SQL over the classified view == DataFrame pipeline output
    sql_counts = {
        (r.flood_warning_level, r.is_anomaly): r.n
        for r in spark.sql(
            "SELECT flood_warning_level, is_anomaly, count(*) AS n "
            "FROM classified GROUP BY 1, 2"
        ).collect()
    }
    df_counts = {
        (r.flood_warning_level, r.is_anomaly): r.n
        for r in frames["classified"]
        .groupBy("flood_warning_level", "is_anomaly")
        .agg({"*": "count"})
        .withColumnRenamed("count(1)", "n")
        .collect()
    }
    assert sql_counts == df_counts and len(sql_counts) > 3


def test_sql_join_across_views(spark):
    register_all(spark, SF)
    out = spark.sql(
        """
        SELECT s.obsnm, count(*) AS n_alerts
        FROM alerts a JOIN stations s ON a.observation_code = s.wlobscd
        WHERE a.warning_level = 'CRITICAL'
        GROUP BY s.obsnm
        """
    )
    assert out.count() > 0


def test_approx_stats_bounds(spark):
    from hrfco_data_pipeline_spark.plans.relational import events_approx_stats
    from hrfco_data_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    r = events_approx_stats(spark, SF).collect()[0]
    exact = (
        load_table(spark, SF, "events")
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()[0]
        .u
    )
    # HLL default rsd=5% — allow 3σ
    assert abs(r.approx_users - exact) <= max(3, 0.15 * exact)
    assert r.p50_value < r.p95_value


def test_hll_rollup_merge_accuracy(spark):
    """Merged per-day HLL sketches estimate per-type distincts within
    5% of exact — the mergeability contract the 100 TB rollup rests on."""
    from hrfco_data_pipeline_spark.plans.relational import events_hll_user_rollup

    rows = events_hll_user_rollup(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_days > 1  # merge actually spans partials
        err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert err < 0.05, (r.event_type, r.exact_users, r.approx_users)


def test_value_band_history_intervals(spark):
    """SCD2 islands: per user, intervals are time-ordered and
    non-overlapping, superseded_at chains to the next valid_from, and
    adjacent runs never share a band (else they'd be one island)."""
    from collections import defaultdict

    from hrfco_data_pipeline_spark.plans.relational import (
        events_value_band_history,
    )

    rows = events_value_band_history(spark, "/root/testdata/sf0.001").collect()
    by_user = defaultdict(list)
    for r in rows:
        assert r.valid_from <= r.valid_to
        by_user[r.user_id].append(r)
    for runs in by_user.values():
        runs.sort(key=lambda r: r.valid_from)
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to <= b.valid_from
            assert a.superseded_at == b.valid_from
            assert a.band != b.band
        assert runs[-1].superseded_at is None


def test_line_dedup_rebuild_conservation(spark):
    """Exactly one copy of every distinct segment survives corpus-wide,
    and a doc with no shared segments rebuilds to its own text."""
    import pyspark.sql.functions as F

    from hrfco_data_pipeline_spark.plans.llm import docs_line_dedup_rebuild

    sf = "/root/testdata/sf0.001"
    out = docs_line_dedup_rebuild(spark, sf)
    rows = out.collect()
    assert all(0 <= r.n_kept <= r.n_segments for r in rows)

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    n = F.size("toks")
    segs = F.transform(
        F.sequence(F.lit(1), F.ceil(n / F.lit(10)).cast("int")),
        lambda i: F.concat_ws(" ", F.slice("toks", (i - F.lit(1)) * 10 + 1, F.lit(10))),
    )
    distinct_segs = (
        toks.select(F.explode(segs).alias("seg")).distinct().count()
    )
    assert sum(r.n_kept for r in rows) == distinct_segs


def test_dau_wau_stickiness_bounds(spark):
    from hrfco_data_pipeline_spark.plans.relational import (
        events_dau_wau_stickiness,
    )

    rows = events_dau_wau_stickiness(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau
        assert 0.0 < r.stickiness <= 1.0


def test_ltv_deciles_partition_revenue(spark):
    from hrfco_data_pipeline_spark.plans.relational import customer_ltv_deciles

    rows = customer_ltv_deciles(spark, "/root/testdata/sf0.001").collect()
    assert sorted(r.decile for r in rows) == list(range(1, 11))
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 0.001
    # revenue concentrates at the top: decile 1 >= decile 10
    by = {r.decile: r.revenue for r in rows}
    assert by[1] >= by[10]


def test_seasonal_baseline_delta_consistency(spark):
    from hrfco_data_pipeline_spark.plans.relational import (
        events_seasonal_baseline,
    )

    rows = events_seasonal_baseline(spark, "/root/testdata/sf0.001").collect()
    assert rows
    matched = [r for r in rows if r.n_week_ago is not None]
    assert matched, "no hour had a week-old twin"
    for r in matched:
        assert r.delta == r.n - r.n_week_ago
    for r in rows:
        if r.n_week_ago is None:
            assert r.delta is None and r.ratio is None
