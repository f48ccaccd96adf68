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
