"""Invariant tests for the late-r4 graph / quantile / basket operators.

The exact-value gate is the DuckDB oracle (tools/check_oracle.py);
these pin the structural invariants that survive refactors: session
partitioning of events, histogram-quantile ordering and bounds, lift
symmetry counts, triangle/degree consistency, and PageRank mass
conservation under the integer floor arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hrfco_data_pipeline_spark.plans import relational as R
from hrfco_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_session_windows_partition_events(spark):
    sw = R.events_session_window_agg(spark, SF)
    ev = load_table(spark, SF, "events")
    # sessions partition the event stream: per-session counts sum to
    # the total and no user's sessions overlap
    assert (
        sw.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    )
    rows = sw.orderBy("user_id", "session_start").collect()
    prev = {}
    for r in rows:
        assert r.session_end > r.session_start
        if r.user_id in prev:
            # half-open windows: next session starts at/after prior end
            assert r.session_start >= prev[r.user_id]
        prev[r.user_id] = r.session_end
    total_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert sw.agg(F.sum("n_purchases")).collect()[0][0] == total_purch


def test_histogram_quantiles_ordered_and_bounded(spark):
    rows = R.events_histogram_quantiles(spark, SF).collect()
    assert len(rows) > 0
    ev = load_table(spark, SF, "events")
    exact = {
        r.event_type: r.m
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for r in rows:
        assert r.p50_est <= r.p90_est <= r.p99_est
        # unit-width bins: estimate within 1.0 of the exact quantile
        assert abs(r.p50_est - exact[r.event_type]) <= 1.0


def test_copurchase_lift_counts_consistent(spark):
    rows = R.parts_copurchase_lift(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.part_a < r.part_b
        assert 3 <= r.n_ab <= min(r.n_a, r.n_b)
        assert r.lift > 0


def test_triangles_match_naive_and_degree_bounds(spark):
    rows = R.copurchase_triangles(spark, SF).collect()
    assert len(rows) > 0
    # per-node triangle total is divisible by 3 (each triangle charges
    # exactly its three corners)
    assert sum(r.n_triangles for r in rows) % 3 == 0
    for r in rows:
        assert 0 <= r.clustering <= 1
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2


def test_pagerank_mass_and_floor(spark):
    rows = R.nation_trade_pagerank(spark, SF).collect()
    assert len(rows) == 25
    total = sum(r.rank_e12 for r in rows)
    # teleport floor: every node holds at least (1-d)/N
    assert all(r.rank_e12 >= 6_000_000_000 for r in rows)
    # mass conservation: floor-rounding loses, ppb rounding-up gains —
    # both bounded by edge-count-scale noise on the 1e12 unit total
    assert abs(total - 1.0e12) < 1.0e6


def test_benford_digits_complete_and_consistent(spark):
    rows = R.orders_benford_digits(spark, SF).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 2e-3  # r4 rounding
    assert all(r.chi2_term >= 0 for r in rows)
    # uniform synthetic prices are NOT Benford: digit-1 share far from
    # the 30.1% law value, which is exactly what the screen should flag
    d1 = next(r for r in rows if r.digit == 1)
    assert d1.benford_share == 0.301


def test_ab_test_counts_and_symmetry(spark):
    r = R.events_ab_test(spark, SF).collect()[0]
    assert r.c_a <= r.n_a and r.c_b <= r.n_b
    assert 0 < r.p_a < 1 and 0 < r.p_b < 1
    # hash split on a null-treatment metric: no real effect, |z| small
    assert abs(r.z) < 5


def test_hhi_bounds(spark):
    rows = R.brand_supplier_hhi(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # HHI ranges from 1/n (even split) to 1 (monopoly)
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-9


def test_cusum_peak_dominates(spark):
    rows = R.events_cusum_changepoint(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    types = {r[0] for r in ev.select("event_type").distinct().collect()}
    assert {r.event_type for r in rows} == types
    for r in rows:
        assert r.n_days > 0 and r.mean_daily > 0


def test_session_paths_ranked_and_wellformed(spark):
    rows = R.events_session_paths(spark, SF).collect()
    assert 0 < len(rows) <= 20
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert len(r.path.split(">")) == 3


def test_survival_curve_monotone(spark):
    rows = sorted(
        R.session_survival_curve(spark, SF).collect(),
        key=lambda r: r.t_minutes,
    )
    assert len(rows) > 1
    # S is non-increasing in t; hits exactly 0 only if the final
    # at-risk group all ends uncensored
    survs = [r.survival for r in rows]
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    assert survs[0] <= 1.0 and all(s >= 0 for s in survs)
    # at-risk counts strictly decrease along the life table
    risks = [r.n_at_risk for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:]))
    for r in rows:
        assert 0 <= r.d_ended <= r.n_at_risk


def test_backlog_curve_integrates_to_zero(spark):
    rows = sorted(
        R.orders_open_backlog_curve(spark, SF).collect(),
        key=lambda r: r.day,
    )
    assert rows, "no backlog rows"
    # sweep-line invariant: backlog never negative, ends at zero
    assert all(r.n_open >= 0 for r in rows)
    assert rows[-1].n_open == 0
    assert max(r.n_open for r in rows) > 0


def test_ship_latency_percentiles_ordered(spark):
    rows = R.orders_ship_latency_percentiles(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # synthetic ship dates are independent of order dates, so
        # negative latencies exist; only the ordering is invariant
        assert r.med_days <= r.p90_days <= r.max_days


def test_pareto_abc_partitions_revenue(spark):
    rows = {r.abc: r for r in R.lineitem_pareto_abc(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    # shares partition the total and A dominates by construction
    assert abs(sum(r.revenue_share for r in rows.values()) - 1.0) < 1e-3
    assert rows["A"].revenue_share >= rows["B"].revenue_share
    part = load_table(spark, SF, "part").count()
    assert sum(r.n_parts for r in rows.values()) <= part


def test_rfm_segments_cover_all_customers(spark):
    rows = R.customer_rfm_segments(spark, SF).collect()
    orders = load_table(spark, SF, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_quartile <= 4
        assert 1 <= r.f_quartile <= 4
        assert 1 <= r.m_quartile <= 4


def test_contamination_report_consistent_with_flag(spark):
    from hrfco_data_pipeline_spark.plans import llm

    report = llm.docs_contamination_report(spark, SF)
    flagged = llm.docs_decontaminate(spark, SF)
    r_ids = {r.doc_id for r in report.collect()}
    f_ids = {r.doc_id for r in flagged.collect()}
    # the severity report covers exactly the docs the binary flag finds
    assert r_ids == f_ids
    for r in report.collect():
        assert 0 < r.n_overlap <= r.n_shingles
        assert 0 < r.overlap_frac <= 1


def test_ordered_funnel_counts_sessions(spark):
    rows = {
        r.funnel_stage: r.n_sessions
        for r in R.sessions_ordered_funnel(spark, SF).collect()
    }
    assert set(rows) <= {0, 1, 2, 3}
    # every session lands in exactly one stage
    sw = R.events_session_window_agg(spark, SF)
    assert sum(rows.values()) == sw.count()


def test_correlations_bounded_and_symmetric_pairs(spark):
    rows = R.events_type_correlations(spark, SF).collect()
    assert len(rows) == 10  # C(5,2) unordered type pairs
    for r in rows:
        assert r.type_x < r.type_y
        assert -1.0 - 1e-9 <= r.pearson_r <= 1.0 + 1e-9


def test_median_bisect_equals_sort_median(spark):
    got = {
        r.event_type: r.med
        for r in R.events_median_bisect(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    want = {
        r.event_type: round(r.m, 4)
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    assert got == want


def test_scorecard_consistent_with_components(spark):
    from hrfco_data_pipeline_spark.plans import llm

    card = llm.corpus_quality_scorecard(spark, SF).collect()[0]
    docs = load_table(spark, SF, "documents")
    assert card.n_docs == docs.count()
    assert card.n_contaminated == llm.docs_decontaminate(spark, SF).count()
    assert 0 <= card.exact_dup_share < 1
    assert 0 <= card.keep_rate <= 1
    assert 0 <= card.mean_quality <= 1


def test_label_propagation_communities(spark):
    rows = R.copurchase_label_propagation(spark, SF).collect()
    assert rows, "no communities found"
    for r in rows:
        assert r.community_size > 1


def test_autocorrelation_bounded(spark):
    rows = R.events_autocorrelation(spark, SF).collect()
    assert len(rows) == 35  # 5 types x 7 lags
    for r in rows:
        assert 1 <= r.k <= 7
        assert -1.0 - 1e-9 <= r.acf_r <= 1.0 + 1e-9


def test_containment_extends_jaccard(spark):
    from hrfco_data_pipeline_spark.plans import llm

    cont = llm.docs_containment_pairs(spark, SF).collect()
    assert cont, "no containment pairs"
    for r in cont:
        assert r.containment >= 0.8
        assert r.common <= min(r.na, r.nb)


def test_yoy_growth_consistent(spark):
    rows = R.lineitem_monthly_yoy(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.mo <= 12
        assert r.revenue > 0
        assert r.yoy_growth_pct > -100.0


def test_holt_forecast_reasonable(spark):
    rows = R.events_holt_forecast(spark, SF).collect()
    assert len(rows) == 5
    ev = load_table(spark, SF, "events")
    mx = {
        r.event_type: r.m
        for r in ev.groupBy(
            "event_type", F.to_date("ts").alias("d")
        )
        .count()
        .groupBy("event_type")
        .agg(F.max("count").alias("m"))
        .collect()
    }
    for r in rows:
        # a smoothed level cannot exceed the series max; the one-step
        # forecast stays within trend-reach of it (outputs are rounded
        # independently, so compare with a rounding-slack tolerance)
        assert 0 < r.level <= mx[r.event_type]
        assert abs(r.forecast_next - (r.level + r.trend)) <= 2e-4


def test_lorenz_curve_monotone(spark):
    rows = sorted(
        R.events_user_lorenz_curve(spark, SF).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.cum_share for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-6
    # deciles ascend by activity: later deciles hold more events PER
    # USER (raw shares can invert when ntile sizes are uneven)
    assert (
        rows[-1].n_events / rows[-1].n_users
        >= rows[0].n_events / rows[0].n_users
    )


def test_value_moments_match_spark_builtins(spark):
    rows = {r.event_type: r for r in R.events_value_moments(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    ref = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.skewness("value").alias("sk"),
            F.kurtosis("value").alias("ku"),
        )
        .collect()
    }
    for t, r in rows.items():
        assert abs(r.skewness - ref[t].sk) < 1e-3
        assert abs(r.excess_kurtosis - ref[t].ku) < 1e-3


def test_part_substitutes_blocked_and_bounded(spark):
    rows = R.part_substitutes(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert 0 <= r.price_diff_pct <= 5.0 + 1e-9


def test_dq_uniqueness_covers_keys(spark):
    rows = {r.table_name: r for r in R.dq_uniqueness_report(spark, SF).collect()}
    assert set(rows) == {
        "region", "nation", "customer", "supplier", "part", "orders"
    }
    for r in rows.values():
        assert r.n_distinct_keys <= r.n_rows
        assert r.n_extra_rows == r.n_rows - r.n_distinct_keys


def test_ab_test_degenerate_single_arm(spark, tmp_path):
    """One lone user (a single variant): the report must still emit
    its one row — zero-filled for the empty arm, z NULL instead of a
    NaN/Infinity or a silently empty result."""
    import datetime

    rows = [
        (1, 42, "purchase", datetime.datetime(2024, 1, 1, 10, 0), 1.0),
        (2, 42, "view", datetime.datetime(2024, 1, 2, 10, 0), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = R.events_ab_test(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a + r.n_b) == 2 and (r.c_a + r.c_b) == 1
    assert r.n_a == 0 or r.n_b == 0  # one arm empty
    assert r.z is None
