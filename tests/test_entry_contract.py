"""Driver-contract guards for __spark_entry__.

The external correctness gate samples the FIRST 50 entries of
``queries()`` in dict order each round, so the ordering is load-bearing:
a careless insert can silently push a never-checked query out of the
window. These tests pin the contract without starting Spark.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_registry_shape():
    q = entry.queries()
    o = entry.oracle_sql()
    names = list(q)
    assert len(names) == len(set(names))
    # every oracle belongs to a registered query
    assert set(o) <= set(q)
    # rows-only set is exactly the documented five
    assert set(q) - set(o) == {
        "near_dedup_keep",
        "events_approx_stats",
        "events_hll_user_rollup",
        "minhash_near_dups",
        "simhash_clusters",
    }


def test_first_50_all_oracle_backed():
    """A window slot spent on a rows-only query can never produce a
    green driver row (the gate records err: no_oracle) — r3 lost two
    slots this way. Every first-50 entry must have an oracle twin."""
    first50 = list(entry.queries())[:50]
    oracles = set(entry.oracle_sql())
    missing = [n for n in first50 if n not in oracles]
    assert not missing, f"rows-only queries inside the first-50 window: {missing}"


def test_first_50_holds_unverified_queries():
    """The r5 window is exactly the 50 oldest never-driver-checked
    oracle-backed queries (driver rows r1-r4 cover every other
    oracle-backed entry). Pin the boundary entries so a careless
    insert can't silently rotate one out."""
    names = list(entry.queries())
    first50 = set(names[:50])
    must_check = {
        # front of the window: the r4 post-boundary block
        "multimodal_frame_sample",
        "semantic_dedup_keep",
        "kmeans_refine_probe",
        "docs_dsir_weights",
        "docs_leakage_safe_split",
        "metrics_nifi_timestamps",
        # global-window queries rebuilt on ranked_cumsum this round
        "docs_select_token_budget",
        "docs_vocab_growth",
        "customer_ltv_deciles",
        "events_conversion_latency",
        # tail of the window: the late-r4 stats/graph batch
        "events_session_window_agg",
        "events_histogram_quantiles",
        "parts_copurchase_lift",
        "copurchase_triangles",
        "nation_trade_pagerank",
    }
    assert must_check <= first50
    # r6 plan: positions 50-99 are exactly next round's window — the
    # 25 remaining never-checked entries then the 25 new-in-r5
    # queries — so the r6 rotation is a single 50-entry cut.
    behind = names[50:75]
    assert behind[0] == "orders_benford_digits"
    assert behind[-1] == "dq_uniqueness_report"
    r6_must = {
        "events_ab_test",
        "lineitem_pareto_abc",
        "customer_rfm_segments",
        "events_user_lorenz_curve",
        "events_median_bisect",
        "corpus_quality_scorecard",
    }
    assert r6_must <= set(behind)
    new_r5 = names[75:100]
    assert new_r5[0] == "docs_bigram_perplexity"
    assert new_r5[-1] == "orders_cohort_ltv_curve"
    oracles = set(entry.oracle_sql())
    assert set(new_r5) <= oracles  # every r6-window slot can go green


def test_all_callables_and_oracles_nonempty():
    q = entry.queries()
    assert all(callable(f) for f in q.values())
    assert all(s.strip() for s in entry.oracle_sql().values())
