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


# New-in-r10 queries lead the window (never-checked first, per the
# ordering contract). hydro_double_mass is not new but leads for the
# same reason: its r9 driver row was red (decimal-output hash split;
# re-led after the BIGINT output fix). Append new queries here as
# they land; the window pin below derives positions from this list,
# so a careless insert cannot silently rotate a pinned backlog entry
# out unnoticed.
NEW_IN_R10: list[str] = [
    "events_ks_two_sample",
    "events_mann_whitney",
    "hydro_recession_constant",
    "ann_prefix_dim_recall",
    "docs_oov_rate",
    "lineitem_bloom_semijoin_prune",
    "hydro_pettitt_changepoint",
    "hydro_station_crosscorr",
    "orders_mann_kendall",
    "customer_spearman_balance_value",
    "events_l_diversity",
    "docs_sqrt_temperature_mix",
    "embedding_shard_centroid_drift",
    "hydro_rolling_rise",
    "multimodal_dhash_dups",
    "hydro_double_mass",
]

# The pinned r10 backlog written at the end of r9 (VERDICT r9 "Next
# round" #3): the 14 r9-backlog entries the new-in-r9 head displaced
# past the boundary (r4-era greens), then the oldest r5-era greens.
# New-in-r10 head entries displace the TAIL of this list past the
# boundary; the displaced entries must then lead the r11 window.
R10_BACKLOG = [
    "pq_adc_topk",
    "events_value_band_history",
    "docs_line_dedup_rebuild",
    "ivfpq_adc_topk",
    "events_grouping_sets",
    "docs_editdist_prefix_pairs",
    "events_value_outliers",
    "multimodal_frame_sample",
    "semantic_dedup_keep",
    "kmeans_refine_probe",
    "docs_dsir_weights",
    "docs_leakage_safe_split",
    "docs_bpe_pair_counts",
    "docs_quality_cutoff",
    "dup_cluster_sizes",
    "ann_hard_negatives",
    "events_user_overlap",
    "docs_model_quality_score",
    "docs_lang_balance_sampler",
    "docs_curriculum_order",
    "events_running_distinct_users",
    "metrics_nifi_timestamps",
    "minhash_calibration",
    "docs_bpe_apply_merge",
    "docs_lang_confusion",
    "docs_select_token_budget",
    "events_seasonal_baseline",
    "hydro_rating_curve",
    "customer_ltv_deciles",
    "events_dau_wau_stickiness",
    "docs_ngram_novelty",
    "events_markov_transitions",
    "hydro_alert_episodes",
    "hydro_daily_extremes",
    "events_inter_arrival_stats",
    "events_conversion_latency",
    "docs_dup_rate_by_source",
    "supplier_on_time_rate",
    "embedding_norm_outliers",
    "events_value_gini",
    "docs_vocab_growth",
    "wire_corrupt_rate",
    "docs_shard_skew_report",
    "hydro_threshold_margin",
    "hydro_rise_forecast",
    "events_weekday_hour_heatmap",
    "orders_cohort_repeat_rate",
    "minhash_recall_report",
    "events_type_drift",
]


def test_r10_window_composition():
    """The r10 window is exactly (NEW_IN_R10 + R10_BACKLOG)[:50]:
    never-green queries first, then the pinned backlog; growth at the
    head may only displace the backlog TAIL (r5-era entries), never
    the r4-era displaced block. The displaced tail must sit
    immediately behind the boundary, leading the r11 window."""
    names = list(entry.queries())
    expected = (NEW_IN_R10 + R10_BACKLOG)[:50]
    assert names[:50] == expected
    n_displaced = len(NEW_IN_R10 + R10_BACKLOG) - 50
    assert n_displaced >= 0
    r4_displaced = set(R10_BACKLOG[:14])
    assert r4_displaced <= set(names[:50]), (
        "the r9-displaced r4-era block (oldest driver evidence) fell "
        "out of the r10 window — too many new-in-r10 head entries"
    )
    if n_displaced:
        assert names[50 : 50 + n_displaced] == R10_BACKLOG[-n_displaced:]


def test_r11_window_plan():
    """Positions 50-99 (the r11 plan): displaced r10-backlog tail
    first, then the remaining r5-era greens, then the oldest r6-era
    greens — every slot oracle-backed so each can earn a green row.
    The freshly-certified r9 block sits at the back, just ahead of
    the rows-only tail."""
    names = list(entry.queries())
    r11 = names[50:100]
    oracles = set(entry.oracle_sql())
    assert set(r11) <= oracles
    # remaining r5-era evidence leads (oldest after this round)
    assert "events_new_vs_returning" in r11
    assert "nation_trade_pagerank" in r11
    # then the oldest r6-era greens
    assert "orders_benford_digits" in r11
    # the r9-certified block is behind the r11 window
    for q in ("events_segment_enrichment", "embedding_mutual_knn",
              "minhash_sig_probe", "hydro_station_list",
              "docs_editdist_pairs"):
        assert q in names[100:], q
    # the r7/r8-certified blocks stay at the back too
    assert "embedding_random_projection" in names[100:]
    assert "orders_join_strategy_report" in names[100:]
    # rows-only entries stay at the very end
    assert names[-5:] == [
        "events_hll_user_rollup",
        "events_approx_stats",
        "minhash_near_dups",
        "simhash_clusters",
        "near_dedup_keep",
    ]


def test_boundary_comment_position():
    """The human-readable first-50 boundary marker in
    __spark_entry__.py must sit exactly after entry 50 — a wrong
    marker on the driver-sampled ordering is how a window slot gets
    lost (VERDICT r9 "What's wrong" #2: the r9 marker drifted 14
    entries stale)."""
    import re

    src = open(entry.__file__).read()
    before_marker = src.split("first-50 boundary")[0]
    # count dict-entry lines ("name": module.fn,) above the marker
    n_above = len(
        re.findall(r'^\s{8}"[a-z0-9_]+":\s', before_marker, re.MULTILINE)
    )
    assert n_above == 50, (
        f"boundary marker sits after {n_above} entries, want 50 — "
        "move the comment to the true boundary"
    )


def test_all_callables_and_oracles_nonempty():
    q = entry.queries()
    assert all(callable(f) for f in q.values())
    assert all(s.strip() for s in entry.oracle_sql().values())
