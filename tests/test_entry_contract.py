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


# New-in-r9 queries lead the window (never-checked first, per the
# ordering contract). Append here as they land; the window pin below
# derives positions from this list, so a careless insert cannot
# silently rotate a pinned backlog entry out unnoticed.
NEW_IN_R9: list[str] = [
    "events_segment_enrichment",
    "customer_scd2_asof_snapshot",
    "orders_theilsen_trend",
    "embedding_mutual_knn",
    "docs_pmi_top_pairs",
    "hydro_double_mass",
    "docs_ccnet_quality_buckets",
    "events_watermark_lateness_audit",
    "orders_retention_vacuum_plan",
    "events_mad_outliers",
    "docs_quality_bootstrap_ci",
    "docs_source_tv_distance",
    "copurchase_weighted_sssp",
    "docs_length_survival",
]

# The pinned r9 backlog written at the end of r8 (VERDICT r8 "Next
# round" #1): the remaining r4-era greens — including the
# hydro/station anchor block, the oldest SURVEY §2 evidence after r8
# cleared the r3 era — topped up with the oldest r5-era greens.
# New-in-r9 head entries displace the TAIL of this list past the
# boundary; the displaced entries must then lead the r10 window.
R9_BACKLOG = [
    "minhash_sig_probe",
    "simhash_probe",
    "lsh_sig_probe",
    "minhash_band_pairs_probe",
    "simhash_pairs_probe",
    "near_dedup_probe",
    "events_peak_window_traffic",
    "dedup_exact_docs",
    "dedup_docs_kept",
    "docs_quality_score",
    "docs_lang_id",
    "doc_fingerprints",
    "docs_bpe_token_count",
    "ann_cosine_topk",
    "embedding_label_stats",
    "docs_ngram_jaccard_pairs",
    "docs_token_stats",
    "multimodal_features",
    "q1_pricing_summary",
    "hydro_internal_levels",
    "hydro_station_list",
    "hydro_archive_partitions",
    "hydro_threshold_audit",
    "hydro_station_detail",
    "hydro_station_tail",
    "hydro_alerts_filtered",
    "hydro_recent_alerts_500",
    "hydro_fact_hourly_rollup",
    "hydro_sensor_gaps",
    "hydro_resample_10min",
    "hydro_station_obs_coverage",
    "docs_simjoin_prefix",
    "docs_bloom_decontaminate",
    "lineitem_zorder_layout",
    "docs_cms_heavy_hitters",
    "docs_editdist_pairs",
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
]


def test_r9_window_composition():
    """The r9 window is exactly (NEW_IN_R9 + R9_BACKLOG)[:50]: new
    queries first, then the pinned backlog; growth at the head may
    only displace the backlog TAIL (r5-era top-ups), never the r4-era
    anchors. The displaced tail must sit immediately behind the
    boundary, leading the r10 window."""
    names = list(entry.queries())
    expected = (NEW_IN_R9 + R9_BACKLOG)[:50]
    assert names[:50] == expected
    n_displaced = len(NEW_IN_R9 + R9_BACKLOG) - 50
    assert n_displaced >= 0
    hydro_anchor = {
        "hydro_station_list",
        "hydro_station_detail",
        "hydro_threshold_audit",
        "hydro_archive_partitions",
        "hydro_alerts_filtered",
        "hydro_recent_alerts_500",
    }
    assert hydro_anchor <= set(names[:50]), (
        "the hydro/station anchor block (oldest SURVEY §2 evidence) "
        "fell out of the r9 window — too many new-in-r9 head entries"
    )
    if n_displaced:
        assert names[50 : 50 + n_displaced] == R9_BACKLOG[-n_displaced:]


def test_r10_window_plan():
    """Positions 50-99 (the r10 plan): displaced r9-backlog tail
    first, then the remaining r5-era greens, then the oldest r6-era
    greens — every slot oracle-backed so each can earn a green row.
    The freshly-certified r8 block sits at the back, just ahead of
    the rows-only tail."""
    names = list(entry.queries())
    r10 = names[50:100]
    oracles = set(entry.oracle_sql())
    assert set(r10) <= oracles
    # remaining r5-era evidence leads (oldest after this round)
    assert "dup_cluster_sizes" in r10
    assert "metrics_nifi_timestamps" in r10
    # the r8-certified block is behind the r10 window
    for q in ("orders_join_strategy_report", "docs_bm25_topk",
              "events_kmv_setops", "customer_scd2_history"):
        assert q in names[100:], q
    # the r7-certified block stays at the back too
    assert "embedding_random_projection" in names[100:]
    assert "events_moving_stats" in names[100:]
    # rows-only entries stay at the very end
    assert names[-5:] == [
        "events_hll_user_rollup",
        "events_approx_stats",
        "minhash_near_dups",
        "simhash_clusters",
        "near_dedup_keep",
    ]


def test_all_callables_and_oracles_nonempty():
    q = entry.queries()
    assert all(callable(f) for f in q.values())
    assert all(s.strip() for s in entry.oracle_sql().values())
