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


# New-in-r11 queries lead the window (never-checked first, per the
# ordering contract). multimodal_dhash_dups is not new but re-leads:
# its r10 green was adjudicated weak (0-row vacuous match) and the
# query now emits top-20 buckets incl. singletons, so it must re-earn
# an informative green (the hydro_double_mass re-lead precedent).
# Append new queries here as they land; the window pin below derives
# positions from this list, so a careless insert cannot silently
# rotate a pinned backlog entry out unnoticed.
NEW_IN_R11: list[str] = [
    "multimodal_dhash_dups",
    "events_trimmed_mean",
    "events_running_records",
    "docs_source_kl_divergence",
    "hydro_drought_runs",
    "docs_quality_calibration",
    "orders_duplicate_invoices",
    "events_psi_by_type",
    "simhash_bit_balance",
    "ann_centroid_occupancy",
    "docs_packing_waste",
    "events_burstiness_fano",
    "orders_amount_reconciliation",
    "customer_churn_sensitivity",
    "embedding_pca_explained_variance",
    "docs_vocab_coverage_curve",
]

# The pinned r11 backlog written at the end of r10 (VERDICT r10 "Next
# round" #1): the 14 r5-era entries the new-in-r10 head displaced
# past the boundary, then the remaining r5-era greens, then the
# oldest r6-era greens. New-in-r11 head entries displace the TAIL of
# this list past the boundary; the displaced entries must then lead
# the r12 window.
R11_BACKLOG = [
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
    "events_new_vs_returning",
    "events_value_log2_histogram",
    "hydro_station_uptime",
    "events_session_window_agg",
    "events_histogram_quantiles",
    "parts_copurchase_lift",
    "copurchase_triangles",
    "nation_trade_pagerank",
    "orders_benford_digits",
    "events_ab_test",
    "brand_supplier_hhi",
    "events_cusum_changepoint",
    "events_session_paths",
    "session_survival_curve",
    "orders_open_backlog_curve",
    "orders_ship_latency_percentiles",
    "lineitem_pareto_abc",
    "customer_rfm_segments",
    "docs_contamination_report",
    "sessions_ordered_funnel",
    "events_type_correlations",
    "events_median_bisect",
    "corpus_quality_scorecard",
    "copurchase_label_propagation",
    "events_autocorrelation",
    "docs_containment_pairs",
    "lineitem_monthly_yoy",
    "events_holt_forecast",
    "events_user_lorenz_curve",
    "events_value_moments",
    "wire_impute_report",
    "part_substitutes",
    "dq_uniqueness_report",
    "docs_bigram_perplexity",
    "events_feature_matrix",
]


def test_r11_window_composition():
    """The r11 window is exactly (NEW_IN_R11 + R11_BACKLOG)[:50]:
    never-green queries first, then the pinned backlog (r5-era
    displaced tail, remaining r5-era, oldest r6-era). Growth at the
    head may only displace the backlog TAIL; the displaced tail must
    sit immediately behind the boundary, leading the r12 window."""
    names = list(entry.queries())
    expected = (NEW_IN_R11 + R11_BACKLOG)[:50]
    assert names[:50] == expected
    n_displaced = len(NEW_IN_R11 + R11_BACKLOG) - 50
    assert n_displaced >= 0
    if n_displaced:
        assert names[50 : 50 + n_displaced] == R11_BACKLOG[-n_displaced:]


def test_r12_window_plan():
    """Positions 50-99 (the r12 plan): displaced r11-backlog tail
    first (if any), then the remaining r6-era greens, then the oldest
    r7-era greens — every slot oracle-backed so each can earn a green
    row. The freshly-certified r10 block sits at the back, just ahead
    of the rows-only tail."""
    names = list(entry.queries())
    r12 = names[50:100]
    oracles = set(entry.oracle_sql())
    assert set(r12) <= oracles
    # the 12 stale r3/r4 greens the evidence ledger surfaced
    assert "docs_gopher_quality" in r12
    assert "embedding_near_dups" in r12
    # remaining r6-era evidence (oldest after this round)
    assert "events_k_anonymity" in r12
    assert "docs_zipf_fit" in r12
    # the displaced tail + 12 stale + r6 remainder fill the window
    # exactly, so the r7-era head sits just behind it
    assert "embedding_random_projection" in names[100:]
    # the r8/r9-certified blocks are behind the r12 window
    for q in ("orders_join_strategy_report", "events_segment_enrichment",
              "embedding_mutual_knn", "minhash_sig_probe",
              "hydro_station_list", "docs_editdist_pairs"):
        assert q in names[100:], q
    # the freshly-certified r10 block sits at the back
    # (multimodal_dhash_dups excepted: it re-leads the r11 window)
    for q in ("events_ks_two_sample", "hydro_station_crosscorr",
              "hydro_double_mass", "hydro_daily_extremes"):
        assert q in names[100:], q
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


def test_evidence_ledger_is_fresh():
    """docs/EVIDENCE.md is generated from the registry order + the
    CORRECTNESS_r*.json history; a registry change without
    regenerating it would silently de-sync the rotation-planning
    table (the r11 lesson: comment archaeology drifted 12 queries).
    Regenerate in-memory and compare."""
    import importlib
    import pathlib
    import sys

    sys.path.insert(0, ".")
    gen = importlib.import_module("tools.gen_query_docs")
    hist = gen.driver_history()
    q = entry.queries()
    o = entry.oracle_sql()
    import contextlib
    import io
    import os
    import tempfile

    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as td:
        os.makedirs(os.path.join(td, "docs"))
        try:
            os.chdir(td)
            with contextlib.redirect_stdout(io.StringIO()):
                gen.write_evidence_ledger(q, o, hist)
            fresh = pathlib.Path(td, "docs", "EVIDENCE.md").read_text()
        finally:
            os.chdir(cwd)
    committed = pathlib.Path(cwd, "docs", "EVIDENCE.md").read_text()
    assert fresh == committed, (
        "docs/EVIDENCE.md is stale — run: python tools/gen_query_docs.py"
    )
