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


# New-in-r12 queries lead the window (never-checked first, per the
# ordering contract). Append new queries here as they land; the window
# pin below derives positions from this list, so a careless insert
# cannot silently rotate a pinned backlog entry out unnoticed.
NEW_IN_R12: list[str] = [
    "parts_price_size_skyline",
    "events_lateness_profile",
    "docs_crosssnap_containment",
    "docs_contamination_heatmap",
    "embedding_label_noise_screen",
    "embedding_cosine_histogram",
    "docs_partition_checksums",
    "docs_length_quantiles_by_source",
    "multimodal_bytes_entropy",
    "docs_quality_dup_contingency",
    "events_session_gap_sensitivity",
    "docs_dedup_threshold_curve",
    "embedding_label_silhouette",
    "hydro_level_mad_outliers",
    "docs_source_vocab_overlap",
    "events_t_closeness",
]

# The pinned r12 backlog written at the end of r11 (VERDICT r11 "Next
# round" #1, generated from docs/EVIDENCE.md): the 16 entries the
# new-in-r11 head displaced past the r11 boundary, then the 12 stale
# r3/r4 greens the evidence ledger surfaced, then the remaining
# r6-era greens. New-in-r12 head entries displace the TAIL of this
# list past the boundary; the displaced entries must then lead the
# r13 window.
R12_BACKLOG = [
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
    "docs_gopher_quality",
    "docs_token_entropy",
    "docs_segment_dedup",
    "events_retention_cohorts",
    "events_conversion_funnel",
    "q20_part_share_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "ivf_cosine_topk",
    "events_hll_accuracy",
    "lsh_cosine_topk",
    "embedding_near_dups",
    "events_k_anonymity",
    "docs_weighted_sample",
    "copurchase_bfs_levels",
    "docs_nb_lang_classifier",
    "events_touch_attribution",
    "docs_zipf_fit",
    "lineitem_returnflag_anova",
    "wire_field_presence",
    "pq_distortion_report",
    "events_nearest_error",
    "docs_snapshot_diff",
    "hydro_stage_exceedance",
    "hydro_return_periods",
    "docs_train_linear_gate",
    "docs_nb_holdout_eval",
    "docs_learning_curve",
    "events_entropy_rate",
    "hydro_baseflow_separation",
    "events_weekday_type_chisq",
    "customer_balance_standing",
    "hydro_rating_residuals",
    "orders_cohort_ltv_curve",
]


def test_r12_window_composition():
    """The r12 window is exactly (NEW_IN_R12 + R12_BACKLOG)[:50]:
    never-green queries first, then the pinned backlog. Growth at the
    head may only displace the backlog TAIL; the displaced tail must
    sit immediately behind the boundary, leading the r13 window."""
    names = list(entry.queries())
    expected = (NEW_IN_R12 + R12_BACKLOG)[:50]
    assert names[:50] == expected
    n_displaced = len(NEW_IN_R12 + R12_BACKLOG) - 50
    assert n_displaced >= 0
    if n_displaced:
        assert names[50 : 50 + n_displaced] == R12_BACKLOG[-n_displaced:]


def test_r13_window_plan():
    """Positions 50-99 (the r13 plan): the displaced r12-backlog tail
    first (r6-era), then the oldest r7-era greens — every slot
    oracle-backed so each can earn a green row. The freshly-certified
    r11 block sits at the back, just ahead of the rows-only tail."""
    names = list(entry.queries())
    r13 = names[50:100]
    oracles = set(entry.oracle_sql())
    assert set(r13) <= oracles
    # the displaced r6-era tail leads
    n_displaced = len(NEW_IN_R12 + R12_BACKLOG) - 50
    assert r13[:n_displaced] == R12_BACKLOG[-n_displaced:]
    # oldest r7-era greens fill the rest
    for q in ("embedding_random_projection", "docs_substring_dedup",
              "orders_salted_revenue"):
        assert q in r13, q
    # the r8/r9-certified blocks are behind the r13 window
    for q in ("orders_join_strategy_report", "events_segment_enrichment",
              "embedding_mutual_knn", "minhash_sig_probe",
              "hydro_station_list", "docs_editdist_pairs"):
        assert q in names[100:], q
    # the freshly-certified r11 block sits at the back
    for q in ("events_trimmed_mean", "events_psi_by_type",
              "multimodal_dhash_dups", "hydro_drought_runs"):
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


def _regenerate_ledger(hist) -> str:
    """Render the evidence ledger for the given driver history into a
    temp cwd and return its text (the guard's in-memory twin of
    tools/gen_query_docs.py)."""
    import contextlib
    import importlib
    import io
    import os
    import pathlib
    import sys
    import tempfile

    sys.path.insert(0, ".")
    gen = importlib.import_module("tools.gen_query_docs")
    q = entry.queries()
    o = entry.oracle_sql()
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as td:
        os.makedirs(os.path.join(td, "docs"))
        try:
            os.chdir(td)
            with contextlib.redirect_stdout(io.StringIO()):
                gen.write_evidence_ledger(q, o, hist)
            return pathlib.Path(td, "docs", "EVIDENCE.md").read_text()
        finally:
            os.chdir(cwd)


def _committed_ledger_and_stamp():
    import pathlib
    import re

    committed = pathlib.Path("docs", "EVIDENCE.md").read_text()
    m = re.search(r"history through r(\d+)", committed)
    assert m, (
        "docs/EVIDENCE.md carries no round stamp — run: "
        "python tools/gen_query_docs.py"
    )
    return committed, int(m.group(1))


def test_evidence_ledger_is_fresh():
    """docs/EVIDENCE.md is generated from the registry order + the
    CORRECTNESS_r*.json history; a registry change without
    regenerating it would silently de-sync the rotation-planning
    table (the r11 lesson: comment archaeology drifted 12 queries).
    Regenerate in-memory and compare — filtering the history to the
    committed ledger's own round stamp, so the driver dropping
    CORRECTNESS_r{N+1}.json after round N closes no longer reds the
    suite at every boundary (VERDICT r12 'Next round' #2);
    tools/round_start.py still regenerates from the full history at
    round open."""
    import importlib
    import sys

    sys.path.insert(0, ".")
    gen = importlib.import_module("tools.gen_query_docs")
    committed, stamp = _committed_ledger_and_stamp()
    fresh = _regenerate_ledger(gen.driver_history(max_round=stamp))
    assert fresh == committed, (
        "docs/EVIDENCE.md is stale — run: python tools/gen_query_docs.py"
    )


def test_freshness_guard_tolerates_boundary_correctness_drop(tmp_path):
    """Simulated round boundary: a CORRECTNESS file from a LATER round
    than the ledger stamp appears (the driver always lands one after
    round close) — the stamp-filtered history must not see it, so the
    regenerated ledger still equals the committed one and the suite
    stays green."""
    import glob
    import importlib
    import json
    import os
    import shutil
    import sys

    sys.path.insert(0, ".")
    gen = importlib.import_module("tools.gen_query_docs")
    committed, stamp = _committed_ledger_and_stamp()
    cwd = os.getcwd()
    for p in glob.glob("CORRECTNESS_r*.json"):
        shutil.copy(p, tmp_path / p)
    # the boundary drop: a green row for a query whose committed
    # last_green is older — unfiltered it WOULD change the ledger
    fake = {
        "hydro_classify_alerts": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
        }
    }
    (tmp_path / f"CORRECTNESS_r{stamp + 1}.json").write_text(
        json.dumps(fake)
    )
    try:
        os.chdir(tmp_path)
        filtered = gen.driver_history(max_round=stamp)
        unfiltered = gen.driver_history()
    finally:
        os.chdir(cwd)
    assert _regenerate_ledger(filtered) == committed
    assert _regenerate_ledger(unfiltered) != committed


def test_freshness_guard_catches_registry_drift(monkeypatch):
    """A registry edit without regenerating the ledger must still fail
    the guard: drop one entry from queries() and the stamp-filtered
    regeneration diverges from the committed file."""
    import importlib
    import sys

    sys.path.insert(0, ".")
    gen = importlib.import_module("tools.gen_query_docs")
    committed, stamp = _committed_ledger_and_stamp()
    real = entry.queries()
    drifted = dict(list(real.items())[:-1])
    monkeypatch.setattr(entry, "queries", lambda: drifted)
    fresh = _regenerate_ledger(gen.driver_history(max_round=stamp))
    assert fresh != committed
