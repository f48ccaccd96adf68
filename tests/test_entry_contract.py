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


# New-in-r8 queries lead the window (never-checked first, per the
# ordering contract). Append here as they land; the contract tests
# below derive positions from this list so the pinned r8 head stays
# inside the first-50 window (len must stay <= 39).
NEW_IN_R8: list[str] = [
    "orders_join_strategy_report",
    "docs_bm25_topk",
    "copurchase_kcore",
    "docs_rake_keyphrases",
    "docs_hybrid_rrf",
    "lineitem_hilbert_layout",
    "layout_pruning_report",
    "multimodal_image_patches",
    "events_kmv_setops",
    "lineitem_compaction_plan",
    "customer_scd2_history",
    "events_sampled_quantiles",
]

# The pinned r8 head promoted from behind the r7 boundary
# (VERDICT r7 "Next round" #1): the r3-era greens squeezed out of the
# r7 cut plus embedding_quantize.
R8_PROMOTED = [
    "events_view_only_users",
    "events_value_bands",
    "events_value_percentiles",
    "events_range_window",
    "dq_referential_report",
    "tables_report",
    "events_props_variant",
    "doc_winnow_fingerprints",
    "dup_components",
    "dedup_incremental",
    "embedding_quantize",
]


def test_r8_window_composition():
    """The r8 window: new-in-r8 queries first (never checked), then
    the pinned 11-entry promoted head, then the remaining r3-era
    greens (evidence two testdata regens old) and the oldest r4-era
    greens topping up to 50. Pin the block bounds so a careless
    insert can't silently rotate a pinned entry out."""
    names = list(entry.queries())
    w = names[:50]
    n = len(NEW_IN_R8)
    assert n <= 39, "new-in-r8 block would push the pinned head out"
    assert w[:n] == NEW_IN_R8
    assert w[n : n + 11] == R8_PROMOTED
    assert w[n + 11] == "docs_ngram_freq"  # r3-era remainder starts
    must_check = {
        "docs_decontaminate",
        "docs_pack_sequences",
        "docs_tfidf_top_terms",
        "q7_volume_shipping",
        "q19_disjunctive_revenue",
    }
    assert must_check <= set(w)
    # each new-in-r8 head entry shifts one r3-era green past the
    # boundary (q20/q21/q22 and docs_gopher_quality onward): they must
    # lead the r9 window with the other r3-era leftovers instead of
    # silently vanishing.
    assert names[50] == "q20_part_share_suppliers"


def test_r9_window_plan():
    """Positions 50-99 lead with the remaining r4-era greens — which
    contain the hydro/station anchor block (S6/S7/T7/T10/T11/C6/F3/
    K1/K2), the oldest SURVEY §2 evidence once r8 clears the r3 era
    (VERDICT r7 "Next round" #5) — topped up by entries the r8 window
    squeezed out and the oldest r5-era greens."""
    names = list(entry.queries())
    r9 = names[50:100]
    oracles = set(entry.oracle_sql())
    assert set(r9) <= oracles  # every r9-window slot can go green
    hydro_anchor = {
        "hydro_station_list",
        "hydro_station_detail",
        "hydro_threshold_audit",
        "hydro_archive_partitions",
        "hydro_alerts_filtered",
        "hydro_recent_alerts_500",
    }
    assert hydro_anchor <= set(r9)
    # the r7-certified block sits at the back (freshest evidence last,
    # just ahead of the rows-only tail)
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
