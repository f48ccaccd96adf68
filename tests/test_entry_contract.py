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
    # rows-only set is exactly the documented eight
    assert set(q) - set(o) == {
        "near_dedup_keep",
        "events_approx_stats",
        "events_hll_user_rollup",
        "minhash_near_dups",
        "simhash_clusters",
        "lsh_cosine_topk",
        "ivf_cosine_topk",
        "embedding_near_dups",
    }


def test_first_50_holds_unverified_queries():
    """Queries without a green driver row (new in r3, or red before)
    must sit inside the gate's first-50 sampling window."""
    first50 = set(list(entry.queries())[:50])
    must_check = {
        # red/erred in r1-r2, fixed in r3
        "wire_connector_station_counts",
        "multimodal_blob_stats",
        # new in r3
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q11_important_parts",
        "q13_customer_order_distribution",
        "q15_top_supplier",
        "q16_part_supplier_counts",
        "q19_disjunctive_revenue",
        "q20_part_share_suppliers",
        "q21_waiting_suppliers",
        "q22_idle_customers",
        "docs_gopher_quality",
        "docs_token_entropy",
        "docs_segment_dedup",
        # never sampled in r1/r2
        "q18_large_volume_customers",
        "events_value_percentiles",
        "dq_referential_report",
        "docs_decontaminate",
        "docs_curation_funnel",
        "embedding_block_near_dups",
        "ivf_cosine_topk",
    }
    assert must_check <= first50


def test_all_callables_and_oracles_nonempty():
    q = entry.queries()
    assert all(callable(f) for f in q.values())
    assert all(s.strip() for s in entry.oracle_sql().values())
