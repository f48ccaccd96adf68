#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no
driver-side result serialization). local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hrfco_data_pipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

# Representative mix: full hydrology pipeline, scan-heavy agg, multi-way
# joins, window functions, dedup, shingle self-join, vector search.
HEADLINE = [
    "hydro_classify_alerts",
    "hydro_alert_counts",
    "wire_parse",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "mon_activity_delta",
    "events_hourly",
    "events_sessionize",
    "dedup_exact_docs",
    "docs_token_stats",
    "docs_ngram_jaccard_pairs",
    "ann_cosine_topk",
    "minhash_near_dups",
    "events_asof_last_error",
    "hydro_fact_hourly_rollup",
    # round-2 additions: keep the new heavy operators accountable
    "docs_tfidf_top_terms",
    "doc_winnow_fingerprints",
    "hydro_sensor_gaps",
    "hydro_resample_10min",
    # round-3 additions: heaviest of the TPC-H completion + curation sets
    "q21_waiting_suppliers",
    "docs_segment_dedup",
    # round-4 additions: the oracle-upgraded ANN + workflow paths
    "ivf_cosine_topk",
    "near_dedup_probe",
    # round-4 additions: lossless-pruning joins + layout/sketch ops
    "docs_simjoin_prefix",
    "docs_bloom_decontaminate",
    "lineitem_zorder_layout",
    # round-4 additions: clustering / selection / leakage-safe curation
    "semantic_dedup_keep",
    "docs_dsir_weights",
    "docs_leakage_safe_split",
    # late-round additions: iterative graph + native session windows
    "nation_trade_pagerank",
    "events_session_window_agg",
    # round-5 additions: corpus-trained LM scoring + the r4-weak
    # global-window query rebuilt on the two-pass range rank
    "docs_bigram_perplexity",
    "docs_select_token_budget",
    # round-5 additions: trained NB classifier + feature-store join
    "docs_nb_lang_classifier",
    "events_feature_matrix",
    # round-6 additions: the heaviest iterative/training queries get
    # tracked round-over-round like PageRank (r5 verdict item 6)
    "docs_train_linear_gate",
    "copurchase_bfs_levels",
    "docs_learning_curve",
    # round-7 additions: the two heaviest new operators — corpus-wide
    # 8-gram substring dedup and the wedge-join graph similarity
    "docs_substring_dedup",
    "copurchase_jaccard_parts",
    # round-8 additions: the two heaviest new operators — the
    # double-ranked layout scorecard and the two-arm retrieval fusion
    "layout_pruning_report",
    "docs_hybrid_rrf",
    # round-8 additions (late): the KMV sketch with its exact QA
    # self-join arms, and the full-dimension SCD2 history build
    "events_kmv_setops",
    "customer_scd2_history",
    # round-9 additions: the heaviest new operators — the classify-
    # chain double-mass QA, the pair-block mutual kNN graph, and the
    # two-pass running-max lateness audit
    "hydro_double_mass",
    "embedding_mutual_knn",
    "events_watermark_lateness_audit",
    # round-10 additions: the heaviest new operators — the bounded
    # pair-block station cross-correlation, the dual-ranking ANN
    # truncation QA, and the distinct-value-grid KS drift scan
    "hydro_station_crosscorr",
    "ann_prefix_dim_recall",
    "events_ks_two_sample",
    # round-11 additions: the heaviest new operators — the classify-
    # chain drought-spell QA, the partitioned-two-pass running-record
    # scan, and the double-hash-fold calibration diagram
    "hydro_drought_runs",
    "events_running_records",
    "docs_quality_calibration",
    # round-11 late additions: the decile-grid PSI drift scan and the
    # 60-way fingerprint bit audit
    "events_psi_by_type",
    "simhash_bit_balance",
    # round-11 final addition: the header/lines fact-fact
    # reconciliation join
    "orders_amount_reconciliation",
    # round-12 additions: the heaviest new operators — the
    # double-winnowing cross-snapshot containment join, the 1-row-per-
    # payload-byte entropy scan, and the Bloom pass re-cut as the
    # source x shard heatmap
    "docs_crosssnap_containment",
    # r15: multimodal_bytes_entropy migrated to the log-free collision
    # form (same scan shape, cheaper tail — SCALE.md watch list)
    "multimodal_bytes_concentration",
    "docs_contamination_heatmap",
    "hydro_level_mad_outliers",
    "docs_source_vocab_overlap",
    "events_t_closeness",
    # round-13 additions: BASELINE.md's standing composition policy
    # (every new operator over ~0.5 s isolated cold at sf0.1 joins) —
    # all 16 r13 operators cleared it, including the two streaming
    # parity certificates, which pay a real availableNow micro-batch
    # run per execution
    "dedup_survivor_length_bias",
    "docs_cross_source_dup_matrix",
    "dedup_incremental_certificate",
    "dedup_chaining_audit",
    "lsh_band_tradeoff_curve",
    "hydro_flashiness_index",
    "hydro_flood_volume",
    "events_bot_regularity_screen",
    "events_ewma_control",
    "events_quantile_sketch_error",
    "supplier_share_drift",
    "wire_dedup_replay",
    "docs_tokenizer_fertility",
    "ann_recall_by_occupancy",
    "stream_batch_cms_parity",
    "stream_batch_psi_parity",
    # round-14 additions: the standing composition policy again —
    # all 16 r14 operators cleared ~0.5 s isolated cold at sf0.1,
    # including the three new streaming parity certificates (real
    # availableNow micro-batch runs) and the three-rung chaining
    # threshold sweep (one pair-table build + 3 pointer-jumping CCs)
    "stream_batch_bm25_parity",
    "stream_batch_kmv_parity",
    "stream_batch_qsample_parity",
    "dedup_chaining_threshold_sweep",
    "hydro_station_ewma",
    "orders_priority_psi_by_segment",
    "events_regularity_type_mix",
    "docs_crosssnap_dup_trend",
    "docs_simhash_hamming_histogram",
    "dedup_survivor_source_flow",
    "embedding_shard_cell_drift",
    "embedding_norm_quality_corr",
    "ann_pq_code_balance",
    "hydro_alert_transition_matrix",
    "multimodal_patch_energy_profile",
    "events_kanon_generalization_ladder",
    # round-15 additions: the standing composition policy again — all
    # 14 r15 operators cleared ~0.5 s isolated cold at sf0.1 (bands in
    # BASELINE.md §r15), including the five new streaming parity
    # certificates (real availableNow micro-batch runs; the lateness
    # one replays ordered range files) and the three exact-integer
    # migrations of the former entropy emissions
    # (multimodal_bytes_concentration sits at its pre-migration slot
    # above)
    "customers_without_urgent_orders",
    "stream_batch_lateness_parity",
    "stream_batch_tv_parity",
    "stream_batch_ks_parity",
    "stream_batch_scd2_parity",
    "stream_batch_lm_parity",
    "docs_token_concentration",
    "events_markov_concentration",
    "ann_ivf_pq_agreement",
    "hydro_rising_limb_lead_time",
    "dedup_rate_by_snapshot",
    "docs_source_halves_drift",
    "embedding_quantize_bit_sweep",
    # the 16-cap fillers: fragment-state sessionization certificate +
    # Apriori level-3 mining
    "stream_batch_session_parity",
    "brand_itemset3_support",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="hrfco-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM / codegen / parquet footer caches so timings
    # reflect steady-state execution, not session bring-up.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Box-speed calibration (BASELINE.md §Box-speed): the sandbox VM
    # swings 2-3× between sessions, so every bench run records a warm
    # 32-way JVM probe. Absolute seconds across rounds must be read
    # per calibration unit; ~0.5 s = the fast-box reference.
    t0 = time.perf_counter()
    spark.range(2_000_000_000).selectExpr("sum(id)").collect()
    calibration_s = round(time.perf_counter() - t0, 3)

    from hrfco_data_pipeline_spark.sources.tables import load_table

    load_table(spark, sf_dir, "events").limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()

    # Second calibration anchor (VERDICT r14 'Next round' #7): the
    # 2e9-row sum above tracks SCALAR CPU and over/under-corrects on a
    # loaded box (r14: a 0.842 probe produced 0.39–0.87x "speedups" on
    # queries that had not changed). This one is STAGE-SHAPED — a warm
    # 32-partition parquet scan + hash-shuffle + aggregate over the
    # fixed sf0.001 events table (constant input regardless of
    # $SPARK_GRAFT_SF_DIR, so the probe is comparable across runs) —
    # matching the scan/exchange/agg mix that dominates bench totals.
    # BASELINE.md §Box-speed says which anchor to normalize by when.
    cal_dir = "/root/testdata/sf0.001"
    from pyspark.sql import functions as F  # noqa: E402

    def _shuffle_probe() -> None:
        (
            load_table(spark, cal_dir, "events")
            .repartition(32)
            .groupBy("event_type", (F.col("user_id") % 64).alias("u"))
            .agg(F.count("*"), F.sum("value"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    _shuffle_probe()  # warm the footer/codegen caches for the probe shape
    t0 = time.perf_counter()
    for _ in range(3):
        _shuffle_probe()
    calibration_shuffle_s = round(time.perf_counter() - t0, 3)

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]

        def run() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            # queries that cache intermediates (minhash sigs, shingle
            # exploders) must not leave blocks behind to skew timings
            spark.catalog.clearCache()
            return dt

        # queries[name] = cold first run (includes plan compile +
        # codegen for this query shape); warm = second run (per-data
        # scaling signal — BASELINE.md's compile-dominance claim, made
        # measurable)
        timings[name] = round(run(), 3)
        warm[name] = round(run(), 3)

    total = round(sum(timings.values()), 3)
    warm_total = round(sum(warm.values()), 3)

    # The r4 driver failed to parse the bench line (BENCH_r04.json
    # parsed: null): cold+warm per-query maps for 32 queries overflowed
    # its stdout-tail capture. The final line is now compact — totals
    # plus a 2-decimal cold map — and the full detail (cold + warm per
    # query, calibration, env) goes to BENCH_DETAIL.json beside it.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total",
                "value": total,
                "warm_total": warm_total,
                "unit": "sec",
                "queries": timings,
                "warm": warm,
                "calibration_s": calibration_s,
                "calibration_shuffle_s": calibration_shuffle_s,
                "sf": sf,
                "sf_dir": sf_dir,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
            },
            f,
            indent=1,
        )

    # r8 hit the documented ~45-query size ceiling for the compact
    # line (the r4 overflow truncated the driver's stdout-tail capture
    # and BENCH_r04 recorded parsed: null). Cap the compact map at the
    # TOP_N slowest cold queries — the movers anyone reads first —
    # regardless of how much the headline set grows; the full cold +
    # warm maps live in BENCH_DETAIL.json.
    TOP_N = 25
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:TOP_N]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in slowest.items()},
                "warm_total": warm_total,
                "calibration_s": calibration_s,
                "calibration_shuffle_s": calibration_shuffle_s,
                "n_queries": len(timings),
                "n_reported": min(TOP_N, len(timings)),
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
