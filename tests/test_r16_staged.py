"""STAGED r16 operators (docs/ROUND15.md candidate list): implemented,
oracle-drafted, and pinned here ahead of registration — the r15 driver
window is pinned at the 16-cap, so these enter ``queries()`` /
``oracle_sql()`` at r16 open (move STAGED_R16_ORACLES entries across
and append to NEW_IN_R16).

Covers the compaction-invariance certificate (positive path, the
lost-b-dir tamper, replay-after-fold no-op) and the association-rule
face of the Apriori miner (identities + recount), plus a full
multiset-vs-oracle parity check for both at sf0.001 using the same
normalize/compare the driver-twin checker uses.
"""

from __future__ import annotations

import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"


def _oracle_rows(sql: str, sf_dir: str):
    import duckdb

    from hrfco_data_pipeline_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _multisets_match(sdf, sql, sf_dir):
    from collections import Counter

    from tools.check_oracle import row_key

    srows = sdf.collect()
    scols = sorted(sdf.columns)
    dcols_raw, drows = _oracle_rows(sql, sf_dir)
    assert scols == sorted(dcols_raw)
    assert len(srows) == len(drows)
    s_order = [sdf.columns.index(c) for c in scols]
    d_order = [dcols_raw.index(c) for c in sorted(dcols_raw)]
    assert Counter(row_key(r, s_order) for r in srows) == Counter(
        row_key(r, d_order) for r in drows
    )


def test_compaction_certificate_end_to_end_and_oracle(spark):
    from hrfco_data_pipeline_spark.oracles import STAGED_R16_ORACLES
    from hrfco_data_pipeline_spark.plans.relational import (
        stream_batch_compaction_parity,
    )

    df = stream_batch_compaction_parity(spark, SF)
    rows = df.collect()
    assert rows and all(
        r.survives_compaction and r.matches_batch_face for r in rows
    )
    _multisets_match(
        df, STAGED_R16_ORACLES["stream_batch_compaction_parity"], SF
    )


def test_compaction_flags_flip_on_lost_batch_dir(spark, tmp_path):
    """A b-dir lost between the pre-fold serve and the fold (the
    mid-compaction crash the staged swap must survive): the folded
    table diverges from BOTH the pre report and the batch face."""
    import os

    from hrfco_data_pipeline_spark.operators.dedup import _materialized
    from hrfco_data_pipeline_spark.plans.relational import (
        compaction_parity_report,
        events_type_value_counts,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import (
        _append_merge,
        compact_appended,
        ks_report_from_counts,
    )

    ev = load_table(spark, SF, "events")
    table = str(tmp_path / "store")
    _append_merge(spark, table, events_type_value_counts(ev.limit(700)), 0)
    _append_merge(
        spark,
        table,
        events_type_value_counts(ev.subtract(ev.limit(700))),
        1,
    )
    pre = _materialized(ks_report_from_counts(spark, table))
    shutil.rmtree(os.path.join(table, "b" + "0" * 11 + "1"))
    compact_appended(spark, table)
    bad = compaction_parity_report(spark, SF, table, pre).collect()
    assert not all(r.survives_compaction for r in bad)
    assert not all(r.matches_batch_face for r in bad)


def test_replay_after_compaction_noops(spark, tmp_path):
    """The fold carries the _batch_id marker, so an at-least-once
    replay of an already-folded batch must not re-append."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_type_value_counts,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import (
        _append_merge,
        compact_appended,
        read_appended,
    )

    ev = load_table(spark, SF, "events")
    counts = events_type_value_counts(ev)
    table = str(tmp_path / "store")
    _append_merge(spark, table, counts, 0)
    compact_appended(spark, table)
    before = read_appended(spark, table).agg(F.sum("c_t")).first()[0]
    _append_merge(spark, table, counts, 0)  # replayed batch id
    after = read_appended(spark, table).agg(F.sum("c_t")).first()[0]
    assert before == after


def test_assoc_rules_identities_and_oracle(spark):
    from hrfco_data_pipeline_spark.oracles import STAGED_R16_ORACLES
    from hrfco_data_pipeline_spark.plans.relational import (
        brand_assoc_rules,
        brand_itemset3_support,
    )

    df = brand_assoc_rules(spark, SF)
    rows = df.collect()
    n_triples = brand_itemset3_support(spark, SF).count()
    assert len(rows) == 3 * n_triples
    for r in rows:
        assert r.antecedent_a < r.antecedent_b
        assert r.n_abc <= r.n_antecedent
        assert 0 < r.confidence <= 1
        assert abs(r.confidence - round(r.n_abc / r.n_antecedent, 6)) < 1e-12
    _multisets_match(df, STAGED_R16_ORACLES["brand_assoc_rules"], SF)


def test_token_budget_curve_identities_and_oracle(spark):
    """Monotone in the threshold (a tighter rung drops no more than a
    looser one), token accounting closed, and the full multiset match
    against the recursive-closure oracle."""
    from hrfco_data_pipeline_spark.oracles import STAGED_R16_ORACLES
    from hrfco_data_pipeline_spark.plans.llm import (
        dedup_token_budget_curve,
    )

    df = dedup_token_budget_curve(spark, SF)
    rows = sorted(df.collect(), key=lambda r: r.threshold)
    assert [r.threshold for r in rows] == [0.3, 0.5, 0.7]
    for r in rows:
        assert r.n_docs_kept == r.n_docs_total - r.n_docs_dropped
        assert r.tokens_kept == r.tokens_total - r.tokens_dropped
        assert 0 < r.kept_token_share <= 1
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs_dropped <= a.n_docs_dropped
        assert b.tokens_dropped <= a.tokens_dropped
    # the loosest rung must actually drop something (non-vacuity)
    assert rows[0].n_docs_dropped > 0
    _multisets_match(
        df, STAGED_R16_ORACLES["dedup_token_budget_curve"], SF
    )


def test_truss_peel_identities_and_oracle(spark):
    """Two stages; integer closure (sum_support = 3*n_triangles on
    both stages — every triangle's sides live inside the stage's edge
    set); the peel shrinks or holds every rollup; full multiset match
    against the plain-SQL oracle."""
    from hrfco_data_pipeline_spark.oracles import STAGED_R16_ORACLES
    from hrfco_data_pipeline_spark.plans.relational import (
        copurchase_truss_peel,
    )

    df = copurchase_truss_peel(spark, SF)
    rows = sorted(df.collect(), key=lambda r: r.stage)
    assert [r.stage for r in rows] == [0, 1]
    for r in rows:
        assert r.sum_support == 3 * r.n_triangles
        assert r.max_support <= r.sum_support
    s0, s1 = rows
    assert s1.n_edges == s0.n_edges - s0.n_below_k
    assert s1.n_triangles <= s0.n_triangles
    assert s0.n_triangles > 0  # non-vacuity of the dense substrate
    _multisets_match(
        df, STAGED_R16_ORACLES["copurchase_truss_peel"], SF
    )


def test_jl_distortion_identities_and_oracle(spark):
    """Pair accounting (bands partition the non-degenerate adjacent
    pairs), band boundaries respected, the mass centers near ratio 1
    (the JL expectation), and the full multiset match."""
    from hrfco_data_pipeline_spark.oracles import STAGED_R16_ORACLES
    from hrfco_data_pipeline_spark.plans.llm import (
        embedding_jl_distortion,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table

    df = embedding_jl_distortion(spark, SF)
    rows = sorted(df.collect(), key=lambda r: r.band)
    assert rows
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert sum(r.n_pairs for r in rows) <= n_vecs // 2
    total_pairs = sum(r.n_pairs for r in rows)
    weighted = sum(r.sum_ratio_nano for r in rows) / total_pairs
    assert 0.5e9 < weighted < 2.0e9  # mean ratio near 1 (JL)
    for r in rows:
        assert 0 <= r.band <= 12
        if r.band < 12:
            assert r.band * 250_000_000 <= r.min_ratio_nano
            assert r.max_ratio_nano < (r.band + 1) * 250_000_000
        assert r.min_ratio_nano <= r.max_ratio_nano
        assert r.n_pairs * r.min_ratio_nano <= r.sum_ratio_nano
    _multisets_match(
        df, STAGED_R16_ORACLES["embedding_jl_distortion"], SF
    )
