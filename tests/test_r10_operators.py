"""r10 operators: exact KS against a hand-computed two-sample case,
Mann-Whitney identities (tie-free closed form + U-sum), recession
constant on a crafted decay, prefix-dim recall bounds, OOV-rate
conservation, Bloom runtime-filter guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _write_events(spark, tmp_path, rows):
    """(event_id, event_type, value) rows -> a parquet dir shaped like
    the events table (extra cols null)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    full = [(i, None, None, t, v, None) for i, t, v in rows]
    out = str(tmp_path / "events_tbl")
    spark.createDataFrame(full, schema).write.parquet(f"{out}/events.parquet")
    return out


def test_ks_hand_computed_two_sample(spark, tmp_path):
    """a = {1,2,3,4}, b = {3,4,5,6}: D = max|F_a - F_b| = 2/4 = 0.5,
    attained first at value 2 (F_a=0.5, F_b=0). Exact rational."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_ks_two_sample,
    )

    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4])] + [
        (10 + i, "b", float(v)) for i, v in enumerate([3, 4, 5, 6])
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_ks_two_sample(spark, sf).collect()}
    assert got["a"].n_t == 4 and got["a"].n_rest == 4
    assert got["a"].d_stat == 0.5
    assert got["a"].d_at_value == 2.0
    # symmetric for b (same |F| curve)
    assert got["b"].d_stat == 0.5


def test_ks_corpus_invariants(spark):
    from hrfco_data_pipeline_spark.plans.relational import (
        events_ks_two_sample,
    )

    rows = events_ks_two_sample(spark, SF001).collect()
    assert rows
    n_all = {r.n_t + r.n_rest for r in rows}
    assert len(n_all) == 1  # every type sees the same corpus
    for r in rows:
        assert 0.0 <= r.d_stat <= 1.0


def test_mann_whitney_tie_free_closed_form(spark, tmp_path):
    """a = {1,2,3}, b = {4,5,6} (no ties, total separation):
    U_a = 0, U_b = 9 = n_a*n_b, and z_b = -z_a = sqrt(3) under the
    tie-free variance n_a*n_b*(N+1)/12 = 5.25."""
    import math

    from hrfco_data_pipeline_spark.plans.relational import (
        events_mann_whitney,
    )

    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3])] + [
        (10 + i, "b", float(v)) for i, v in enumerate([4, 5, 6])
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_mann_whitney(spark, sf).collect()}
    assert got["a"].u_stat == 0.0
    assert got["b"].u_stat == 9.0
    want_z = (9.0 - 4.5) / math.sqrt(3.0 * 3.0 * 7.0 / 12.0)
    assert abs(got["b"].z_score - want_z) < 1e-12
    assert abs(got["a"].z_score + want_z) < 1e-12


def test_mann_whitney_corpus_u_bounds(spark):
    from hrfco_data_pipeline_spark.plans.relational import (
        events_mann_whitney,
    )

    rows = events_mann_whitney(spark, SF001).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.u_stat <= float(r.n_t * r.n_rest)
        assert abs(r.z_score) < 50.0  # finite, sane scale


def test_recession_constant_on_crafted_decay(spark):
    """Invariants at sf0.001: every k strictly in (0, 1) (ratios of a
    strictly falling positive series), steepest <= median, and every
    station with >= 1 recession day appears."""
    from hrfco_data_pipeline_spark.plans.hydro import recession_constant

    rows = recession_constant(spark, SF001).collect()
    assert rows
    for r in rows:
        assert r.n_recessions >= 1
        assert 0.0 < r.k_steepest <= r.k_median < 1.0


def test_prefix_dim_recall_bounds(spark):
    from hrfco_data_pipeline_spark.plans.llm import ann_prefix_dim_recall

    rows = ann_prefix_dim_recall(spark, SF001).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overlap <= 10
        assert r.recall_at_10 == r.n_overlap / 10.0
    # truncation must preserve a meaningful share of neighbours on
    # this corpus (the metric's reason to exist)
    assert sum(r.n_overlap for r in rows) > 0


def test_oov_rate_conservation(spark):
    """Per-segment token counts must sum to the corpus total, and a
    top-1000 vocab over a small corpus covers most occurrences."""
    from hrfco_data_pipeline_spark.plans.llm import _tokens, docs_oov_rate
    from hrfco_data_pipeline_spark.sources.tables import load_table

    rows = docs_oov_rate(spark, SF001).collect()
    assert rows
    total = (
        load_table(spark, SF001, "documents")
        .select(F.explode(_tokens()).alias("t"))
        .count()
    )
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_rate == r.n_oov / r.n_tokens


def test_bloom_prune_no_false_negatives_and_sizing(spark):
    """Bloom guarantees: every exact match passes the filter
    (n_bloom_pass >= n_exact, n_false_pos = pass - exact), and the
    m=2^16/k=3 sizing keeps the FP rate tiny at this key count."""
    from hrfco_data_pipeline_spark.plans.relational import (
        lineitem_bloom_semijoin_prune,
    )

    r = lineitem_bloom_semijoin_prune(spark, SF001).collect()[0]
    assert r.n_dim_keys > 0 and r.n_exact > 0
    assert r.n_bloom_pass >= r.n_exact
    assert r.n_false_pos == r.n_bloom_pass - r.n_exact
    assert r.fp_rate < 0.05
