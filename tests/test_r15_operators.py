"""Round-15 operators: streaming↔batch parity certificates for the
KS-drift, TV-drift, SCD2-ingest, bigram-LM, and watermark-lateness
maintainers (the last five pytest-only maintainers, promoted to
driver-gated certificates per VERDICT r14 'Next round' #2).

Each certificate serves its report FROM THE STREAMING STORE next to a
matches-batch-face flag; these tests pin (a) the positive path — a
correctly-built store reads all-true — and (b) NON-VACUOUSNESS: a
tampered store (double-applied batch / corrupted partial) flips the
flag, so the green driver row certifies real parity, not a constant
TRUE (the r13/r14 tampered-store convention).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"


def test_ks_parity_flag_flips_on_double_applied_batch(spark, tmp_path):
    """A re-appended count partial double-counts its values: both
    ECDFs shift and the exact-rational D statistic breaks."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_type_value_counts,
        ks_parity_report,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import _append_merge

    ev = load_table(spark, SF, "events")
    table = str(tmp_path / "store")
    _append_merge(spark, table, events_type_value_counts(ev), 0)
    ok = ks_parity_report(spark, SF, table).collect()
    assert ok and all(r.matches_batch_face for r in ok)

    _append_merge(
        spark, table, events_type_value_counts(ev.limit(300)), 1
    )
    bad = ks_parity_report(spark, SF, table).collect()
    assert not all(r.matches_batch_face for r in bad)


def test_tv_parity_flag_flips_on_double_applied_batch(spark, tmp_path):
    """A re-appended bucket partial inflates one source's counts and
    total: every pair touching it drifts."""
    from hrfco_data_pipeline_spark.plans.llm import (
        source_bucket_counts,
        tv_parity_report,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import _append_merge

    docs = load_table(spark, SF, "documents")
    table = str(tmp_path / "store")
    _append_merge(spark, table, source_bucket_counts(docs), 0)
    ok = tv_parity_report(spark, SF, table).collect()
    assert ok and all(r.matches_batch_face for r in ok)

    _append_merge(spark, table, source_bucket_counts(docs.limit(40)), 1)
    bad = tv_parity_report(spark, SF, table).collect()
    assert not all(r.matches_batch_face for r in bad)


def test_scd2_parity_flag_flips_on_duplicated_orders(spark, tmp_path):
    """A re-appended order batch duplicates rows: n_orders inflates
    (and a duplicated boundary order can re-split a regime)."""
    from hrfco_data_pipeline_spark.plans.relational import (
        scd2_parity_report,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import _append_merge

    keep = ["o_custkey", "o_orderkey", "o_orderpriority", "o_orderdate"]
    orders = load_table(spark, SF, "orders").select(*keep)
    table = str(tmp_path / "store")
    _append_merge(spark, table, orders, 0)
    ok = scd2_parity_report(spark, SF, table).collect()
    assert ok and all(r.matches_batch_face for r in ok)

    _append_merge(spark, table, orders.limit(10), 1)
    bad = scd2_parity_report(spark, SF, table).collect()
    assert not all(r.matches_batch_face for r in bad)


def test_lm_parity_flag_flips_on_double_merged_batch(spark, tmp_path):
    """A double-merged batch inflates its bigram counts: the global
    checksums (and possibly the top-20 ranks) break."""
    from hrfco_data_pipeline_spark.plans.llm import lm_parity_report
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import (
        bigram_counts,
        merge_lm_counts,
    )

    docs = load_table(spark, SF, "documents")
    table = str(tmp_path / "store")
    merge_lm_counts(spark, table, bigram_counts(docs), 0)
    ok = lm_parity_report(spark, SF, table).collect()
    assert ok and all(r.matches_batch_face for r in ok)

    merge_lm_counts(spark, table, bigram_counts(docs.limit(3)), 1)
    bad = lm_parity_report(spark, SF, table).collect()
    assert not all(r.matches_batch_face for r in bad)


def test_lateness_parity_flag_flips_on_corrupted_sample(spark, tmp_path):
    """A corrupted sample batch (an injected extreme lateness row)
    shifts the stored-sample ranks for its type: the estimate arms and
    the flag must break, while the exact arms stay intact (the flag is
    the conjunction). Build the positive store as ONE batch — a single
    micro-batch IS the full arrival order, so its in-batch prefix
    window equals the global high-water chain."""
    import os

    from hrfco_data_pipeline_spark.plans.relational import (
        lateness_parity_report,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import (
        _append_merge,
        lateness_state_update,
    )

    ev = load_table(spark, SF, "events")
    table = str(tmp_path / "store")
    lateness_state_update(spark, table, ev, 0)
    ok = lateness_parity_report(spark, SF, table).collect()
    assert ok and all(r.matches_batch_face for r in ok)

    et = ok[0].event_type
    junk = spark.createDataFrame(
        [(et, 10_000_000_000_000)], "event_type string, lateness_us long"
    )
    _append_merge(spark, os.path.join(table, "sample"), junk, 1)
    bad = {
        r.event_type: r
        for r in lateness_parity_report(spark, SF, table).collect()
    }
    assert not bad[et].matches_batch_face
    # exact arms came from the untouched partials table
    good = {r.event_type: r for r in ok}
    assert bad[et].n == good[et].n
    assert bad[et].max_us == good[et].max_us


def test_ks_streaming_certificate_end_to_end(spark):
    """The full availableNow certificate run at sf0.001: real file
    micro-batches through ks_drift_stream, served from the store —
    every row true (the driver-shaped positive path)."""
    from hrfco_data_pipeline_spark.plans.relational import (
        stream_batch_ks_parity,
    )

    rows = stream_batch_ks_parity(spark, SF).collect()
    assert rows and all(r.matches_batch_face for r in rows)


def test_tv_streaming_certificate_end_to_end(spark):
    from hrfco_data_pipeline_spark.plans.llm import stream_batch_tv_parity

    rows = stream_batch_tv_parity(spark, SF).collect()
    assert rows and all(r.matches_batch_face for r in rows)


def test_scd2_streaming_certificate_end_to_end(spark):
    from hrfco_data_pipeline_spark.plans.relational import (
        stream_batch_scd2_parity,
    )

    rows = stream_batch_scd2_parity(spark, SF).collect()
    assert rows and all(r.matches_batch_face for r in rows)


def test_lm_streaming_certificate_end_to_end(spark):
    from hrfco_data_pipeline_spark.plans.llm import stream_batch_lm_parity

    rows = stream_batch_lm_parity(spark, SF).collect()
    assert rows and all(r.matches_batch_face for r in rows)


def test_lateness_streaming_certificate_end_to_end(spark):
    """The ordered-runner path: 4 contiguous event_id ranges replayed
    oldest-first (run_parity_stream_ordered) — the per-batch prefix +
    stored-mark chain must reproduce the batch face exactly."""
    from hrfco_data_pipeline_spark.plans.relational import (
        stream_batch_lateness_parity,
    )

    rows = stream_batch_lateness_parity(spark, SF).collect()
    assert rows and all(r.matches_batch_face for r in rows)


def test_ivf_pq_agreement_identities(spark):
    """Counting identities on the contingency rollup: per-cell
    n_codes_used ≤ 16, top_code_n ≤ n_vecs, Σ n_vecs = n_total; λ in
    [0, 1] and consistent with the modal sums."""
    from hrfco_data_pipeline_spark.plans.llm import ann_ivf_pq_agreement

    rows = ann_ivf_pq_agreement(spark, SF).collect()
    assert rows
    n_total = rows[0].n_total
    assert sum(r.n_vecs for r in rows) == n_total
    lam = rows[0].lambda_cell_to_code
    assert all(r.lambda_cell_to_code == lam for r in rows)
    assert 0.0 <= lam <= 1.0
    for r in rows:
        assert 1 <= r.n_codes_used <= 16
        assert 0 <= r.top_code <= 15
        assert 1 <= r.top_code_n <= r.n_vecs


def test_rising_limb_lead_time_consistent_with_charts(spark):
    """The lead-time row per station must equal the recomputed first
    firing days of the two underlying certified charts."""
    from hrfco_data_pipeline_spark.plans.hydro import (
        alerts,
        rising_limb_lead_time,
        station_ewma_chart,
    )

    got = {r.wlobscd: r for r in rising_limb_lead_time(spark, SF).collect()}
    assert got
    ewma = station_ewma_chart(spark, SF).collect()
    first_high = {}
    for r in ewma:
        if r.is_high:
            d = first_high.get(r.wlobscd)
            first_high[r.wlobscd] = min(d, r.day) if d else r.day
    al = alerts(spark, SF).collect()
    first_ladder = {}
    for r in al:
        if (
            r.warning_level in ("ATTENTION", "CAUTION", "WARNING", "CRITICAL")
            and r.observation_time is not None
        ):
            d = r.observation_time[:10]
            p = first_ladder.get(r.observation_code)
            first_ladder[r.observation_code] = min(p, d) if p else d
    assert set(got) == set(first_high) | set(first_ladder)
    from datetime import date

    for st, r in got.items():
        assert r.first_high_day == first_high.get(st)
        assert r.first_ladder_day == first_ladder.get(st)
        if r.first_high_day and r.first_ladder_day:
            a = date.fromisoformat(r.first_high_day)
            b = date.fromisoformat(r.first_ladder_day)
            assert r.lead_days == (b - a).days
        else:
            assert r.lead_days is None


def test_dedup_rate_by_snapshot_identities(spark):
    """Arrivals partition across steps; kept + dropped_near = arrived;
    exact drops never exceed near drops in total (exact dups with ≥ 5
    tokens are Jaccard-1 cluster mates); cum_kept telescopes."""
    from hrfco_data_pipeline_spark.plans.llm import dedup_rate_by_snapshot
    from hrfco_data_pipeline_spark.sources.tables import load_table

    rows = sorted(
        dedup_rate_by_snapshot(spark, SF).collect(), key=lambda r: r.step
    )
    assert [r.step for r in rows] == [0, 1, 2]
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_arrived for r in rows) == n_docs
    cum = 0
    for r in rows:
        assert r.n_kept == r.n_arrived - r.n_dropped_near
        cum += r.n_kept
        assert r.cum_kept == cum
    # the pair graph is non-empty at this SF, so SOME drop must show
    assert sum(r.n_dropped_near for r in rows) > 0


def test_source_halves_drift_bounds_and_grid(spark):
    """One row per source; TV in [0, 1]; token counts partition each
    source's total token count."""
    from pyspark.sql import functions as F

    from hrfco_data_pipeline_spark.plans.llm import (
        _tokens,
        docs_source_halves_drift,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table

    rows = {r.source: r for r in docs_source_halves_drift(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    want = {
        r.source: r.n
        for r in docs.select(
            "source", F.size(_tokens()).alias("n")
        ).groupBy("source").agg(F.sum("n").alias("n")).collect()
    }
    assert set(rows) == set(want)
    for src, r in rows.items():
        assert r.n_toks_even + r.n_toks_odd == want[src]
        if r.tv_distance is not None:
            assert 0.0 <= r.tv_distance <= 1.0


def test_quantize_bit_sweep_monotone(spark):
    """More bits never increase reconstruction error: sum_qerr and
    max_qerr are non-increasing in bit width, and the 8-bit arm's
    codes match embedding_quantize's scheme (levels = 127)."""
    from hrfco_data_pipeline_spark.plans.llm import (
        embedding_quantize_bit_sweep,
    )

    rows = sorted(
        embedding_quantize_bit_sweep(spark, SF).collect(),
        key=lambda r: r.bits,
    )
    assert [(r.bits, r.levels) for r in rows] == [
        (2, 1), (4, 7), (6, 31), (8, 127)
    ]
    n = rows[0].n_vecs
    assert all(r.n_vecs == n for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a.sum_qerr >= b.sum_qerr
        assert a.max_qerr >= b.max_qerr
    assert rows[0].sum_qerr > rows[-1].sum_qerr  # the curve is real


def test_session_parity_flag_flips_on_double_applied_fragments(
    spark, tmp_path
):
    """A re-appended fragment batch double-counts every session's
    events (and can inflate n_sessions via duplicate fragments being
    absorbed): max_session_events breaks."""
    from hrfco_data_pipeline_spark.plans.relational import (
        session_fragments,
        session_parity_report,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import _append_merge

    ev = load_table(spark, SF, "events")
    table = str(tmp_path / "store")
    _append_merge(spark, table, session_fragments(ev), 0)
    ok = session_parity_report(spark, SF, table).collect()
    assert ok and all(r.matches_batch_face for r in ok)

    _append_merge(spark, table, session_fragments(ev.limit(500)), 1)
    bad = session_parity_report(spark, SF, table).collect()
    assert not all(r.matches_batch_face for r in bad)


def test_session_fragments_merge_invariant_under_splits(spark):
    """The gap-closure claim itself: fragments computed over ANY
    partition of the events (here: 3 hash classes of event_id — a
    worst case that interleaves every user's timeline across frames)
    merge back to exactly the batch face's per-user rollup."""
    from pyspark.sql import functions as F

    from hrfco_data_pipeline_spark.plans.relational import (
        events_sessionize,
        session_fragments,
        sessions_from_fragments,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    parts = [
        session_fragments(ev.filter(F.col("event_id") % 3 == i))
        for i in range(3)
    ]
    frags = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = {
        r.user_id: (r.n_sessions, r.max_session_events)
        for r in sessions_from_fragments(frags).collect()
    }
    batch = {
        r.user_id: (r.n_sessions, r.max_session_events)
        for r in events_sessionize(spark, SF).collect()
    }
    assert merged == batch


def test_session_streaming_certificate_end_to_end(spark):
    """The full availableNow certificate run at sf0.001: real file
    micro-batches through session_fragment_stream, fragment store
    merged on read — every row true."""
    from hrfco_data_pipeline_spark.plans.relational import (
        stream_batch_session_parity,
    )

    rows = stream_batch_session_parity(spark, SF).collect()
    assert rows and all(r.matches_batch_face for r in rows)


def test_itemset3_apriori_identities(spark):
    """Support monotonicity (n_abc <= weakest sub-pair <= weakest
    singleton), canonical item order, the integer minsup bar, and a
    direct recount of the top triple's support."""
    from pyspark.sql import functions as F

    from hrfco_data_pipeline_spark.plans.relational import (
        brand_itemset3_support,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table

    rows = brand_itemset3_support(spark, SF).collect()
    assert rows
    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = ob.select(F.countDistinct("l_orderkey")).first()[0]
    for r in rows:
        assert r.brand_a < r.brand_b < r.brand_c
        assert r.n_abc <= r.min_pair_support
        assert r.min_pair_support <= min(r.n_a, r.n_b, r.n_c)
        assert 10000 * r.n_abc >= 35 * n_orders
    top = max(rows, key=lambda r: (r.n_abc, r.brand_a, r.brand_b, r.brand_c))
    tri = set((top.brand_a, top.brand_b, top.brand_c).__iter__())
    recount = (
        ob.filter(F.col("p_brand").isin(list(tri)))
        .groupBy("l_orderkey")
        .agg(F.countDistinct("p_brand").alias("k"))
        .filter(F.col("k") == 3)
        .count()
    )
    assert recount == top.n_abc
