"""Unit tests for the operators added in round 13.

Each plan-level test recomputes the expected answer in pure Python
over a tiny hand-built frame, so a Spark-side regression cannot hide
behind an oracle that shares the same mistake."""

from __future__ import annotations


def _write_docs(spark, tmp_path, rows, name="docs_tbl"):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / name)
    docs.write.parquet(f"{out}/documents.parquet")
    return out


def test_dedup_survivor_length_bias_recompute(spark, tmp_path):
    """Keep-lowest-id per content hash; kept/dropped token means per
    source recomputed by hand. Source s1's only kept doc is unique
    content; its duplicate of s0's doc is dropped."""
    from hrfco_data_pipeline_spark.plans.llm import dedup_survivor_length_bias

    rows = [
        (1, "a b c", "en", "s0", 5),
        (2, "a b c", "en", "s0", 5),      # dup of 1 -> dropped
        (3, "x y", "en", "s0", 3),
        (4, "a b c", "en", "s1", 5),      # dup of 1 -> dropped
        (5, "p q r s", "en", "s1", 7),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {
        r.source: r for r in dedup_survivor_length_bias(spark, out).collect()
    }
    s0, s1 = got["s0"], got["s1"]
    assert (s0.n_docs, s0.n_kept, s0.n_dropped) == (3, 2, 1)
    assert (s0.toks_kept, s0.toks_dropped) == (3 + 2, 3)
    assert s0.mean_toks_kept == 5 / 2 and s0.mean_toks_dropped == 3.0
    assert (s1.n_docs, s1.n_kept, s1.n_dropped) == (2, 1, 1)
    assert s1.mean_toks_kept == 4.0 and s1.mean_toks_dropped == 3.0


def test_dedup_survivor_length_bias_no_drops_null_mean(spark, tmp_path):
    from hrfco_data_pipeline_spark.plans.llm import dedup_survivor_length_bias

    rows = [(1, "a b", "en", "s0", 3), (2, "c d e", "en", "s0", 5)]
    out = _write_docs(spark, tmp_path, rows)
    (r,) = dedup_survivor_length_bias(spark, out).collect()
    assert r.n_dropped == 0 and r.mean_toks_dropped is None


def test_cross_source_dup_matrix_recompute(spark, tmp_path):
    """Grid completeness (every source pair present, zero overlaps as
    n_shared=0) + hand-checked shared-hash counts."""
    from hrfco_data_pipeline_spark.plans.llm import docs_cross_source_dup_matrix

    rows = [
        (1, "a b c", "en", "s0", 5),
        (2, "x y", "en", "s0", 3),
        (3, "a b c", "en", "s1", 5),      # shared with s0
        (4, "p q r s", "en", "s1", 7),
        (5, "only here", "en", "s2", 9),  # no overlap with anyone
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {
        (r.source_a, r.source_b): r
        for r in docs_cross_source_dup_matrix(spark, out).collect()
    }
    assert set(got) == {("s0", "s1"), ("s0", "s2"), ("s1", "s2")}
    r01 = got[("s0", "s1")]
    assert (r01.hashes_a, r01.hashes_b, r01.n_shared) == (2, 2, 1)
    assert r01.jaccard == 1 / 3
    assert got[("s0", "s2")].n_shared == 0
    assert got[("s0", "s2")].jaccard == 0.0


def test_dedup_incremental_certificate_recompute(spark, tmp_path):
    """3-step replay vs one-shot on a frame where a later step
    re-crawls earlier content: step 1 and step 2 arrivals duplicate
    step-0 docs, so only step 0 keeps survivors."""
    from hrfco_data_pipeline_spark.plans.llm import dedup_incremental_certificate

    # step = doc_id % 3
    rows = [
        (3, "d one", "en", "s0", 5),   # step 0
        (6, "d two", "en", "s0", 5),   # step 0
        (4, "d one", "en", "s0", 5),   # step 1, dup of 3
        (5, "d two", "en", "s0", 5),   # step 2, dup of 6
        (7, "d three", "en", "s0", 7),  # step 1, fresh
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r.step: r for r in dedup_incremental_certificate(spark, out).collect()}
    assert (got[0].n_arrived, got[0].n_incremental, got[0].n_oneshot) == (2, 2, 2)
    assert (got[1].n_arrived, got[1].n_incremental, got[1].n_oneshot) == (2, 1, 1)
    assert (got[2].n_arrived, got[2].n_incremental, got[2].n_oneshot) == (1, 0, 0)
    assert all(r.replay_matches_oneshot for r in got.values())
    assert all(r.n_agree == r.n_incremental for r in got.values())


# Chain fixture: doc 3 bridges docs 1 and 2. 14 tokens -> ten 5-token
# shingles; overlap counts give J(1,3)=J(2,3)=7/13 >= 0.5 but
# J(1,2)=4/16=0.25 < 0.5 — a pure chain.
_MID = [f"m{i}" for i in range(4, 12)]          # 8 shared mid tokens
_DOC_A = ["a1", "a2", "a3"] + _MID + ["z1", "z2", "z3"]
_DOC_C = ["c1", "c2", "c3"] + _MID + ["w1", "w2", "w3"]
_DOC_B = ["a1", "a2", "a3"] + _MID + ["w1", "w2", "w3"]


def test_dedup_chaining_audit_recompute(spark, tmp_path):
    """Pairwise-shadow drops only doc 3 (the bridge is each pair's
    doc_b); component closure also drops doc 2 — n_chain_only = 1."""
    from hrfco_data_pipeline_spark.plans.llm import dedup_chaining_audit

    rows = [
        (1, " ".join(_DOC_A), "en", "s0", 1),
        (2, " ".join(_DOC_C), "en", "s0", 1),
        (3, " ".join(_DOC_B), "en", "s0", 1),
    ]
    out = _write_docs(spark, tmp_path, rows)
    (r,) = dedup_chaining_audit(spark, out).collect()
    assert r.n_docs == 3
    assert r.n_pairs == 2                      # (1,3), (2,3) at >= 0.5
    assert r.n_dropped_pairwise == 1           # {3}
    assert r.n_dropped_chained == 2            # {2, 3}
    assert r.n_chain_only == 1
    assert (r.n_components, r.max_component_size) == (1, 3)


def test_lsh_band_tradeoff_recompute(spark, tmp_path):
    """Expected-detection sums recomputed in pure Python with the same
    repeated-squaring float chains over the three exact jaccards
    (7/13, 7/13, 4/16)."""
    from hrfco_data_pipeline_spark.plans.llm import lsh_band_tradeoff_curve

    rows = [
        (1, " ".join(_DOC_A), "en", "s0", 1),
        (2, " ".join(_DOC_C), "en", "s0", 1),
        (3, " ".join(_DOC_B), "en", "s0", 1),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {
        (r.bands, r.rows_per_band): r
        for r in lsh_band_tradeoff_curve(spark, out).collect()
    }

    def sq(x, times):
        for _ in range(times):
            x = x * x
        return x

    jacs = [7 / 13, 7 / 13, 4 / 16]
    import math

    for (b, r_), (r_sq, b_sq) in {(32, 4): (2, 5), (16, 8): (3, 4),
                                  (8, 16): (4, 3)}.items():
        ps = [1.0 - sq(1.0 - sq(s, r_sq), b_sq) for s in jacs]
        row = got[(b, r_)]
        assert row.n_pairs == 3
        assert row.expected_detected_nanos == sum(
            math.floor(p * 1e9) for p in ps
        )
        assert row.n_past_half_detection == sum(1 for p in ps if p >= 0.5)


def _minute(s):
    if s is None or len(s) < 16:
        return None
    hh, mm = s[11:13], s[14:16]
    if not (hh.isdigit() and mm.isdigit()):
        return None
    return int(hh) * 60 + int(mm)


def test_hydro_flashiness_recompute(spark):
    """sf0.001: recompute every station's Σ|Δ| (in-day folds + cross-
    midnight boundaries) and Σlevel in pure Python from the same
    classified substrate — the fold/window plumbing is under test, so
    the recompute sorts plain Python lists."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from hrfco_data_pipeline_spark.plans.hydro import (
        classified,
        flashiness_index,
    )

    sf = "/root/testdata/sf0.001"
    base = (
        classified(spark, sf)
        .filter(F.col("water_level").isNotNull())
        .select(
            "wlobscd",
            "obs_time_str",
            F.round(F.col("water_level") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    by = defaultdict(lambda: defaultdict(list))
    for r in base:
        t = _minute(r.obs_time_str)
        if t is None:
            continue
        by[r.wlobscd][r.obs_time_str[:10]].append((t, r.cents))
    got = {r.wlobscd: r for r in flashiness_index(spark, sf).collect()}
    assert set(got) == set(by) and got
    for st, days in by.items():
        total_abs = n = s = 0
        prev_last = None
        for day in sorted(days):
            arr = sorted(days[day])
            n += len(arr)
            s += sum(v for _, v in arr)
            if prev_last is not None:
                total_abs += abs(arr[0][1] - prev_last)
            total_abs += sum(
                abs(arr[i][1] - arr[i - 1][1]) for i in range(1, len(arr))
            )
            prev_last = arr[-1][1]
        r = got[st]
        assert (r.n_obs, r.sum_abs_delta_cents, r.sum_level_cents) == (
            n, total_abs, s,
        )
        if s > 0:
            assert r.flashiness == total_abs / s
        else:
            assert r.flashiness is None


def test_hydro_flood_volume_recompute(spark):
    """sf0.001: per-station twice-volume (trapezoid over in-day
    exceedance) recomputed in pure Python; days integrate
    independently."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from hrfco_data_pipeline_spark.plans.hydro import classified, flood_volume

    sf = "/root/testdata/sf0.001"
    base = (
        classified(spark, sf)
        .filter(
            F.col("water_level").isNotNull()
            & F.col("station_found")
            & F.col("attwl").isNotNull()
            & (F.col("attwl") > 0)
        )
        .select(
            "wlobscd",
            "obs_time_str",
            (
                F.greatest(
                    F.round(F.col("water_level") * 100).cast("long")
                    - F.round(F.col("attwl") * 100).cast("long"),
                    F.lit(0).cast("long"),
                )
            ).alias("e"),
        )
        .collect()
    )
    by = defaultdict(lambda: defaultdict(list))
    for r in base:
        t = _minute(r.obs_time_str)
        if t is None:
            continue
        by[r.wlobscd][r.obs_time_str[:10]].append((t, r.e))
    got = {r.wlobscd: r for r in flood_volume(spark, sf).collect()}
    assert set(got) == set(by) and got
    for st, days in by.items():
        n = n_ex = mx = vol2 = 0
        for day in days:
            arr = sorted(days[day])
            n += len(arr)
            n_ex += sum(1 for _, v in arr if v > 0)
            mx = max([mx] + [v for _, v in arr])
            vol2 += sum(
                (arr[i][0] - arr[i - 1][0]) * (arr[i][1] + arr[i - 1][1])
                for i in range(1, len(arr))
            )
        r = got[st]
        assert (r.n_obs, r.n_exceed_obs) == (n, n_ex)
        assert r.max_exceed_cents == mx
        assert r.twice_volume_cents_min == vol2


def _write_events(spark, tmp_path, rows, name="ev_tbl"):
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    out = str(tmp_path / name)
    ev.write.parquet(f"{out}/events.parquet")
    return out


def test_bot_regularity_screen_recompute(spark, tmp_path):
    """Metronome user (25 events, 60 s apart) flags; a jittered user
    (>=10 gaps) appears with the hand-computed CV²; a 5-event user is
    absent."""
    from datetime import datetime, timedelta

    from hrfco_data_pipeline_spark.plans.relational import (
        events_bot_regularity_screen,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(25):                      # user 1: perfect metronome
        rows.append((eid, t0 + timedelta(seconds=60 * i), 1, "view", 1.0, "{}"))
        eid += 1
    jitter = [30, 90, 30, 90, 30, 90, 30, 90, 30, 90, 30]
    t = t0
    for g in jitter:                         # user 2: 11 jittered gaps
        rows.append((eid, t, 2, "view", 1.0, "{}"))
        t += timedelta(seconds=g)
        eid += 1
    rows.append((eid, t, 2, "view", 1.0, "{}"))
    eid += 1
    for i in range(5):                       # user 3: too few gaps
        rows.append((eid, t0 + timedelta(seconds=7 * i), 3, "view", 1.0, "{}"))
        eid += 1
    out = _write_events(spark, tmp_path, rows)
    got = {r.user_id: r for r in events_bot_regularity_screen(spark, out).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1.n_gaps, r1.mean_gap_s, r1.cv2) == (24, 60.0, 0.0)
    assert r1.is_regular_bot
    r2 = got[2]
    n, s1 = len(jitter), sum(jitter)
    s2 = sum(g * g for g in jitter)
    assert (r2.n_gaps, r2.mean_gap_s) == (n, s1 / n)
    assert r2.cv2 == (n * s2 - s1 * s1) / (s1 * s1)
    assert not r2.is_regular_bot             # n_gaps < 20


def test_ewma_control_recompute(spark, tmp_path):
    """[1, 1, 10] daily counts: day-3 forecast is 1.0, so 10 > 2·1
    spikes; [4, 2, 6] never does (6 is not > 2·3)."""
    from datetime import datetime, timedelta

    from hrfco_data_pipeline_spark.plans.relational import events_ewma_control

    t0 = datetime(2024, 3, 1, 12, 0)
    rows = []
    eid = 0
    for day, cnt in enumerate([1, 1, 10]):
        for _ in range(cnt):
            rows.append((eid, t0 + timedelta(days=day), 1, "a", 1.0, "{}"))
            eid += 1
    for day, cnt in enumerate([4, 2, 6]):
        for _ in range(cnt):
            rows.append((eid, t0 + timedelta(days=day), 1, "b", 1.0, "{}"))
            eid += 1
    out = _write_events(spark, tmp_path, rows)
    got = {
        (r.event_type, str(r.day)): r
        for r in events_ewma_control(spark, out).collect()
    }
    a1 = got[("a", "2024-03-01")]
    assert a1.ewma_prev is None and a1.is_spike is None
    a2 = got[("a", "2024-03-02")]
    assert a2.ewma_prev == 1.0 and not a2.is_spike
    a3 = got[("a", "2024-03-03")]
    assert a3.ewma_prev == 1.0 and a3.is_spike
    b3 = got[("b", "2024-03-03")]
    assert b3.ewma_prev == (4 + 2) / 2 and not b3.is_spike  # 6 > 6 is False


def test_quantile_sketch_error_contract(spark, tmp_path):
    """200 distinct values per type: the GK guarantee must hold for
    both percentiles and the exact n must come through."""
    from datetime import datetime, timedelta

    from hrfco_data_pipeline_spark.plans.relational import (
        events_quantile_sketch_error,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), i % 7, "x", float(i), "{}")
        for i in range(200)
    ]
    out = _write_events(spark, tmp_path, rows)
    got = events_quantile_sketch_error(spark, out).collect()
    assert {(r.p_pct) for r in got} == {50, 90}
    assert all(r.n == 200 for r in got)
    assert all(r.within_rank_tolerance for r in got)


def test_supplier_share_drift_recompute(spark, tmp_path):
    """Brand with a wholesale supplier swap between halves reads
    TV = 1.0; a stable single-supplier brand reads 0.0."""
    from datetime import datetime

    from hrfco_data_pipeline_spark.plans.relational import supplier_share_drift

    part = spark.createDataFrame(
        [(1, "pa", "B1", "T", 1, 10.0), (2, "pb", "B2", "T", 1, 10.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    d0, d1 = datetime(2024, 1, 1), datetime(2024, 1, 11)
    li_rows = [
        # B1: supplier 10 only in first half, supplier 20 only in second
        (1, 1, 10, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d0),
        (2, 1, 20, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d1),
        # B2: same supplier both halves, equal revenue
        (3, 2, 30, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", d0),
        (4, 2, 30, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", d1),
    ]
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    )
    out = str(tmp_path / "drift_tbl")
    part.write.parquet(f"{out}/part.parquet")
    li.write.parquet(f"{out}/lineitem.parquet")
    got = {r.p_brand: r for r in supplier_share_drift(spark, out).collect()}
    assert got["B1"].tv_share_drift == 1.0
    assert got["B1"].n_suppliers == 2
    assert got["B2"].tv_share_drift == 0.0
    assert got["B2"].rev1_hcents == 50.0 * 10000


def test_wire_dedup_replay_invariants(spark):
    """sf0.001: the %11 fixture makes delivered/unique/dropped exactly
    reconstructible from the parsed frame; no payload conflicts by
    construction."""
    from pyspark.sql import functions as F

    from hrfco_data_pipeline_spark.plans.wire import (
        wire_dedup_replay,
        wire_parse,
    )

    sf = "/root/testdata/sf0.001"
    parsed = wire_parse(spark, sf)
    n_parsed = parsed.count()
    n_elevens = parsed.filter(F.col("obs_id") % 11 == 0).count()
    rows = wire_dedup_replay(spark, sf).collect()
    assert sum(r.n_delivered for r in rows) == n_parsed + n_elevens
    assert sum(r.n_unique for r in rows) == n_parsed
    assert sum(r.n_dups_dropped for r in rows) == n_elevens
    assert all(r.n_conflicting_payloads == 0 for r in rows)
    for r in rows:
        assert r.dup_rate == r.n_dups_dropped / r.n_delivered


def test_tokenizer_fertility_recompute(spark, tmp_path):
    """Hand corpus where the top pair is 'ab': symbol counts after the
    merge recomputed by hand per source."""
    from hrfco_data_pipeline_spark.plans.llm import docs_tokenizer_fertility

    rows = [
        (1, "abab abba", "en", "s0", 9),
        (2, "cd ab", "en", "s1", 5),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r.source: r for r in docs_tokenizer_fertility(spark, out).collect()}
    # pair counts (per word occurrence): 'abab': ab,ba,ab; 'abba':
    # ab,bb,ba; 'cd': cd; 'ab': ab -> ab=4 wins
    s0 = got["s0"]
    # s0 vocab: abab (4 chars -> 2 syms), abba (4 chars -> 3 syms:
    # ab + b + a ... replace('abba','ab',SEP) = SEP + 'ba' = 3)
    assert (s0.n_vocab, s0.n_words) == (2, 2)
    assert (s0.n_chars, s0.n_syms) == (8, 2 + 3)
    assert s0.syms_per_100_chars == 5 / 8 * 100.0
    s1 = got["s1"]
    assert (s1.n_chars, s1.n_syms) == (4, 2 + 1)


def test_ann_recall_by_occupancy_consistency(spark):
    """sf0.001: the per-cell grid must tile the corpus and the query
    set exactly, and per-cell hit sums must re-aggregate to the
    recall report's total."""
    from hrfco_data_pipeline_spark.plans.llm import (
        ann_ivf_recall_report,
        ann_recall_by_occupancy,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = ann_recall_by_occupancy(spark, sf).collect()
    n_emb = load_table(spark, sf, "embeddings").count()
    rep = ann_ivf_recall_report(spark, sf).collect()
    assert sum(r.n_vecs for r in rows) == n_emb
    assert sum(r.n_queries for r in rows) == len(rep)
    assert sum(r.sum_hits for r in rows) == sum(r.n_hits for r in rep)
    for r in rows:
        if r.n_queries:
            assert r.recall_at_5 == r.sum_hits / (5 * r.n_queries)
        else:
            assert r.recall_at_5 is None


def test_stream_batch_cms_parity_certificate(spark):
    """sf0.001: the streaming-store-served heavy hitters must match
    the batch face row for row (flag true on all 20 rows)."""
    from hrfco_data_pipeline_spark.plans.llm import stream_batch_cms_parity

    rows = stream_batch_cms_parity(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    assert all(r.matches_batch_face for r in rows)
    assert all(r.inflation >= 0 for r in rows)  # CMS never underestimates


def test_stream_batch_psi_parity_certificate(spark):
    """sf0.001: the PSI report served from the streaming store must
    match events_psi_by_type row for row."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_psi_by_type,
        stream_batch_psi_parity,
    )

    sf = "/root/testdata/sf0.001"
    rows = stream_batch_psi_parity(spark, sf).collect()
    batch = {r.event_type: r for r in events_psi_by_type(spark, sf).collect()}
    assert len(rows) == len(batch) > 0
    for r in rows:
        assert r.matches_batch_face
        b = batch[r.event_type]
        assert (r.n_first, r.n_second, r.psi) == (b.n_first, b.n_second, b.psi)


def test_cms_parity_flag_flips_on_tampered_store(spark, tmp_path):
    """Non-vacuousness of the CMS parity certificate: a correct store
    (batch partials appended exactly-once) reads all-true; doubling
    every counter cell (a double-applied batch) flips the flag."""
    from hrfco_data_pipeline_spark.plans.llm import (
        cms_parity_report,
        cms_counters,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import _append_merge

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    table = str(tmp_path / "store")
    _append_merge(spark, table, cms_counters(docs), 0)
    ok = cms_parity_report(spark, sf, table).collect()
    assert len(ok) == 20 and all(r.matches_batch_face for r in ok)

    _append_merge(spark, table, cms_counters(docs), 1)  # double-apply
    bad = cms_parity_report(spark, sf, table).collect()
    assert not any(r.matches_batch_face for r in bad)


def test_psi_parity_flag_flips_on_tampered_store(spark, tmp_path):
    """Non-vacuousness of the PSI parity certificate: the correctly-
    built live store reads all-true; re-appending the second half (a
    replayed-but-not-deduped batch) flips flags."""
    from hrfco_data_pipeline_spark.plans.relational import (
        psi_bucket_counts,
        psi_parity_inputs,
        psi_parity_report,
    )
    from hrfco_data_pipeline_spark.streaming.curation import _append_merge

    sf = "/root/testdata/sf0.001"
    edges, mid, reference, second = psi_parity_inputs(spark, sf)
    table = str(tmp_path / "store")
    _append_merge(spark, table, psi_bucket_counts(second, edges), 0)
    # exercise BOTH report arms (ADVICE r16): the frozen-edges fast
    # path (what production stream_batch_psi_parity runs) and the
    # events_psi_by_type fallback must agree row-for-row on the good
    # store, and BOTH must flip on the tampered one
    ok_fast = psi_parity_report(
        spark, sf, table, reference, edges=edges, mid=mid
    ).collect()
    ok_fall = psi_parity_report(spark, sf, table, reference).collect()
    assert ok_fast and all(r.matches_batch_face for r in ok_fast)
    assert sorted(map(tuple, ok_fast)) == sorted(map(tuple, ok_fall))

    _append_merge(spark, table, psi_bucket_counts(second, edges), 1)
    bad_fast = psi_parity_report(
        spark, sf, table, reference, edges=edges, mid=mid
    ).collect()
    bad_fall = psi_parity_report(spark, sf, table, reference).collect()
    assert not any(r.matches_batch_face for r in bad_fast)
    assert sorted(map(tuple, bad_fast)) == sorted(map(tuple, bad_fall))


def test_survivor_bias_source_with_zero_kept(spark, tmp_path):
    """The keep policy is GLOBAL: a source whose every text also
    appears under a lower doc_id elsewhere keeps nothing — the kept
    mean must be NULL, not an ANSI division error (r13 self-review)."""
    from hrfco_data_pipeline_spark.plans.llm import dedup_survivor_length_bias

    rows = [
        (1, "a b c", "en", "s0", 5),
        (2, "a b c", "en", "s1", 5),   # s1's only doc duplicates s0's
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r.source: r for r in dedup_survivor_length_bias(spark, out).collect()}
    s1 = got["s1"]
    assert (s1.n_kept, s1.n_dropped) == (0, 1)
    assert s1.mean_toks_kept is None
    assert s1.mean_toks_dropped == 3.0


def test_tokenizer_fertility_all_whitespace_source(spark, tmp_path):
    """An all-whitespace source tokenizes to one empty word
    (n_chars = 0): fertility must be NULL, not an ANSI division error
    (r13 self-review)."""
    from hrfco_data_pipeline_spark.plans.llm import docs_tokenizer_fertility

    rows = [
        (1, "ab ab", "en", "s0", 5),
        (2, "   ", "en", "s1", 3),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r.source: r for r in docs_tokenizer_fertility(spark, out).collect()}
    assert got["s1"].n_chars == 0
    assert got["s1"].syms_per_100_chars is None
    assert got["s0"].syms_per_100_chars is not None
