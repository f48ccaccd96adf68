"""Property tests for the r13 integer/dyadic kernels.

One Spark job per property: the random cases are packed into a single
frame (one event_type per case), so hypothesis-style coverage costs a
single query execution."""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from fractions import Fraction


def test_ewma_matches_fraction_exact_recompute(spark, tmp_path):
    """For 20 random daily-count series, the engine's sequential
    (acc+x)·0.5 fold must equal the Fraction-exact EWMA converted to
    float at every prefix — the dyadic-exactness claim, checked
    against an independent arithmetic."""
    from hrfco_data_pipeline_spark.plans.relational import events_ewma_control

    rng = random.Random(1337)
    series = {
        f"t{k:02d}": [rng.randrange(1, 50) for _ in range(rng.randrange(2, 15))]
        for k in range(20)
    }
    t0 = datetime(2024, 5, 1, 9, 0)
    rows = []
    eid = 0
    for et, counts in series.items():
        for day, cnt in enumerate(counts):
            for _ in range(cnt):
                rows.append((eid, t0 + timedelta(days=day), 1, et, 1.0, "{}"))
                eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    out = str(tmp_path / "ewma_prop")
    ev.write.parquet(f"{out}/events.parquet")
    got = {
        (r.event_type, str(r.day)): r
        for r in events_ewma_control(spark, out).collect()
    }
    for et, counts in series.items():
        e = Fraction(counts[0])
        for day, cnt in enumerate(counts):
            r = got[(et, str((t0 + timedelta(days=day)).date()))]
            assert r.n_events == cnt
            if day == 0:
                assert r.ewma_prev is None
            else:
                assert r.ewma_prev == float(e)
                assert r.is_spike == (cnt > 2 * float(e))
                e = (e + cnt) / 2
        # advance seed fold exactly as the engine does: e after day d
        # is used as day d+1's forecast — recompute checked above


def test_lsh_curve_bounds_and_monotonicity(spark, tmp_path):
    """Detection probabilities lie in [0, 1] and, for a fixed
    signature length, more bands (shorter rows) never detect LESS on
    any pair set: expected_detected(32x4) >= (16x8) >= (8x16)."""
    from hrfco_data_pipeline_spark.plans.llm import lsh_band_tradeoff_curve

    rng = random.Random(7)
    # random near-dup corpus: pairs across a spectrum of overlaps
    rows = []
    base = [f"w{i}" for i in range(30)]
    for d in range(12):
        toks = list(base)
        for _ in range(rng.randrange(0, 18)):
            toks[rng.randrange(len(toks))] = f"u{d}x{rng.randrange(99)}"
        rows.append((d, " ".join(toks), "en", "s0", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "lshprop")
    docs.write.parquet(f"{out}/documents.parquet")
    got = {
        (r.bands, r.rows_per_band): r
        for r in lsh_band_tradeoff_curve(spark, out).collect()
    }
    if not got:
        return  # no candidate pairs generated — vacuous draw
    n_pairs = {r.n_pairs for r in got.values()}
    assert len(n_pairs) == 1
    e32 = got[(32, 4)].expected_detected_nanos
    e16 = got[(16, 8)].expected_detected_nanos
    e8 = got[(8, 16)].expected_detected_nanos
    cap = n_pairs.pop() * 1_000_000_000
    assert 0 <= e8 <= e16 <= e32 <= cap
