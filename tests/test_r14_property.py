"""Property tests for the r14 operators.

One Spark job per property where possible: random cases pack into a
single frame so hypothesis-style coverage costs one query execution
(the r13 convention).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta


def _write_events(spark, tmp_path, rows, name="ev_prop"):
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    out = str(tmp_path / name)
    ev.write.parquet(f"{out}/events.parquet")
    return out


def test_kanon_ladder_groups_monotone_random(spark, tmp_path):
    """Coarsening is a PARTITION refinement in reverse on the GENUINELY
    nested rungs only: L1's QI key is a function of L0's (ISO week of
    day, 50-band of 10-band — nested-floor identity holds for the -1
    null sentinel too), L2's of L0's (month of day, 100-band of
    10-band), and L3's of L2's (drop the band). L1→L2 is NOT nested —
    month is not a function of ISO week (a week can straddle two
    months), so an L1 group can legally split into two L2 groups
    (ADVICE r14). On the nested pairs, per type, n_groups and
    n_singletons must be non-increasing and n_rows constant, on any
    input."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_kanon_generalization_ladder,
    )

    rng = random.Random(4242)
    t0 = datetime(2024, 1, 15, 12, 0)
    rows = []
    for eid in range(3000):
        et = f"t{rng.randrange(4)}"
        ts = t0 + timedelta(
            days=rng.randrange(120), minutes=rng.randrange(1440)
        )
        value = None if rng.random() < 0.1 else rng.uniform(0, 900)
        rows.append((eid, ts, rng.randrange(50), et, value, "{}"))
    out = _write_events(spark, tmp_path, rows)
    ladder = events_kanon_generalization_ladder(spark, out).collect()
    per_type = {}
    for r in ladder:
        per_type.setdefault(r.event_type, {})[r.level] = r
    for et, lv in per_type.items():
        assert set(lv) == {0, 1, 2, 3}, et
        assert len({r.n_rows for r in lv.values()}) == 1, et
        for a, b in ((0, 1), (0, 2), (2, 3)):
            assert lv[a].n_groups >= lv[b].n_groups, (et, a, b)
            # singletons can only merge away as cells coarsen
            assert lv[a].n_singletons >= lv[b].n_singletons, (et, a, b)


def test_regularity_mix_population_identity_random(spark, tmp_path):
    """The contingency counts exactly the events of BANDED users: per
    band×type cell counts sum to the events whose user cleared the
    >= 10-gap screen — no row invented, none dropped."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_bot_regularity_screen,
        events_regularity_type_mix,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table

    rng = random.Random(99)
    t0 = datetime(2024, 3, 1)
    rows = []
    eid = 0
    # mix of heavy (regular + bursty) and light (screened-out) users
    for uid in range(30):
        n_ev = rng.choice([3, 5, 12, 25, 40])
        t = t0 + timedelta(hours=uid)
        for _ in range(n_ev):
            step = (
                60.0
                if uid % 3 == 0
                else rng.expovariate(1 / 60.0) + 1.0
            )
            t += timedelta(seconds=step)
            rows.append(
                (eid, t, uid, f"t{rng.randrange(3)}", rng.uniform(0, 10), "{}")
            )
            eid += 1
    out = _write_events(spark, tmp_path, rows)
    mix = events_regularity_type_mix(spark, out).collect()
    banded_users = {
        r.user_id
        for r in events_bot_regularity_screen(spark, out).collect()
        if r.cv2 is not None
    }
    ev = load_table(spark, out, "events").collect()
    expected_total = sum(1 for r in ev if r.user_id in banded_users)
    assert sum(r.n_events for r in mix) == expected_total
    # per-band shares still sum to 1 on a random frame
    bands = {}
    for r in mix:
        bands.setdefault(r.band, 0.0)
        bands[r.band] += r.share_in_band
    assert all(abs(s - 1.0) < 1e-12 for s in bands.values())


def test_survivor_flow_conservation_random(spark, tmp_path):
    """Flow conservation on a random duplicated corpus: total losses
    equal total duplicate rows (n_copies − 1 summed over clusters),
    every winner is the cluster's min doc_id's source, and per-loser
    shares sum to 1 where the source loses at all."""
    from hrfco_data_pipeline_spark.plans.llm import (
        dedup_survivor_source_flow,
    )

    rng = random.Random(7)
    texts = [f"unique text {i} " + "pad " * rng.randrange(3) for i in range(40)]
    rows = []
    doc_id = 0
    n_dups = 0
    for i, t in enumerate(texts):
        copies = rng.choice([1, 1, 1, 2, 3])
        n_dups += copies - 1
        for _ in range(copies):
            rows.append((doc_id, t, "en", f"s{rng.randrange(4)}", len(t)))
            doc_id += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "flow_prop")
    docs.write.parquet(f"{out}/documents.parquet")
    flow = dedup_survivor_source_flow(spark, out).collect()
    assert sum(r.n_losses for r in flow) == n_dups
    # grid completeness over the sources present
    srcs = {r.winner_source for r in flow} | {r.loser_source for r in flow}
    assert len(flow) == len(srcs) ** 2
    per_loser = {}
    for r in flow:
        if r.loss_share is not None:
            per_loser.setdefault(r.loser_source, 0.0)
            per_loser[r.loser_source] += r.loss_share
    assert all(abs(s - 1.0) < 1e-12 for s in per_loser.values())


def test_hamming_histogram_population_identity_random(spark, tmp_path):
    """On a random near-dup corpus, the histogram's total equals the
    unfiltered candidate-pair count and cum at max = total — and the
    h <= 3 cumulative equals the filtered pairing (the pigeonhole
    completeness bound the production path relies on)."""
    from pyspark.sql import functions as F

    from hrfco_data_pipeline_spark.operators.dedup import (
        simhash_64_from_token_hashes,
        simhash_pairs_from,
    )

    rng = random.Random(21)
    base_words = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(30):
        words = [rng.choice(base_words) for _ in range(rng.randrange(8, 20))]
        rows.append((d, " ".join(words)))
    df = spark.createDataFrame(rows, "id long, text string")
    toks = F.split(F.trim("text"), r"\s+")
    base = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    hashed = df.select("id", simhash_64_from_token_hashes(base).alias("sh"))
    all_pairs = simhash_pairs_from(hashed, max_hamming=None).collect()
    filt = simhash_pairs_from(hashed, max_hamming=3).collect()
    hist = {}
    for r in all_pairs:
        hist[r.hamming] = hist.get(r.hamming, 0) + 1
    assert sum(hist.values()) == len(all_pairs)
    assert sum(n for h, n in hist.items() if h <= 3) == len(filt)
