"""Unit tests for the operators and guard fixes added in round 12.

Each plan-level test recomputes the expected answer in pure Python
over a tiny hand-built frame, so a Spark-side regression cannot hide
behind an oracle that shares the same mistake."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_psi_pad_guard_raises_on_overfull_grid(spark):
    """psi_from_bucket_counts enforces the 10-bucket invariant loudly:
    an 11-row grid for one type must raise, not silently emit an
    empty pad (ADVICE r11)."""
    from hrfco_data_pipeline_spark.plans.relational import psi_from_bucket_counts

    rows = [Row(event_type="a", bucket=b, c1=1, c2=1) for b in range(11)]
    counts = spark.createDataFrame(rows)
    with pytest.raises(Exception, match="more than 10 bucket rows"):
        psi_from_bucket_counts(counts).collect()


def test_psi_pad_guard_ok_at_exactly_ten(spark):
    """A full 10-bucket grid with identical halves folds to PSI 0."""
    from hrfco_data_pipeline_spark.plans.relational import psi_from_bucket_counts

    rows = [Row(event_type="a", bucket=b, c1=3, c2=3) for b in range(10)]
    out = psi_from_bucket_counts(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0].n_first == 30 and out[0].n_second == 30
    assert out[0].psi == 0.0


def test_psi_decile_cut_is_integer_exact(spark):
    """The decile rank cut uses integer `div`, so it agrees with the
    exact k = floor((n*i-1)/10)+1 for values where float floor() would
    already be suspect; spot-check the expression at a few n."""
    for n in (7, 10, 12345, 2**53 + 11):
        got = (
            spark.range(1)
            .select(
                F.expr(
                    f"transform(sequence(1, 9), i -> "
                    f"(CAST({n} AS BIGINT) * i - 1) div 10 + 1)"
                ).alias("cuts")
            )
            .head()
            .cuts
        )
        want = [(n * i - 1) // 10 + 1 for i in range(1, 10)]
        assert got == want, f"n={n}"


def _write_parts(spark, tmp_path, rows):
    """rows: (partkey, retailprice, size)"""
    parts = spark.createDataFrame(
        [(k, f"part{k}", "BRAND#1", "TYPE", s, float(p)) for k, p, s in rows],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    out = str(tmp_path / "parts_tbl")
    parts.write.parquet(f"{out}/part.parquet")
    return out


def test_skyline_vs_bruteforce_dominance(spark, tmp_path):
    """The running-record frontier must equal the quadratic dominance
    definition recomputed in pure Python, including the tricky cases:
    same-price smaller-size (dominated), same-size higher-price
    (dominated), exact duplicate points (both survive)."""
    from hrfco_data_pipeline_spark.plans.relational import parts_price_size_skyline

    rows = [
        (1, 1.00, 5),
        (2, 1.00, 3),   # dominated: same price, smaller size
        (3, 0.90, 5),   # dominates 1 (cheaper, same size)
        (4, 1.10, 7),   # frontier: bigger size at higher price
        (5, 1.20, 7),   # dominated: same size as 4, pricier
        (6, 0.50, 1),   # frontier: cheapest overall
        (7, 0.90, 5),   # duplicate of 3: both must survive
    ]
    pts = [(k, round(p * 100), s) for k, p, s in rows]
    expected = {
        k
        for k, pc, s in pts
        if not any(
            qc <= pc and qs >= s and (qc < pc or qs > s)
            for _, qc, qs in pts
        )
    }
    sf = _write_parts(spark, tmp_path, rows)
    got = {r.partkey for r in parts_price_size_skyline(spark, sf).collect()}
    assert got == expected == {3, 4, 6, 7}


def test_lateness_profile_hand_computed(spark, tmp_path):
    """Crafted arrival sequence (by event_id) with one out-of-order
    event: lateness = running max(event seconds) - event seconds."""
    import datetime as dt

    from hrfco_data_pipeline_spark.plans.relational import events_lateness_profile
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
    # arrival order: 10:00:00, 10:00:30, 10:00:10 (20s late),
    # 10:00:30 (0s late, ties the max), 10:01:00
    stamps = [
        "2024-01-01T10:00:00",
        "2024-01-01T10:00:30",
        "2024-01-01T10:00:10",
        "2024-01-01T10:00:30",
        "2024-01-01T10:01:00",
    ]
    rows = [
        (i, dt.datetime.fromisoformat(s), None, "a", None, None)
        for i, s in enumerate(stamps)
    ]
    out = str(tmp_path / "ev_tbl")
    spark.createDataFrame(rows, schema).write.parquet(f"{out}/events.parquet")

    secs = [
        int(dt.datetime.fromisoformat(s).timestamp())
        - int(dt.datetime(1970, 1, 1).timestamp())
        for s in stamps
    ]
    run, late = -(10**18), []
    for s in secs:
        run = max(run, s)
        late.append(run - s)

    r = events_lateness_profile(spark, out).collect()[0]
    assert r.n_events == 5
    assert r.n_late == sum(1 for x in late if x > 0) == 1
    assert r.max_lateness_sec == max(late) == 20
    assert r.avg_lateness_sec == round(sum(late) / len(late), 4)
    assert r.late_pct == round(1 / 5, 4)


def _write_docs(spark, tmp_path, rows, name="docs_tbl"):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / name)
    docs.write.parquet(f"{out}/documents.parquet")
    return out


def _py_winnow(text: str) -> list[str]:
    """Independent pure-Python winnowing (4-gram md5, window 5)."""
    import hashlib

    toks = text.strip().split()
    grams = (
        [
            hashlib.md5(" ".join(toks[i : i + 4]).encode()).hexdigest()
            for i in range(len(toks) - 3)
        ]
        if len(toks) >= 4
        else []
    )
    if len(grams) >= 5:
        fps = [min(grams[i : i + 5]) for i in range(len(grams) - 4)]
    else:
        fps = grams
    return sorted(set(fps))


def test_crosssnap_containment_recompute(spark, tmp_path):
    """doc 97 ('added') is doc 1 with two extra lead tokens — high
    containment against prev doc 1; doc 89 ('changed') must match its
    own prev revision. Containments recomputed in pure Python."""
    from hrfco_data_pipeline_spark.plans.llm import docs_crosssnap_containment

    base = " ".join(f"w{i % 13}x{i % 7}" for i in range(40))
    other = " ".join(f"z{i}q{i}" for i in range(40))
    changed = " ".join(f"c{i % 11}y{i % 5}" for i in range(40))
    rows = [
        (1, base, "en", "s0", len(base)),
        (2, other, "en", "s1", len(other)),
        (89, changed, "en", "s0", len(changed)),
        (97, "pad0 pad1 " + base, "en", "s1", len(base) + 10),
    ]
    sf = _write_docs(spark, tmp_path, rows)

    # pure-Python twin of the whole audit
    prev = {
        d: (t + " [rev1]" if d % 89 == 0 else t)
        for d, t, *_ in rows
        if d % 97 != 0
    }
    probes = {d: t for d, t, *_ in rows if d % 97 == 0 or d % 89 == 0}
    expected = {}
    for pid, ptext in probes.items():
        pf = set(_py_winnow(ptext))
        for vid, vtext in prev.items():
            shared = pf & set(_py_winnow(vtext))
            if shared:
                expected[(pid, vid)] = (
                    len(pf),
                    len(shared),
                    round(len(shared) / len(pf), 4),
                )

    got = docs_crosssnap_containment(spark, sf).collect()
    assert {(r.probe_id, r.prev_id) for r in got} == set(expected)
    for r in got:
        n_fps, n_shared, cont = expected[(r.probe_id, r.prev_id)]
        assert (r.n_fps, r.n_shared) == (n_fps, n_shared)
        assert r.containment == cont
        assert r.is_self_recrawl == (r.probe_id == r.prev_id)
    by_pair = {(r.probe_id, r.prev_id): r for r in got}
    self_row = by_pair[(89, 89)]
    assert self_row.status == "changed" and self_row.containment > 0.8
    near = by_pair[(97, 1)]
    assert near.status == "added" and near.containment > 0.8


def _py_bloom_per_doc(rows):
    """Pure-Python twin of the Bloom decontamination per-doc counts:
    3-token distinct shingles, md5-slice double hash, m=2^16, k=3."""
    import hashlib

    def shingles(text):
        toks = text.strip().split()
        if len(toks) >= 3:
            return sorted({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
        return [" ".join(toks)]

    def h12(s):
        h = hashlib.md5(s.encode()).hexdigest()
        return int(h[0:15], 16), int(h[16:31], 16)

    m = 1 << 16
    positions, eval_sh = set(), set()
    for d, t, *_ in rows:
        if d % 97 == 0:
            for s in shingles(t):
                h1, h2 = h12(s)
                positions.update((h1 + j * h2) % m for j in range(3))
                eval_sh.add(s)
    out = {}
    for d, t, *_ in rows:
        if d % 97 == 0:
            continue
        bloom = exact = 0
        for s in shingles(t):
            h1, h2 = h12(s)
            if all((h1 + j * h2) % m in positions for j in range(3)):
                bloom += 1
            if s in eval_sh:
                exact += 1
        out[d] = (bloom, exact)
    return out


def test_contamination_heatmap_recompute(spark, tmp_path):
    """One train doc copies a run from the eval doc (real
    contamination); the rest are clean. Cell counts recomputed via an
    independent pure-Python Bloom filter."""
    from hrfco_data_pipeline_spark.plans.llm import docs_contamination_heatmap

    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    dirty = "intro words alpha beta gamma delta epsilon closing remark"
    clean1 = " ".join(f"u{i}v{i}" for i in range(12))
    clean2 = " ".join(f"p{i}r{i}" for i in range(12))
    rows = [
        (0, eval_text, "en", "s0", len(eval_text)),   # eval (0 % 97 == 0)
        (1, dirty, "en", "s0", len(dirty)),
        (2, clean1, "en", "s0", len(clean1)),
        (10, clean2, "en", "s1", len(clean2)),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    perdoc = _py_bloom_per_doc(rows)

    cells = {}
    for d, t, lang, src, n in rows:
        if d % 97 == 0:
            continue
        key = (src, d % 7)
        bloom, exact = perdoc[d]
        c = cells.setdefault(key, [0, 0, 0, 0])
        c[0] += 1
        c[1] += 1 if bloom > 0 else 0
        c[2] += 1 if exact > 0 else 0
        c[3] += 1 if bloom > 0 and exact == 0 else 0

    got = {(r.source, r.shard): r for r in docs_contamination_heatmap(spark, sf).collect()}
    assert set(got) == set(cells)
    for key, (n_docs, n_flag, n_cont, n_fp) in cells.items():
        r = got[key]
        assert (r.n_docs, r.n_bloom_flagged, r.n_contaminated, r.n_false_pos) == (
            n_docs, n_flag, n_cont, n_fp,
        )
        assert r.flagged_pct == round(n_flag / n_docs, 4)
    # the dirty doc really is contaminated, and clean docs are not
    assert perdoc[1][1] > 0 and perdoc[2][1] == 0 and perdoc[10][1] == 0


def _write_embeddings(spark, tmp_path, rows, name="emb_tbl"):
    """rows: (vec_id, [floats], label)"""
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = str(tmp_path / name)
    emb.write.parquet(f"{out}/embeddings.parquet")
    return out


def _py_cos(a, b):
    import math

    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dot / (na * nb), 4)


def test_label_noise_screen_recompute(spark, tmp_path):
    """Probe 0 (label 1) sits among label-1 vectors (full agreement);
    probe 29 (label 2) sits among label-1 vectors (suspect). kNN and
    agreement recomputed in pure Python (float32-exact coordinates)."""
    from hrfco_data_pipeline_spark.plans.llm import embedding_label_noise_screen

    def vec(x, y):
        return [float(x), float(y), 0.0, 0.0]

    rows = [
        (0, vec(1.0, 0.0), 1),       # probe, label 1
        (1, vec(1.0, 0.125), 1),
        (2, vec(1.0, 0.25), 1),
        (3, vec(1.0, -0.125), 1),
        (4, vec(1.0, -0.25), 1),
        (5, vec(1.0, 0.5), 1),
        (29, vec(0.96875, 0.0625), 2),  # probe, label 2 but in label-1 space
        (7, vec(0.0, 1.0), 3),
        (8, vec(-0.125, 1.0), 3),
    ]
    sf = _write_embeddings(spark, tmp_path, rows)

    by_id = {i: (v, lbl) for i, v, lbl in rows}
    expected = {}
    for qid in (0, 29):
        qv, qlabel = by_id[qid]
        scored = sorted(
            (
                (-_py_cos(qv, v), i, lbl)
                for i, (v, lbl) in by_id.items()
                if i != qid
            ),
        )[:5]
        n_agree = sum(1 for _, _, lbl in scored if lbl == qlabel)
        e = expected.setdefault(qlabel, [0, 0, 0])
        e[0] += 1
        e[1] += n_agree
        e[2] += 1 if n_agree <= 1 else 0

    got = {r.label: r for r in embedding_label_noise_screen(spark, sf).collect()}
    assert set(got) == set(expected)
    for lbl, (n_probes, n_agree, n_suspect) in expected.items():
        r = got[lbl]
        assert (r.n_probes, r.n_agree_total, r.n_suspect) == (
            n_probes, n_agree, n_suspect,
        )
        assert r.mean_agreement == round(n_agree / (5 * n_probes), 4)
    assert got[1].n_suspect == 0
    assert got[2].n_suspect == 1  # the mislabeled probe is flagged


def test_cosine_histogram_recompute(spark, tmp_path):
    """Four probe vectors at known angles; per-pair cosine bins
    recomputed in pure Python, including the cos=1.0 clamp to bin 19."""
    from hrfco_data_pipeline_spark.plans.llm import embedding_cosine_histogram

    rows = [
        (0, [1.0, 0.0], 0),
        (53, [2.0, 0.0], 0),     # cos(0,53) = 1.0 -> clamp to bin 19
        (106, [0.0, 1.0], 0),    # orthogonal to 0/53 -> bin 10
        (159, [-1.0, 0.0], 0),   # cos -1.0 with 0/53 -> bin 0
        (7, [5.0, 5.0], 0),      # NOT a probe (7 % 53 != 0)
    ]
    sf = _write_embeddings(spark, tmp_path, rows)

    probes = {i: v for i, v, _ in rows if i % 53 == 0}
    from collections import Counter

    bins = Counter()
    ids = sorted(probes)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            c = _py_cos(probes[ids[x]], probes[ids[y]])
            bins[min(int((c + 1.0) * 10.0), 19)] += 1

    got = {r.bin: r for r in embedding_cosine_histogram(spark, sf).collect()}
    assert {b: r.n_pairs for b, r in got.items()} == dict(bins)
    for b, r in got.items():
        assert r.lo == b / 10.0 - 1.0
        assert r.hi == (b + 1) / 10.0 - 1.0
    # pairs: (0,53)->19, (0,159)/(53,159)->0, (0,106)/(53,106)/(106,159)->10
    assert got[19].n_pairs == 1 and got[0].n_pairs == 2 and got[10].n_pairs == 3


def test_partition_checksums_recompute(spark, tmp_path):
    """Checksums recomputed in pure Python; swapping two texts between
    docs changes the checksum (id-qualified hash) even though the bag
    of texts is unchanged."""
    import hashlib

    from hrfco_data_pipeline_spark.plans.llm import docs_partition_checksums

    def h60(d, t):
        return int(hashlib.md5(f"{d}:{t}".encode()).hexdigest()[:15], 16)

    rows = [
        (0, "alpha beta", "en", "s0", 10),
        (7, "gamma delta", "en", "s0", 11),
        (14, "epsilon zeta", "en", "s1", 12),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    expected = {}
    for d, t, _, src, n in rows:
        key = (src, d % 7)
        c = expected.setdefault(key, [0, 0, 0])
        c[0] += 1
        c[1] += n
        c[2] = (c[2] + h60(d, t)) % (1 << 60)

    got = {(r.source, r.shard): r for r in docs_partition_checksums(spark, sf).collect()}
    assert set(got) == set(expected)
    for key, (n_docs, chars, chk) in expected.items():
        r = got[key]
        assert (r.n_docs, r.total_chars, r.checksum) == (n_docs, chars, chk)

    swapped = [rows[0][:1] + (rows[1][1],) + rows[0][2:],
               rows[1][:1] + (rows[0][1],) + rows[1][2:], rows[2]]
    sf2 = _write_docs(spark, tmp_path, swapped, name="docs_tbl2")
    got2 = {(r.source, r.shard): r for r in docs_partition_checksums(spark, sf2).collect()}
    assert got2[("s0", 0)].checksum != got[("s0", 0)].checksum


def test_length_quantiles_by_source_recompute(spark, tmp_path):
    """Per-source exact decile cuts recomputed in pure Python over a
    crafted 11-doc source (plus a 1-doc source: all cuts = its row)."""
    from hrfco_data_pipeline_spark.plans.llm import docs_length_quantiles_by_source

    texts = [" ".join(f"t{j}" for j in range(k)) for k in
             [3, 9, 4, 15, 7, 2, 30, 11, 5, 8, 20]]
    rows = [(i, t, "en", "big", len(t)) for i, t in enumerate(texts)]
    rows.append((99, "one two three four", "en", "tiny", 18))
    sf = _write_docs(spark, tmp_path, rows)

    def cuts(lengths):
        n = len(lengths)
        s = sorted(lengths)
        return {i: s[(n * i - 1) // 10] for i in (1, 5, 9)}

    big = cuts([len(t.split()) for t in texts])
    tiny = cuts([4])
    got = {r.source: r for r in docs_length_quantiles_by_source(spark, sf).collect()}
    assert (got["big"].p10, got["big"].p50, got["big"].p90) == (big[1], big[5], big[9])
    assert got["big"].n_docs == 11
    assert (got["tiny"].p10, got["tiny"].p50, got["tiny"].p90) == (4, 4, 4)


def test_bytes_concentration_recompute(spark, tmp_path):
    """Per-blob byte collision recomputed in pure Python (all exact
    integers): a constant blob has collision 1.0 (low-information), a
    16-symbol uniform blob exactly 1/16 (NOT flagged — the gate is
    strict 16·Σc² > n², mirroring the old strict entropy < 4.0), and a
    two-symbol blob exactly 1/2 (flagged)."""
    from hrfco_data_pipeline_spark.plans.llm import (
        multimodal_bytes_concentration,
    )

    const = "a" * 32
    uniform16 = "abcdefghijklmnop" * 2   # 16 symbols x 2 -> 1/16
    two = "abab"                          # 1/2
    rows = [
        (1, const, "en", "s0", len(const)),
        (2, uniform16, "en", "s0", len(uniform16)),
        (3, two, "en", "s1", len(two)),
    ]
    sf = _write_docs(spark, tmp_path, rows)

    def py_qc_low(text):
        b = text.encode()
        n = len(b)
        sum_c2 = sum(
            sum(1 for x in b if x == v) ** 2 for v in set(b)
        )
        return (sum_c2 * 10**9) // (n * n), 16 * sum_c2 > n * n

    stats = {
        "s0": [py_qc_low(const), py_qc_low(uniform16)],
        "s1": [py_qc_low(two)],
    }
    got = {
        r.source: r
        for r in multimodal_bytes_concentration(spark, sf).collect()
    }
    # Spark/DuckDB round() is HALF_UP on doubles; Python's round() is
    # banker's — the hand corpus lands exactly on a .00005 tie
    # (1.0625/2 = 0.53125), so the recompute must mirror HALF_UP
    from decimal import ROUND_HALF_UP, Decimal

    def r4_half_up(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )

    for src, qs in stats.items():
        r = got[src]
        assert r.n_blobs == len(qs)
        assert r.avg_collision == r4_half_up(
            sum(q for q, _ in qs) / 1e9 / len(qs)
        )
        assert r.n_low_info == sum(1 for _, low in qs if low)
    assert got["s0"].n_low_info == 1  # const flagged; uniform16 == 1/16 NOT
    assert got["s1"].n_low_info == 1


def test_quality_dup_contingency_recompute(spark, tmp_path):
    """Hand corpus with both margins varying: two docs share an
    8-token prefix (one high-quality, one degenerate), two unique."""
    from hrfco_data_pipeline_spark.plans.llm import docs_quality_dup_contingency

    prefix = "p0 p1 p2 p3 p4 p5 p6 p7"
    # high quality: >= 20 tokens, high ttr, stopword ratio in band
    good_tail = " ".join(f"w{i}" for i in range(20)) + " the a"
    # degenerate: same prefix then one token repeated (low ttr)
    bad_tail = " ".join("x" for _ in range(30))
    uniq_good = " ".join(f"u{i}" for i in range(25)) + " the of"
    uniq_bad = "short text"
    rows = [
        (1, f"{prefix} {good_tail}", "en", "s0", 1),
        (2, f"{prefix} {bad_tail}", "en", "s0", 1),
        (3, uniq_good, "en", "s0", 1),
        (4, uniq_bad, "en", "s1", 1),
    ]
    sf = _write_docs(spark, tmp_path, rows)

    def quality_keep(text):
        toks = text.strip().split()
        n = len(toks)
        ttr = len(set(toks)) / n
        stop = sum(1 for t in toks if t in ("the", "a", "of", "and", "data")) / n
        score = (
            (0.4 if 20 <= n <= 1000 else 0.0)
            + (0.3 if ttr >= 0.3 else 0.0)
            + (0.3 if 0.01 <= stop <= 0.5 else 0.0)
        )
        return score >= 0.7

    from collections import Counter

    fps = Counter(" ".join(t.strip().split()[:8]) for _, t, *_ in rows)
    expected = Counter()
    for _, t, *_ in rows:
        fp = " ".join(t.strip().split()[:8])
        expected[(quality_keep(t), fps[fp] > 1)] += 1

    got = {
        (r.quality_keep, r.is_prefix_dup): r
        for r in docs_quality_dup_contingency(spark, sf).collect()
    }
    assert {k: r.n_docs for k, r in got.items()} == dict(expected)
    for k, r in got.items():
        assert r.pct_of_corpus == round(expected[k] / 4, 4)
    # both margins vary: a dup-good, a dup-bad, a unique-good, a unique-bad
    assert set(got) == {(True, True), (False, True), (True, False), (False, False)}


def test_session_gap_sensitivity_recompute(spark, tmp_path):
    """Two users with gaps of 45 min and 3 h: at a 30-min threshold
    both gaps split sessions, at 60 min only the 3-h one, at 120 min
    still only the 3-h one. Recomputed in pure Python."""
    import datetime as dt

    from hrfco_data_pipeline_spark.plans.relational import (
        events_session_gap_sensitivity,
    )
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
    seq = [
        (1, "2024-01-01T10:00:00"),
        (1, "2024-01-01T10:45:00"),   # 45-min gap
        (1, "2024-01-01T13:45:00"),   # 3-h gap
        (2, "2024-01-01T09:00:00"),
        (2, "2024-01-01T09:10:00"),   # 10-min gap
    ]
    rows = [
        (i, dt.datetime.fromisoformat(t), u, "a", None, None)
        for i, (u, t) in enumerate(seq)
    ]
    out = str(tmp_path / "ev_gap")
    spark.createDataFrame(rows, schema).write.parquet(f"{out}/events.parquet")

    def py_sessions(g):
        n = 0
        last = {}
        for u, t in seq:
            sec = dt.datetime.fromisoformat(t).timestamp()
            if u not in last or sec - last[u] > g:
                n += 1
            last[u] = sec
        return n

    got = {
        r.gap_threshold_sec: r
        for r in events_session_gap_sensitivity(spark, out).collect()
    }
    assert set(got) == {1800, 3600, 7200}
    for g, r in got.items():
        ns = py_sessions(g)
        assert r.n_events == 5 and r.n_users == 2
        assert r.n_sessions == ns
        assert r.avg_events_per_session == round(5 / ns, 4)
    assert got[1800].n_sessions == 4
    assert got[3600].n_sessions == 3
    assert got[7200].n_sessions == 3


def test_dedup_threshold_curve_recompute(spark, tmp_path):
    """Three docs: B is a light edit of A (high jaccard), C unrelated.
    Survivors per threshold recomputed from pure-Python 5-gram
    jaccards under the keep-first (pairwise-shadow) rule."""
    from hrfco_data_pipeline_spark.plans.llm import docs_dedup_threshold_curve

    a = " ".join(f"w{i}" for i in range(30))
    b = " ".join(f"w{i}" for i in range(28)) + " zz yy"   # near-dup of a
    c = " ".join(f"q{i}" for i in range(30))
    rows = [
        (1, a, "en", "s0", len(a)),
        (2, b, "en", "s0", len(b)),
        (3, c, "en", "s0", len(c)),
    ]
    sf = _write_docs(spark, tmp_path, rows)

    def sh5(text):
        toks = text.strip().split()
        return {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}

    texts = {1: sh5(a), 2: sh5(b), 3: sh5(c)}
    ids = sorted(texts)
    jac = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            sa, sb = texts[ids[x]], texts[ids[y]]
            common = len(sa & sb)
            if common and common / len(sa | sb) >= 0.2:
                jac[(ids[x], ids[y])] = common / len(sa | sb)

    got = {r.t_pct: r for r in docs_dedup_threshold_curve(spark, sf).collect()}
    assert set(got) == {20, 30, 40, 50, 60, 70, 80}
    for t, r in got.items():
        dropped = {b_ for (_, b_), j in jac.items() if j >= t / 100.0}
        assert r.n_dropped == len(dropped)
        assert r.n_survivors == 3 - len(dropped)
        assert r.survival_pct == round((3 - len(dropped)) / 3, 4)
    # sanity: the near-dup pair is above 0.8, the unrelated pair absent
    assert got[80].n_dropped == 1 and (1, 3) not in jac


def test_label_silhouette_recompute(spark, tmp_path):
    """Two tight separated clusters -> silhouette near 1 for both; a
    third label sitting inside cluster 1's region -> negative. Full
    pure-Python recompute of the centroid/quantization chain."""
    import math

    from hrfco_data_pipeline_spark.plans.llm import embedding_label_silhouette

    rows = [
        (0, [0.0, 0.0], 1),
        (1, [0.0, 0.25], 1),
        (2, [10.0, 0.0], 2),
        (3, [10.0, 0.25], 2),
        # label 3 is incoherent: one member sits in label 1's region,
        # one near label 2's — its centroid represents neither, so the
        # near-label-1 member scores NEGATIVE (closer to label 1's
        # centroid than to its own)
        (4, [0.0, 0.1], 3),
        (5, [-20.0, 0.0], 3),
    ]
    sf = _write_embeddings(spark, tmp_path, rows)

    by_label = {}
    for _, v, lbl in rows:
        by_label.setdefault(lbl, []).append(v)
    cents = {}
    for lbl, vs in by_label.items():
        n = len(vs)
        cents[lbl] = [
            sum(math.floor(v[j] * 1e9) for v in vs) / (n * 1e9)
            for j in range(2)
        ]

    def dist(v, c):
        acc = 0.0
        for x, cc in zip(v, c):
            acc += (x - cc) * (x - cc)
        return math.sqrt(acc)

    expected = {}
    for _, v, lbl in rows:
        a = dist(v, cents[lbl])
        b = min(dist(v, c) for l2, c in cents.items() if l2 != lbl)
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        e = expected.setdefault(lbl, [0, 0, 0])
        e[0] += 1
        e[1] += math.floor(s * 1e9)
        e[2] += 1 if s < 0 else 0

    got = {r.label: r for r in embedding_label_silhouette(spark, sf).collect()}
    assert set(got) == set(expected)
    for lbl, (n, qsum, neg) in expected.items():
        r = got[lbl]
        assert r.n_vecs == n and r.n_negative == neg
        assert r.mean_silhouette == round(qsum / 1e9 / n, 4)
    assert got[2].mean_silhouette > 0.9          # far cluster: clean
    assert got[3].n_negative == 1                # incoherent label flagged


def test_level_mad_outliers_recompute(spark):
    """sf0.001: recompute every station's lower-median, MAD, outlier
    count, and max deviation in pure Python from the same classified
    substrate — the two-pass rank plumbing is what's under test, so
    the recompute sorts plain Python lists instead."""
    from collections import defaultdict

    from hrfco_data_pipeline_spark.plans.hydro import (
        classified,
        level_mad_outliers,
    )

    sf = "/root/testdata/sf0.001"
    base = (
        classified(spark, sf)
        .filter(F.col("water_level").isNotNull())
        .select(
            F.col("wlobscd").alias("station"),
            F.round(F.col("water_level") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    by = defaultdict(list)
    for r in base:
        by[r.station].append(r.cents)
    got = {r.station: r for r in level_mad_outliers(spark, sf).collect()}
    assert set(got) == set(by) and got
    for st, cs in by.items():
        n = len(cs)
        med = sorted(cs)[(n + 1) // 2 - 1]
        devs = sorted(abs(x - med) for x in cs)
        mad = devs[(n + 1) // 2 - 1]
        r = got[st]
        assert (r.n_obs, r.median_cents, r.mad_cents) == (n, med, mad)
        assert r.n_outliers == sum(1 for d in devs if d > 3 * mad)
        assert r.max_abs_dev_cents == devs[-1]


def test_source_vocab_overlap_recompute(spark, tmp_path):
    """Hand corpus: one overlapping pair (Jaccard 2/5) and two
    zero-overlap pairs that must still be present with n_shared=0."""
    from hrfco_data_pipeline_spark.plans.llm import docs_source_vocab_overlap

    rows = [
        (1, "apple banana cherry", "en", "s1", 19),
        (2, "banana date", "en", "s1", 11),
        (3, "banana cherry egg", "en", "s2", 17),
        (4, "fig grape", "en", "s3", 9),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r.source_a, r.source_b): r
        for r in docs_source_vocab_overlap(spark, sf).collect()
    }
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    r12 = got[("s1", "s2")]
    assert (r12.vocab_a, r12.vocab_b, r12.n_shared) == (4, 3, 2)
    assert r12.jaccard == 2 / 5
    for pair in (("s1", "s3"), ("s2", "s3")):
        assert got[pair].n_shared == 0 and got[pair].jaccard == 0.0


def test_t_closeness_recompute(spark, tmp_path):
    """Hand events frame with a NULL-value band, a perfectly
    representative cell (TV 0-ish), and a single-type cell beyond
    t=0.3; expected per-day rows recomputed with exact Fraction
    arithmetic in pure Python."""
    import datetime as dt
    from collections import Counter
    from fractions import Fraction

    from hrfco_data_pipeline_spark.plans.relational import events_t_closeness

    d1 = dt.datetime(2024, 1, 1, 5)
    d2 = dt.datetime(2024, 1, 2, 7)
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, d1, 10, "A", 1.0, None),
        (2, d1, 10, "A", 2.0, None),
        (3, d1, 11, "A", 3.0, None),
        (4, d1, 12, "B", 2.0, None),
        (5, d1, 10, "A", 11.0, None),
        (6, d2, 10, "A", 1.0, None),
        (7, d2, 11, "A", 5.0, None),
        (8, d2, 12, "B", 3.0, None),
        (9, d2, 13, "B", 25.0, None),
        (10, d2, 10, "A", None, None),  # NULL value -> band -1
    ]
    out = str(tmp_path / "tclose")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{out}/events.parquet")

    # pure-Python twin
    import math

    def band(v):
        return math.floor((v if v is not None else -1.0) / 10)

    glob = Counter(t for (_, _, _, t, _, _) in rows)
    N = sum(glob.values())
    cells: dict[tuple, Counter] = {}
    for (_, ts, _, t, v, _) in rows:
        cells.setdefault((ts.date(), band(v)), Counter())[t] += 1
    per_day: dict = {}
    for (day, _), cnt in cells.items():
        n = sum(cnt.values())
        num = sum(abs(c * N - glob[t] * n) for t, c in cnt.items())
        num += (N - sum(glob[t] for t in cnt)) * n
        tv = num / (2.0 * n * N)
        above = 10 * num > 6 * n * N
        e = per_day.setdefault(day, dict(cells=0, rows=0, tv=0.0, ab=0, risk=0))
        e["cells"] += 1
        e["rows"] += n
        e["tv"] = max(e["tv"], tv)
        e["ab"] += int(above)
        e["risk"] += n if above else 0
    assert any(e["ab"] for e in per_day.values())  # non-vacuous cutoff
    assert any(Fraction(0) < Fraction(e["tv"]) < 1 for e in per_day.values())

    got = {r.day: r for r in events_t_closeness(spark, out).collect()}
    assert set(got) == set(per_day)
    for day, e in per_day.items():
        r = got[day]
        assert (r.n_cells, r.n_rows) == (e["cells"], e["rows"])
        assert r.max_tv == e["tv"]
        assert (r.n_cells_above_t, r.rows_at_risk) == (e["ab"], e["risk"])
