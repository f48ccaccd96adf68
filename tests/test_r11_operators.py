"""r11 operators and r10-verdict gap fixes.

The headline fix is the `multimodal_dhash_dups` positive case (VERDICT
r10 "What's wrong" #1): its r10 driver green was a 0-row-vs-0-row match,
so nothing pinned the 8x8 grid / 56-bit gradient / fold math. Here two
crafted blobs with DIFFERENT content but IDENTICAL byte-gradient
structure must land in one bucket whose fingerprint equals an
independent pure-Python dHash recompute.
"""

from __future__ import annotations


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out_dir = str(tmp_path / "docs")
    docs.write.parquet(out_dir + "/documents.parquet")
    return out_dir


def _py_dhash(text: str) -> int:
    """Independent pure-Python recompute of the query's dHash: sample
    an 8x8 grid of bytes at offsets floor(i*n/64), take the 7
    horizontal gradient bits per row (g[c] < g[c+1]), fold row-major
    as acc*2 + bit."""
    b = text.encode("utf-8")
    n = len(b)
    g = [b[int(i * n / 64.0)] for i in range(64)]
    acc = 0
    for k in range(56):
        r, c = k // 7, k % 7
        acc = acc * 2 + (1 if g[r * 8 + c] < g[r * 8 + c + 1] else 0)
    return acc


def test_dhash_positive_dup_bucket(spark, tmp_path):
    """Two blobs with different bytes but identical gradient structure
    (B = A with every char shifted +1: strict inequalities preserved on
    both sides) share a dHash; a reordered blob does not. The shared
    fingerprint must equal the pure-Python recompute bit-for-bit."""
    from hrfco_data_pipeline_spark.plans.llm import multimodal_dhash_dups

    base = "abcdxyzw" * 16  # 128 bytes, non-monotone gradient pattern
    shifted = "".join(chr(ord(ch) + 1) for ch in base)
    other = "zyxwdcba" * 16  # reversed gradient structure
    assert base != shifted
    assert _py_dhash(base) == _py_dhash(shifted)
    assert _py_dhash(base) != _py_dhash(other)

    out_dir = _write_docs(
        spark,
        tmp_path,
        [
            (1, base, "en", "web", len(base)),
            (2, shifted, "en", "web", len(shifted)),
            (3, other, "en", "web", len(other)),
        ],
    )
    rows = {r.dhash: r for r in multimodal_dhash_dups(spark, out_dir).collect()}
    dup = rows[_py_dhash(base)]
    assert dup.n_docs == 2 and dup.is_dup
    assert dup.keep_doc_id == 1
    assert dup.total_bytes == len(base) + len(shifted)
    # singletons are now emitted too (top-20 cap), so the driver row
    # can never again be a vacuous empty-vs-empty compare
    single = rows[_py_dhash(other)]
    assert single.n_docs == 1 and not single.is_dup


def test_dhash_cap_is_deterministic(spark, tmp_path):
    """With >20 distinct fingerprints the output is exactly 20 rows:
    all dup buckets first, then the smallest singleton fingerprints."""
    from hrfco_data_pipeline_spark.plans.llm import multimodal_dhash_dups

    import random

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    texts = []
    seen = set()
    while len(texts) < 30:
        t = "".join(rng.choice(alphabet) for _ in range(100))
        h = _py_dhash(t)
        if h not in seen:
            seen.add(h)
            texts.append(t)
    dup_pair = texts[0]
    shifted = "".join(chr(ord(ch) + 1) for ch in dup_pair)
    rows_in = [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    rows_in.append((99, shifted, "en", "web", len(shifted)))
    out_dir = _write_docs(spark, tmp_path, rows_in)
    got = multimodal_dhash_dups(spark, out_dir).collect()
    assert len(got) == 20
    assert got[0].dhash == _py_dhash(dup_pair) and got[0].n_docs == 2
    expected_singles = sorted(h for h in seen if h != _py_dhash(dup_pair))[:19]
    assert [r.dhash for r in got[1:]] == expected_singles


def _write_events(spark, tmp_path, rows):
    """(event_id, ts_str|None, event_type, value) -> events-shaped
    parquet dir (extra cols null)."""
    import datetime as dt

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
    full = [
        (
            i,
            dt.datetime.fromisoformat(ts) if ts else None,
            None,
            t,
            v,
            None,
        )
        for i, ts, t, v in rows
    ]
    out = str(tmp_path / "events_tbl")
    spark.createDataFrame(full, schema).write.parquet(f"{out}/events.parquet")
    return out


def test_trimmed_mean_hand_computed(spark, tmp_path):
    """11 values incl. two whales: k = floor(11/10) = 1 cut per end;
    kept = sorted[1:-1], recomputed in Python cents."""
    from hrfco_data_pipeline_spark.plans.relational import events_trimmed_mean

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0, -50.0]
    rows = [(i, None, "a", v) for i, v in enumerate(vals)]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_trimmed_mean(spark, sf).collect()}
    cents = sorted(round(v * 100) for v in vals)
    kept = cents[1:-1]
    r = got["a"]
    assert r.n == 11 and r.n_trimmed == 2
    assert r.lo_cents == kept[0] and r.hi_cents == kept[-1]
    assert r.trimmed_mean == sum(kept) / len(kept) / 100.0


def test_trimmed_mean_small_group_no_trim(spark, tmp_path):
    """n < 10 -> k = 0: the trimmed mean degrades to the plain mean."""
    from hrfco_data_pipeline_spark.plans.relational import events_trimmed_mean

    vals = [10.0, 20.0, 90.0]
    sf = _write_events(
        spark, tmp_path, [(i, None, "b", v) for i, v in enumerate(vals)]
    )
    r = events_trimmed_mean(spark, sf).collect()[0]
    assert r.n_trimmed == 0
    assert r.trimmed_mean == sum(round(v * 100) for v in vals) / 3 / 100.0


def test_running_records_hand_computed(spark, tmp_path):
    """values 1,3,2,3,5 in time order: records are 1,3,5 (the second 3
    ties the running max and must NOT count); first_cents = 100."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_running_records,
    )

    seq = [1.0, 3.0, 2.0, 3.0, 5.0]
    rows = [
        (i, f"2024-01-0{i + 1}T00:00:00", "a", v) for i, v in enumerate(seq)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = events_running_records(spark, sf).collect()[0]
    assert r.n == 5
    assert r.n_records == 3
    assert r.max_cents == 500
    assert r.first_cents == 100
    assert r.record_rate == 3 / 5


def test_running_records_python_recompute_on_corpus(spark):
    """sf0.001: recompute records per type in pure Python from the
    parquet (sorted by ts, event_id) and compare every column."""
    import duckdb

    from hrfco_data_pipeline_spark.plans.relational import (
        events_running_records,
    )

    rows = duckdb.sql(
        "SELECT event_type, ts, event_id, CAST(round(value*100) AS BIGINT)"
        " FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
        " WHERE value IS NOT NULL AND ts IS NOT NULL"
        " ORDER BY event_type, ts, event_id"
    ).fetchall()
    exp = {}
    for t, _, _, c in rows:
        st = exp.setdefault(t, {"n": 0, "recs": set(), "mx": None, "first": None})
        st["n"] += 1
        if st["mx"] is None or c > st["mx"]:
            st["mx"] = c
            st["recs"].add(c)
        if st["first"] is None:
            st["first"] = c
    got = {
        r.event_type: r
        for r in events_running_records(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(got) == set(exp)
    for t, st in exp.items():
        r = got[t]
        assert (r.n, r.n_records, r.max_cents, r.first_cents) == (
            st["n"],
            len(st["recs"]),
            st["mx"],
            st["first"],
        ), t


def test_source_kl_python_recompute(spark, tmp_path):
    """Two skewed sources: recompute KL(source || corpus) with
    math.log over exact counts (sorted-term fold mirrored)."""
    import math

    from hrfco_data_pipeline_spark.plans.llm import docs_source_kl_divergence

    texts = {
        "web": ["a a a b", "a b c"],
        "books": ["c c d d e", "d e e"],
    }
    rows, i = [], 0
    for src, docs in texts.items():
        for t in docs:
            rows.append((i, t, "en", src, len(t)))
            i += 1
    out_dir = _write_docs(spark, tmp_path, rows)
    got = {
        r.source: r for r in docs_source_kl_divergence(spark, out_dir).collect()
    }
    corpus: dict[str, int] = {}
    per_src: dict[str, dict[str, int]] = {}
    for src, docs in texts.items():
        d = per_src.setdefault(src, {})
        for t in docs:
            for tok in t.split():
                d[tok] = d.get(tok, 0) + 1
                corpus[tok] = corpus.get(tok, 0) + 1
    n_all = sum(corpus.values())
    for src, cnts in per_src.items():
        n_s = sum(cnts.values())
        terms = sorted(
            (c / n_s) * math.log((c / n_s) / (corpus[t] / n_all))
            for t, c in cnts.items()
        )
        acc = 0.0
        for x in terms:
            acc += x
        r = got[src]
        assert r.n_tokens == n_s and r.vocab == len(cnts)
        assert r.kl_nats == round(acc, 4)
        assert r.kl_nats >= 0  # KL >= 0 up to rounding


def test_drought_runs_invariants_and_consistency(spark):
    """sf0.001: structural invariants plus n_days consistency with the
    oracle-certified pettitt changepoint substrate."""
    from hrfco_data_pipeline_spark.plans.hydro import (
        drought_runs,
        pettitt_changepoint,
    )

    sf = "/root/testdata/sf0.001"
    rows = drought_runs(spark, sf).collect()
    assert rows
    nd = {r.station: r.n_days for r in pettitt_changepoint(spark, sf).collect()}
    for r in rows:
        assert r.n_days == nd[r.station]
        assert 1 <= r.n_droughts <= r.drought_days <= r.n_days
        assert 1 <= r.max_run_days <= r.drought_days
        assert 0 <= r.max_event_deficit_cents <= r.total_deficit_cents
        assert len(r.longest_start_day) == 8 and r.longest_start_day.isdigit()
        # ~20% of days sit at/below the 20th-percentile threshold
        assert r.drought_days >= int(0.2 * r.n_days) - 1


def test_quality_calibration_python_recompute(spark):
    """sf0.001: replicate the hashed-logistic z fold AND the Gopher
    label in pure Python (hashlib md5), bucket by the shared ln-odds
    cuts, and compare every bucket row."""
    import duckdb
    import hashlib

    from hrfco_data_pipeline_spark.plans.llm import (
        _LOGIT_CUTS,
        docs_quality_calibration,
    )

    docs = duckdb.sql(
        "SELECT doc_id, text FROM"
        " read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    md = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    exp: dict[int, list[int]] = {}
    for doc_id, text in docs:
        toks = text.strip().split()
        counts: dict[int, int] = {}
        for tok in toks:
            b = md(tok.lower()) % 256
            counts[b] = counts.get(b, 0) + 1
        n = sum(counts.values())
        acc = 0.0
        for b in sorted(counts):
            w = (md(str(b)) % 2001 - 1000) / 1000.0
            acc += counts[b] * w
        z = acc / n
        bucket = sum(1 for c in _LOGIT_CUTS if z >= c)
        # gopher label
        wl = round(sum(len(t) for t in toks) / len(toks), 4)
        fs = round(sum(1 for t in toks if len(t) <= 2) / len(toks), 4)
        tc: dict[str, int] = {}
        for t in toks:
            tc[t] = tc.get(t, 0) + 1
        top = max(tc.values())
        keep = (
            len(toks) >= 30
            and 2.5 <= wl <= 10.0
            and fs <= 0.3
            and top / len(toks) <= 0.2
        )
        exp.setdefault(bucket, []).append(1 if keep else 0)
    got = {
        r.prob_decile: r
        for r in docs_quality_calibration(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(got) == set(exp)
    for b, keeps in exp.items():
        r = got[b]
        assert r.n_docs == len(keeps)
        assert r.n_gopher_keep == sum(keeps)
        assert r.gopher_keep_rate == sum(keeps) / len(keeps)


def test_duplicate_invoices_python_recompute(spark, tmp_path):
    """Crafted orders: exact top-20 pair list recomputed in Python."""
    import datetime as dt
    import itertools

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from hrfco_data_pipeline_spark.plans.relational import (
        orders_duplicate_invoices,
    )

    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    base = dt.datetime(2024, 1, 1)
    # 3 customers x 5 orders; cust 1 has an exact dup pair (score 0)
    raw = []
    k = 0
    for cust in (1, 2, 3):
        for j in range(5):
            price = 100.0 * cust + 7.77 * j + (0.0 if (cust == 1 and j == 4) else 0.0)
            date = base + dt.timedelta(days=3 * j + cust)
            raw.append((k, cust, "O", price, date, "1-URGENT"))
            k += 1
    # exact duplicate of cust 1's first order, same day
    raw.append((k, 1, "O", 100.0, base + dt.timedelta(days=1), "1-URGENT"))
    out = str(tmp_path / "orders_tbl")
    spark.createDataFrame(raw, schema).write.parquet(f"{out}/orders.parquet")

    per_cust: dict[int, list] = {}
    for okey, cust, _, price, date, _ in raw:
        per_cust.setdefault(cust, []).append(
            (okey, round(price * 100), date.date())
        )
    pairs = []
    for cust, orders in per_cust.items():
        for (k1, c1, d1), (k2, c2, d2) in itertools.combinations(orders, 2):
            if k1 > k2:
                k1, c1, d1, k2, c2, d2 = k2, c2, d2, k1, c1, d1
            cd = abs(c1 - c2)
            dg = abs((d1 - d2).days)
            pairs.append((cd + 100 * dg, k1, k2, cust, cd, dg))
    pairs.sort()
    want = pairs[:20]
    got = orders_duplicate_invoices(spark, out).collect()
    assert len(got) == len(want)
    assert got[0].score == 0  # the planted exact dup
    for g, w in zip(got, want):
        assert (g.score, g.k1, g.k2, g.custkey, g.cents_diff, g.day_gap) == w


def test_psi_python_recompute(spark, tmp_path):
    """Crafted shifted distribution: recompute the decile edges, the
    midpoint split, the +1-smoothed shares, and the sorted-fold PSI
    entirely in Python."""
    import math

    from hrfco_data_pipeline_spark.plans.relational import events_psi_by_type

    # type 'a' drifts upward in the second half; type 'b' stays flat
    rows = []
    eid = 0
    for day in range(1, 11):  # days 1..10, midpoint day 5
        for j in range(10):
            va = float(j + (20 if day > 5 else 0))
            vb = float(j * 3)
            rows.append((eid, f"2024-01-{day:02d}T12:00:00", "a", va))
            eid += 1
            rows.append((eid, f"2024-01-{day:02d}T12:00:00", "b", vb))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_psi_by_type(spark, sf).collect()}

    # python recompute (same construction)
    recs = []
    eid = 0
    base_day = None
    import datetime as dt

    for day in range(1, 11):
        d = (dt.date(2024, 1, day) - dt.date(1970, 1, 1)).days
        for j in range(10):
            recs.append((eid, d, "a", float(j + (20 if day > 5 else 0))))
            eid += 1
            recs.append((eid, d, "b", float(j * 3)))
            eid += 1
    n = len(recs)
    by_v = sorted(recs, key=lambda r: (r[3], r[0]))
    cuts = {int((n * i - 1) // 10) + 1 for i in range(1, 10)}
    edges = [by_v[c - 1][3] for c in sorted(cuts)]
    dmin = min(r[1] for r in recs)
    dmax = max(r[1] for r in recs)
    mid = (dmin + dmax) // 2
    exp = {}
    for t in ("a", "b"):
        c1 = [0] * 10
        c2 = [0] * 10
        for _, d, tt, v in recs:
            if tt != t:
                continue
            b = sum(1 for e in edges if v > e)
            if d <= mid:
                c1[b] += 1
            else:
                c2[b] += 1
        n1, n2 = sum(c1), sum(c2)
        terms = sorted(
            ((c1[b] + 1) / (n1 + 10) - (c2[b] + 1) / (n2 + 10))
            * math.log(
                ((c1[b] + 1) / (n1 + 10)) / ((c2[b] + 1) / (n2 + 10))
            )
            for b in range(10)
        )
        acc = 0.0
        for x in terms:
            acc += x
        exp[t] = (n1, n2, round(acc, 4))
    for t in ("a", "b"):
        r = got[t]
        assert (r.n_first, r.n_second, r.psi) == exp[t], t
    # the drifted type must score far above the stable one
    assert got["a"].psi > 0.25 > got["b"].psi >= 0


def test_simhash_bit_balance_python_recompute(spark):
    """sf0.001: recompute the 60-bit fingerprints (hashlib md5 votes)
    and every per-bit set count in pure Python."""
    import duckdb
    import hashlib

    from hrfco_data_pipeline_spark.plans.llm import simhash_bit_balance

    docs = duckdb.sql(
        "SELECT doc_id, text FROM"
        " read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    n_set = [0] * 60
    for _, text in docs:
        votes = [0] * 60
        for tok in text.strip().split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for j in range(60):
                votes[j] += 1 if (h >> j) & 1 else -1
        for j in range(60):
            if votes[j] > 0:
                n_set[j] += 1
    got = {
        r.bit: r
        for r in simhash_bit_balance(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(got) == set(range(60))
    for j in range(60):
        assert got[j].n_docs == len(docs)
        assert got[j].n_set == n_set[j], j
        assert got[j].set_share == n_set[j] / len(docs)


def test_centroid_occupancy_invariants(spark):
    """sf0.001: cells partition the corpus exactly; shares sum to 1;
    the imbalance factor is the k*sum(s^2)/total^2 chain and >= 1
    (Cauchy-Schwarz, equality iff perfectly balanced)."""
    import duckdb

    from hrfco_data_pipeline_spark.plans.llm import ann_centroid_occupancy

    n_emb = duckdb.sql(
        "SELECT count(*) FROM"
        " read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    ).fetchone()[0]
    rows = ann_centroid_occupancy(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_vecs for r in rows)
    assert total == n_emb
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    k = len(rows)
    ss = sum(r.n_vecs**2 for r in rows)
    want_if = (k * ss) / (total * total)
    for r in rows:
        assert r.imbalance_factor == want_if
        assert r.share == r.n_vecs / total
    assert want_if >= 1.0


def test_packing_waste_python_recompute(spark):
    """sf0.001: exact integer chunk/pad arithmetic recomputed from
    the parquet token counts for all four candidate lengths."""
    import duckdb
    import math

    from hrfco_data_pipeline_spark.plans.llm import docs_packing_waste

    lens = [
        n
        for (n,) in duckdb.sql(
            r"SELECT len(regexp_split_to_array(trim(text), '\s+')) FROM"
            " read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
        if n > 0
    ]
    got = {
        r.seq_len: r
        for r in docs_packing_waste(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(got) == {256, 512, 1024, 2048}
    for L in (256, 512, 1024, 2048):
        chunks = [math.ceil(n / L) for n in lens]
        pad = [c * L - n for c, n in zip(chunks, lens)]
        r = got[L]
        assert r.n_docs == len(lens)
        assert r.total_tokens == sum(lens)
        assert r.total_chunks == sum(chunks)
        assert r.total_pad == sum(pad)
        assert r.pad_share == sum(pad) / (sum(lens) + sum(pad))
    # longer contexts always waste at least as much padding
    assert (
        got[256].total_pad
        <= got[512].total_pad
        <= got[1024].total_pad
        <= got[2048].total_pad
    )


def test_fano_hand_computed(spark, tmp_path):
    """Clumped vs regular arrivals over a 4-day range: Fano recomputed
    from the closed form (D*s2 - n^2)/(D*n) with zero days counted."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_burstiness_fano,
    )

    rows = []
    eid = 0
    # 'bursty': 8 events on day 1, 0 on days 2-4
    for _ in range(8):
        rows.append((eid, "2024-01-01T10:00:00", "bursty", 1.0))
        eid += 1
    # 'regular': 2 events each day 1-4
    for d in range(1, 5):
        for _ in range(2):
            rows.append((eid, f"2024-01-0{d}T10:00:00", "regular", 1.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_burstiness_fano(spark, sf).collect()}
    # D = 4 (corpus day range); bursty: n=8, s2=64 -> (4*64-64)/(4*8)=6
    b = got["bursty"]
    assert (b.n_events, b.n_days_active, b.n_days_total) == (8, 1, 4)
    assert b.fano == (4 * 64 - 64) / (4 * 8) == 6.0
    # regular: n=8, s2=4*4=16 -> (64-64)/32 = 0
    r = got["regular"]
    assert (r.n_events, r.n_days_active, r.n_days_total) == (8, 4, 4)
    assert r.fano == 0.0


def test_reconciliation_hand_computed(spark, tmp_path):
    """Crafted header/lines: one exact match, one 0.5% off, one 5%
    off, one with no lines — band counts recomputed by hand in
    integer ten-thousandth-cents."""
    import datetime as dt

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from hrfco_data_pipeline_spark.plans.relational import (
        orders_amount_reconciliation,
    )

    oschema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    lschema = StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    )
    d = dt.datetime(2024, 1, 1)
    # line value units = cents(ext) * (100-disc) * (100+tax)
    # order 1: ext 100.00, disc 0, tax 0 -> 10000*100*100 = 1e8 units
    #          header 100.00 -> 10000*10000 = 1e8 -> exact
    # order 2: header 100.50 vs lines 100.00 -> 0.4975% off (within 1%)
    # order 3: header 105.00 vs lines 100.00 -> ~4.76% off (within 10%)
    # order 4: no lines
    orders = [
        (1, 1, "O", 100.00, d, "1"),
        (2, 1, "O", 100.50, d, "1"),
        (3, 1, "F", 105.00, d, "1"),
        (4, 1, "F", 50.00, d, "1"),
    ]
    lines = [
        (1, 1, 1, 1, 1.0, 100.00, 0.0, 0.0, "N", "O", d),
        (2, 1, 1, 1, 1.0, 100.00, 0.0, 0.0, "N", "O", d),
        (3, 1, 1, 1, 1.0, 100.00, 0.0, 0.0, "N", "O", d),
    ]
    out = str(tmp_path / "recon")
    spark.createDataFrame(orders, oschema).write.parquet(f"{out}/orders.parquet")
    spark.createDataFrame(lines, lschema).write.parquet(f"{out}/lineitem.parquet")
    got = {
        r.o_orderstatus: r
        for r in orders_amount_reconciliation(spark, out).collect()
    }
    o = got["O"]
    assert (o.n_orders, o.n_no_lines) == (2, 0)
    assert (o.n_within_0p1pct, o.n_within_1pct, o.n_within_10pct) == (1, 2, 2)
    f = got["F"]
    assert (f.n_orders, f.n_no_lines) == (2, 1)
    # the no-lines order is excluded from every band
    assert (f.n_within_0p1pct, f.n_within_1pct, f.n_within_10pct) == (0, 0, 1)


def test_churn_sensitivity_python_recompute(spark):
    """sf0.001: recompute last-order days and all three cutoffs in
    pure Python from the parquet."""
    import duckdb

    from hrfco_data_pipeline_spark.plans.relational import (
        customer_churn_sensitivity,
    )

    rows = duckdb.sql(
        "SELECT o_custkey, CAST(date_diff('day', DATE '1970-01-01',"
        " CAST(o_orderdate AS DATE)) AS BIGINT) FROM"
        " read_parquet('/root/testdata/sf0.001/orders.parquet')"
    ).fetchall()
    last: dict[int, int] = {}
    dmax = 0
    for c, d in rows:
        last[c] = max(last.get(c, 0), d)
        dmax = max(dmax, d)
    got = {
        r.cutoff_days: r
        for r in customer_churn_sensitivity(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(got) == {30, 60, 90}
    for cut in (30, 60, 90):
        churned = sum(1 for d in last.values() if d < dmax - cut)
        r = got[cut]
        assert r.n_customers == len(last)
        assert r.n_churned == churned
        assert r.churn_rate == churned / len(last)
    # monotone: stricter cutoff -> fewer churned
    assert got[30].n_churned >= got[60].n_churned >= got[90].n_churned


def test_pca_explained_variance_invariants(spark):
    """sf0.001: the ratio is in (0, 1]; the dominant dim matches the
    PCA query's max-|loading| dimension; n matches the table."""
    import duckdb

    from hrfco_data_pipeline_spark.plans.llm import (
        embedding_pca_explained_variance,
        embedding_pca_power_iteration,
    )

    sf = "/root/testdata/sf0.001"
    r = embedding_pca_explained_variance(spark, sf).collect()[0]
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/embeddings.parquet')"
    ).fetchone()[0]
    assert r.n_vecs == n
    assert 0.0 < r.ev_ratio <= 1.0
    loadings = embedding_pca_power_iteration(spark, sf).collect()
    best = max(loadings, key=lambda x: (abs(x.loading), -x.dim))
    assert r.dominant_dim == best.dim


def test_vocab_coverage_python_recompute(spark):
    """sf0.001: full Python recompute of the coverage cuts under the
    (freq desc, token asc) total order."""
    import duckdb

    from hrfco_data_pipeline_spark.plans.llm import docs_vocab_coverage_curve

    toks = duckdb.sql(
        r"SELECT unnest(regexp_split_to_array(trim(text), '\s+')) FROM"
        " read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    freq: dict[str, int] = {}
    for (t,) in toks:
        freq[t] = freq.get(t, 0) + 1
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    got = {
        r.k_requested: r
        for r in docs_vocab_coverage_curve(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(got) == {100, 1000, 10000}
    for k in (100, 1000, 10000):
        kk = min(k, len(ordered))
        covered = sum(c for _, c in ordered[:kk])
        r = got[k]
        assert r.k_effective == kk
        assert r.vocab == len(ordered)
        assert r.covered_tokens == covered
        assert r.total_tokens == total
        assert r.coverage == covered / total
    # coverage is nondecreasing in k
    assert got[100].coverage <= got[1000].coverage <= got[10000].coverage
