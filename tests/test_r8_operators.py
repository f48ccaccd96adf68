"""r8 operators: k-core peeling semantics, BM25 ranking sanity."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (parity with sibling files)


def _write_orders(spark, tmp_path, orders):
    rows = []
    for ok, parts in enumerate(orders):
        for ln, p in enumerate(parts):
            rows.append((ok, p, ln + 1))
    spark.createDataFrame(
        rows, ["l_orderkey", "l_partkey", "l_linenumber"]
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def test_kcore_peels_tail_keeps_triangle(spark, tmp_path):
    """Triangle 1-2-3 plus a pendant 1-4 edge (all support-2): the
    2-core strips the pendant and keeps the triangle with in-core
    degree 2 each; the 3-core is empty (triangle degrees are 2)."""
    from hrfco_data_pipeline_spark.plans.relational import copurchase_kcore

    orders = [[1, 2, 3], [1, 2, 3], [1, 4], [1, 4]]
    _write_orders(spark, tmp_path, orders)
    got = {
        r.part: r.core_degree
        for r in copurchase_kcore(spark, str(tmp_path), k=2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
    assert copurchase_kcore(spark, str(tmp_path), k=3).count() == 0


def test_kcore_cascade_needs_multiple_rounds(spark, tmp_path):
    """A chain hanging off a 4-clique peels one link per round — the
    cascade the fixed-round loop must carry through: clique {1,2,3,4}
    plus chain 4-5, 5-6. k=2 keeps only the clique (chain unravels
    end-first across two rounds); one round is not enough."""
    from hrfco_data_pipeline_spark.plans.relational import copurchase_kcore

    clique = [[1, 2, 3, 4], [1, 2, 3, 4]]
    chain = [[4, 5], [4, 5], [5, 6], [5, 6]]
    _write_orders(spark, tmp_path, clique + chain)
    got = {
        r.part: r.core_degree
        for r in copurchase_kcore(spark, str(tmp_path), k=2).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # Under-sized rounds: node 5 only peels after 6 is gone, so with
    # rounds=1 it survives the LOOP — but the r9 final degree gate
    # (advisor item: restore the k-core invariant on emitted rows)
    # drops it from the OUTPUT, since its residual degree 1 < k. The
    # remaining honest truncation artifact is node 4's degree still
    # counting the unpeeled 5 (4 instead of the converged 3).
    partial = {
        r.part: r.core_degree
        for r in copurchase_kcore(spark, str(tmp_path), k=2, rounds=1).collect()
    }
    assert 5 not in partial
    assert partial == {1: 3, 2: 3, 3: 3, 4: 4}
    assert all(deg >= 2 for deg in partial.values())


def test_hilbert_index_matches_reference_walk(spark):
    """hilbert_index vs a straight Python xy2d port over the full
    16x16 grid (bits=4): bijection onto 0..255 and every consecutive
    pair of curve positions is an ADJACENT cell — the locality
    property that makes Hilbert sharding beat Morton."""
    from hrfco_data_pipeline_spark.operators.bucketing import hilbert_index

    def xy2d(order, x, y):
        d = 0
        s = order // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    cells = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(cells, "x long, y long")
    got = {
        (r.x, r.y): r.d
        for r in df.select(
            "x", "y", hilbert_index(F.col("x"), F.col("y"), bits=4).alias("d")
        ).collect()
    }
    want = {(x, y): xy2d(16, x, y) for x, y in cells}
    assert got == want
    assert sorted(got.values()) == list(range(256))  # bijection
    by_d = {d: xy for xy, d in got.items()}
    for d in range(255):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit steps only


def test_rake_scores_known_corpus(spark, tmp_path):
    """Hand-checked RAKE on a two-doc corpus: stopword segmentation,
    corpus-wide deg/freq, phrase score = sum of word scores."""
    from hrfco_data_pipeline_spark.plans.llm import docs_rake_keyphrases

    rows = [
        (1, "deep learning the deep learning a net", "en", "s", 0),
        (2, "net the deep net", "en", "s", 0),
    ]
    # phrases: d1: [deep learning] x2, [net]; d2: [net], [deep net]
    # freq: deep 3, learning 2, net 3
    # deg:  deep 2+2+2=6, learning 4, net 1+1+2=4
    # wscore: deep 2.0, learning 2.0, net 4/3
    # scores: "deep learning" 4.0, "net" 4/3, "deep net" 2 + 4/3
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.doc_id, r.rank): (r.phrase, r.n_words, r.n_occurrences, r.score)
        for r in docs_rake_keyphrases(spark, str(tmp_path)).collect()
    }
    assert got[(1, 1)] == ("deep learning", 2, 2, 4.0)
    assert got[(1, 2)][0] == "net"
    assert abs(got[(1, 2)][3] - 4 / 3) < 1e-15
    assert got[(2, 1)] == ("deep net", 2, 1, 2.0 + 4 / 3)
    assert got[(2, 2)][0] == "net"


def test_image_patches_known_grid(spark):
    """Hand-checked 2-D patching: a 4x4 byte grid with patch=2 yields
    four patches whose energies are the quadrant sums; the ragged
    tail row (not a full grid row) is dropped."""
    from hrfco_data_pipeline_spark.operators.multimodal import image_patches

    grid = bytes(
        [1, 2, 10, 20,
         3, 4, 30, 40,
         5, 6, 50, 60,
         7, 8, 70, 80,
         9, 9, 9]  # ragged tail: dropped (only 3 of 4 row bytes)
    )
    mm = spark.createDataFrame(
        [(1, "image-blob", grid)], "doc_id long, modality string, content binary"
    )
    got = {
        (r.py, r.px): r.energy
        for r in image_patches(mm, width=4, patch=2).collect()
    }
    assert got == {
        (0, 0): 1 + 2 + 3 + 4,
        (0, 1): 10 + 20 + 30 + 40,
        (1, 0): 5 + 6 + 7 + 8,
        (1, 1): 50 + 60 + 70 + 80,
    }

    import pytest

    with pytest.raises(ValueError):
        image_patches(mm, width=4, patch=3)


def test_bm25_prefers_higher_tf_shorter_docs(spark, tmp_path):
    """Sanity on the scoring direction: for a one-term query, a doc
    with more hits outranks fewer hits; equal hits, the shorter doc
    wins (length normalization)."""
    from hrfco_data_pipeline_spark.plans.llm import docs_bm25_topk

    rows = [
        (1, "hash hash hash pad pad pad", "en", "s", 0),
        (2, "hash pad pad pad pad pad", "en", "s", 0),
        (3, "hash pad", "en", "s", 0),
        (4, "pad pad pad", "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = [
        r.doc_id
        for r in docs_bm25_topk(spark, str(tmp_path))
        .filter("query_id = 1")
        .orderBy("rank")
        .collect()
    ]
    # query 1 = [hash, join]; doc 4 has no query term at all
    assert out[0] == 1  # highest tf
    assert out[1] == 3  # tf=1 but dl=2 beats tf=1 dl=6
    assert out[2] == 2
    assert 4 not in out


def test_kmv_setops_matches_bruteforce(spark, tmp_path):
    """Brute-force twin: overlapping user sets (200 in X, 200 in Y,
    100 shared) — X/Y exceed k=64 so the ESTIMATION branch runs, the
    union sketch merges, and every emitted number (exact longs and
    raw-double estimates) must equal the Python recomputation
    bit-for-bit (same Knuth hash, same single int/int->double
    division, same (a + b) - union chain)."""
    from hrfco_data_pipeline_spark.plans.relational import events_kmv_setops

    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(u, "X", t0) for u in range(1, 201)] + [
        (u, "Y", t0) for u in range(101, 301)
    ]
    spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    K, M = 64, 2**31
    h = lambda u: ((u % M) * 2654435761) % M  # noqa: E731
    mins = lambda us: sorted(h(u) for u in us)[:K]  # noqa: E731
    est = lambda km: float(len(km)) if len(km) < K else (K - 1) * M / km[-1]  # noqa: E731
    x = set(range(1, 201))
    y = set(range(101, 301))
    kx, ky = mins(x), mins(y)
    ku = sorted(set(kx) | set(ky))[:K]
    want = {
        "exact_a": len(x),
        "exact_b": len(y),
        "exact_union": len(x | y),
        "exact_inter": len(x & y),
        "kmv_a": est(kx),
        "kmv_b": est(ky),
        "kmv_union": est(ku),
        "kmv_inter": (est(kx) + est(ky)) - est(ku),
    }

    got = events_kmv_setops(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0].asDict()
    assert (r["type_a"], r["type_b"]) == ("X", "Y")
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    # sanity: the k=64 sketch really is estimating, not enumerating
    assert r["kmv_a"] != r["exact_a"]
