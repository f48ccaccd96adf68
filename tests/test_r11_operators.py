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
