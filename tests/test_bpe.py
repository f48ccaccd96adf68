"""Distributed BPE training vs an independent pure-Python reference."""

from __future__ import annotations

from collections import Counter

from hrfco_data_pipeline_spark.operators.bpe import bpe_learn, bpe_token_counts


def _python_bpe(texts: list[str], n_merges: int):
    """Textbook BPE (Sennrich et al.): vocabulary-weighted pair counts,
    greedy left-to-right merge, ties on (count desc, left, right)."""
    vocab = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms, wn in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += wn
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, n))
        new_vocab = Counter()
        for syms, wn in vocab.items():
            out, carry = [], None
            for x in syms:
                if carry == left and x == right:
                    out.append(left + right)
                    carry = None
                else:
                    if carry is not None:
                        out.append(carry)
                    carry = x
            if carry is not None:
                out.append(carry)
            new_vocab[tuple(out)] += wn
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "newer newest new new new wider wide",
    "low lower newer wide wide",
]


def test_bpe_learn_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = bpe_learn(docs, n_merges=6)
    want = _python_bpe(TEXTS, 6)
    assert got == want
    # sanity: the corpus's dominant digraphs got merged first
    assert got[0][0:2] in {("l", "o"), ("o", "w"), ("n", "e"), ("e", "w")}


def test_bpe_learn_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    assert bpe_learn(docs, n_merges=4) == bpe_learn(docs, n_merges=4)


def test_bpe_token_counts_match_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_counts(docs, n_merges=6).collect()
    }
    # python reference: learn on the same corpus, encode each doc
    merges = _python_bpe(TEXTS, 6)

    def encode(word):
        syms = list(word)
        for left, right, _ in merges:
            out, carry = [], None
            for x in syms:
                if carry == left and x == right:
                    out.append(left + right)
                    carry = None
                else:
                    if carry is not None:
                        out.append(carry)
                    carry = x
            if carry is not None:
                out.append(carry)
            syms = out
        return len(syms)

    for i, t in enumerate(TEXTS):
        ws = t.strip().lower().split()
        assert got[i] == (len(ws), sum(encode(w) for w in ws))
