"""Near-duplicate detection at scale: MinHash-LSH, SimHash, embedding LSH.

All JVM-side (higher-order array functions + xxhash64) — no Python in
the hot path. Scale shape:

- ``minhash_signatures``: one pass over documents, k hashes per shingle
  set computed inside a single codegen'd projection;
- ``lsh_candidate_pairs``: signatures → (band_id, band_hash) keys →
  self-join per bucket. Unlike the all-pairs shingle join
  (plans/llm.py), the shuffle key space is bands×buckets, so the join
  fan-out is bounded by bucket size — this is the 100 TB path;
- ``simhash_64``: 64-bit fingerprint; near-dups differ in few bits.
- ``random_hyperplane_signature``: sign-LSH for embedding cosine
  near-dup — planes are deterministic literals (seeded), the dot
  products fold JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingle_array(text: Column, n: int = 5) -> Column:
    """Distinct n-token shingles of a whitespace-tokenized text column."""
    toks = F.split(F.trim(text), r"\s+")
    cnt = F.size(toks)
    return F.when(
        cnt >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), cnt - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n))),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    shingle_n: int = 5,
) -> DataFrame:
    """id → k-element MinHash signature over the shingle set.

    h_i(S) = min_{s∈S} xxhash64(i ⊕ s); one projection, no shuffle.
    """
    sh = shingle_array(F.col(text_col), shingle_n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.xxhash64(i.cast("string"), s))
        ),
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 16, k: int = 64
) -> DataFrame:
    """Band the signatures; docs sharing any band bucket are candidates.

    rows/band = k/bands. Output: (id_a, id_b, est_jaccard) where
    est_jaccard = fraction of equal minhashes — the unbiased Jaccard
    estimator. Shuffle key = (band, band_hash): bounded buckets, no
    quadratic blowup.
    """
    rows = k // bands
    banded = sig_df.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("sig", b * rows + 1, rows),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.size("sig_a")
    )
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    k: int = 64,
    bands: int = 16,
) -> DataFrame:
    """End-to-end near-dup pairs above the estimated-Jaccard threshold."""
    sigs = minhash_signatures(df, text_col, id_col, k=k)
    pairs = lsh_candidate_pairs(sigs, bands=bands, k=k)
    return pairs.filter(F.col("est_jaccard") >= threshold)


def simhash_64(text: Column) -> Column:
    """64-bit SimHash of the whitespace token multiset (JVM-side).

    bit_j(doc) = sign of Σ_tokens (±1 depending on bit j of
    xxhash64(token)). Built as a fold over the token array producing a
    64-element counter array, then collapsed to a long. One projection;
    heavy but linear, no shuffle.
    """
    toks = F.split(F.trim(text), r"\s+")
    # nb: F.shiftright/shiftleft take a *Python int* shift, so the 64
    # bit positions are unrolled as literal expressions, not a HOF lambda
    counters = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1, 1
                    )
                    .otherwise(-1)
                    .cast("long")
                    for j in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    bit_longs = F.array(
        *[
            F.when(
                F.element_at(counters, j + 1) > 0,
                F.shiftleft(F.lit(1).cast("long"), j),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(64)
        ]
    )
    return F.aggregate(bit_longs, F.lit(0).cast("long"), lambda acc, x: acc + x)


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Candidate generation blocks on 16-bit chunks (pigeonhole: distance
    ≤3 ⇒ at least one of 4 chunks equal), so the join key space is
    chunk values, not all-pairs.
    """
    hashed = df.select(
        F.col(id_col).alias("id"), simhash_64(F.col(text_col)).alias("sh")
    )
    chunked = hashed.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("sh", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("id", "sh", F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))
    a, b = chunked.alias("a"), chunked.alias("b")
    hamming = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
