"""LLM-training-data pipeline operators over documents/embeddings.

Beyond-reference surface (BASELINE.json north star): deduplication,
text analysis, similarity search, multimodal plumbing — each shaped for
100 TB:

- exact dedup: hash-groupBy — one shuffle on a 16-byte key, map-side
  partial counts;
- n-gram Jaccard near-dup: shingle-explode → self-join on shingle →
  pair aggregation. The shingle join is the classic MinHash-LSH
  *candidate generation* degenerate (bands = every shingle); at scale
  you band the minhashes instead (operators/dedup.py) — same plan
  shape, bounded key fan-out;
- ANN cosine: brute-force top-k for a bounded query set — a broadcast
  of the query vectors against a full scan, no quadratic shuffle;
- all expressions JVM-side (higher-order array functions, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hrfco_data_pipeline_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "data")


def _tokens(col: str = "text") -> Column:
    return F.split(F.trim(F.col(col)), r"\s+")


def _r4(c: Column) -> Column:
    return F.round(c, 4)



def _docs_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan routed through parallelize_small_scan — the
    CPU-heavy shingle/hash kernels below serialize on the testdata's
    single-split file otherwise (no-op on real multi-split layouts)."""
    from hrfco_data_pipeline_spark.sources.tables import parallelize_small_scan

    return parallelize_small_scan(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------

def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text hash; keeps min doc_id per group."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("text_hash", F.md5(F.lower(F.trim("text"))))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
    )


def docs_ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_shingle_df: int = 50,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup candidate pairs via 5-token shingle overlap + Jaccard.

    Plan: per-doc distinct shingle arrays → explode → self equi-join on
    shingle (doc_a < doc_b) → per-pair common count → Jaccard. The
    explode inflates rows ~|tokens| per doc, but the join key (shingle)
    is selective, so the shuffle carries only (shingle, doc_id) pairs.

    Hot-shingle cap: a shingle appearing in > ``max_shingle_df`` docs
    (boilerplate headers, licence blocks) would fan the self-join out
    quadratically in that bucket — the standard document-frequency cap
    drops those shingles from *candidate generation* (the Jaccard
    denominators still use the full shingle-set sizes, so reported
    similarity is a lower bound for affected pairs). The hot set is
    tiny by construction, so it broadcasts into a left-anti join.

    Why groupBy+broadcast-anti rather than a count-window on the same
    key: groupBy partial-aggregates map-side, so a pathological shingle
    (df in the millions) never concentrates its raw rows in one task —
    a window over partitionBy(s) would.
    """
    docs = _docs_parallel(spark, sf_dir)
    toks = docs.select("doc_id", _tokens().alias("toks"))
    n = F.size("toks")
    shingles = F.when(
        n >= 5,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 4),
                lambda i: F.concat_ws(" ", F.slice("toks", i, F.lit(5))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = toks.select("doc_id", shingles.alias("sh")).withColumn(
        "n_sh", F.size("sh")
    )
    # shuffle int64 shingle hashes, not the strings: same pairs (xxhash64
    # collisions are ~2^-64), a fraction of the shuffle bytes
    cached = sh.select(
        "doc_id",
        "n_sh",
        F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("s"),
    ).persist()
    hot = (
        cached.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_shingle_df)
        .select("s")
    )
    ex = cached.join(F.broadcast(hot), "s", "left_anti")
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    out = pairs.filter(jac >= 0.2).select(
        "doc_a", "doc_b", "common", jac.alias("jaccard")
    )
    # materialize the (small) pair set so the exploded-shingle cache is
    # released before returning (reliable checkpoint on a cluster,
    # localCheckpoint locally — see operators/dedup._materialized);
    # materialize=False keeps the plan lazy for plan audits at the cost
    # of recomputing the explode per consumer
    from hrfco_data_pipeline_spark.operators.dedup import _materialized

    if materialize:
        out = _materialized(out)
        cached.unpersist()
    else:
        cached.unpersist(blocking=False)
    return out


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality signals, all higher-order-function based."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "n_chars", _tokens().alias("toks"))
    n = F.size("toks")
    total_len = F.aggregate(
        "toks", F.lit(0), lambda acc, x: acc + F.length(x)
    )
    n_uniq = F.size(F.array_distinct("toks"))
    stop_cnt = F.size(F.filter("toks", lambda x: x.isin(*STOPWORDS)))
    return t.select(
        "doc_id",
        "n_chars",
        n.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        (total_len.cast("double") / n).alias("avg_token_len"),
        (n_uniq.cast("double") / n).alias("ttr"),
        stop_cnt.alias("stopword_cnt"),
        (stop_cnt.cast("double") / n).alias("stopword_ratio"),
    )


def quality_score_expr(toks: Column) -> Column:
    """Composite quality score (length / diversity / stopword bands)
    from a token-array column — shared by the batch query and the
    streaming curation twin (streaming/curation.py)."""
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    ratio = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n
    return (
        F.when((n >= 20) & (n <= 1000), 0.4).otherwise(0.0)
        + F.when(ttr >= 0.3, 0.3).otherwise(0.0)
        + F.when((ratio >= 0.01) & (ratio <= 0.5), 0.3).otherwise(0.0)
    )


def docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate over the documents table — the heuristic filter an
    LLM-data pipeline runs before training."""
    docs = load_table(spark, sf_dir, "documents")
    score = quality_score_expr(_tokens())
    return docs.select(
        "doc_id", score.alias("quality"), (score >= 0.7).alias("keep")
    )


LANG_MARKERS = {
    "en": ("the", "a", "an", "of", "and"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def docs_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID heuristic with deterministic argmax."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", _tokens().alias("toks"))
    def _in_set(markers):
        # nb: a `m=m` default arg would change the lambda's arity, which
        # pyspark uses to decide between (value) and (value, index) HOFs
        return lambda x: x.isin(*markers)

    cnts = {
        lg: F.size(F.filter("toks", _in_set(m))) for lg, m in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    # deterministic argmax: earlier langs win ties (chain built in reverse)
    pred = F.lit("und")
    for lg in reversed(langs):
        no_one_beats = (
            sum((cnts[o] > cnts[lg]).cast("int") for o in langs if o != lg) == 0
        )
        pred = F.when((cnts[lg] > 0) & no_one_beats, lg).otherwise(pred)
    out = t.select(
        "doc_id",
        "lang",
        *[cnts[lg].alias(f"cnt_{lg}") for lg in langs],
        pred.alias("pred_lang"),
    )
    return out.withColumn("match", F.col("pred_lang") == F.col("lang"))


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: hash of the 8-token prefix (header hash) +
    full-text hash — the cheap pre-cluster key for near-dup pipelines."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens().alias("toks"), F.col("text"))
    return t.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice("toks", 1, 8))).alias("prefix_fp"),
        F.md5(F.lower(F.trim("text"))).alias("full_fp"),
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

def _dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a bounded query set (vec_id%50==0).

    Scale path: the query side is tiny → broadcast it and stream the
    corpus once; ranking is a per-query top-k (window over the join
    output). For corpus×corpus at 100 TB use the LSH-bucketed variant
    (operators/similarity.py) instead.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vecd = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    with_norm = vecd.withColumn("nrm", F.sqrt(_dot("v", "v")))
    q = with_norm.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    joined = with_norm.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = _r4(_dot("qv", "v") / (F.col("qn") * F.col("nrm")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        joined.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector stats (norm distribution)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecd = emb.select(
        "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    nrm = F.sqrt(_dot("v", "v"))
    return (
        vecd.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            _r4(F.avg("nrm")).alias("avg_norm"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
    )


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization stats per embedding — the storage-
    shrink pass an LLM-data pipeline runs before indexing.

    scale = max|v| / 127 (0-vector → scale 0, all-zero codes);
    q_i = floor(v_i / scale + 0.5) — explicit floor-plus-half instead of
    round() so Spark and DuckDB agree bit-for-bit on negatives and ties.
    Returns per-vector code stats (sum/min/max) rather than the int8
    array itself to keep the checked schema scalar.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    staged = emb.select("vec_id", v.alias("v"))
    amax = F.array_max(F.transform("v", F.abs))
    scale = amax / F.lit(127.0)
    q = F.when(amax == 0.0, F.transform("v", lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform("v", lambda x: F.floor(x / scale + F.lit(0.5)))
    )
    withq = staged.select("vec_id", _r4(scale).alias("scale"), q.alias("q"))
    return withq.select(
        "vec_id",
        "scale",
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


def embedding_quantize_bit_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantization-error curve by bit width: the embedding_quantize
    int8 scheme priced at 2/4/6/8 bits in ONE scan — per width, the
    exact nano-quantized reconstruction SSE total, its per-vector
    max, and the mean — the table that says how many bits the index
    actually needs before committing a corpus-wide re-encode (the
    docs_packing_waste capacity-planning pattern on the embedding
    axis). levels = 2^(b−1) − 1 (symmetric max-scale; b = 8 is the
    shipped embedding_quantize face).

    Exactness: q_i = floor(v_i/scale + 0.5) (the quantize face's
    portable floor-plus-half); the per-vector SSE folds left over the
    component array (order-pinned, identical IEEE chain both
    engines), is floor-quantized to integer nanos, and sums exactly —
    at sf0.1 the total stays ≳ 25× under 2^53 even at the 2-bit worst
    case (qerr ≤ dim·(amax/2)²·1e9 ≤ 1.6e10 per unit-norm-ish vector).
    avg_sse is one division chain on identical operands.

    Scale shape: one embeddings scan exploded ×4 (the bit axis is a
    literal), zero joins, one 4-group map-side-combined aggregate.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    grid = emb.select("vec_id", v.alias("v")).select(
        "vec_id",
        "v",
        F.explode(F.array(*[F.lit(b) for b in (2, 4, 6, 8)])).alias(
            "bits"
        ),
    )
    levels = (
        F.when(F.col("bits") == 2, 1)
        .when(F.col("bits") == 4, 7)
        .when(F.col("bits") == 6, 31)
        .otherwise(127)
    )
    amax = F.array_max(F.transform("v", F.abs))
    staged = grid.select(
        "bits", levels.alias("levels"), amax.alias("amax"), "v"
    )
    scale = F.col("amax") / F.col("levels").cast("double")

    def _sq(x):
        d = x - F.floor(x / scale + F.lit(0.5)) * scale
        return d * d

    sse = F.when(F.col("amax") == 0.0, F.lit(0.0)).otherwise(
        F.aggregate("v", F.lit(0.0), lambda acc, x: acc + _sq(x))
    )
    per = staged.select(
        "bits",
        "levels",
        F.floor(sse * F.lit(1e9)).cast("long").alias("qerr"),
    )
    return (
        per.groupBy("bits", "levels")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("qerr").alias("sum_qerr"),
            F.max("qerr").alias("max_qerr"),
        )
        .select(
            F.col("bits").cast("int").alias("bits"),
            F.col("levels").cast("int").alias("levels"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("sum_qerr").cast("long").alias("sum_qerr"),
            F.col("max_qerr").cast("long").alias("max_qerr"),
            F.round(
                F.col("sum_qerr").cast("double")
                / F.lit(1e9)
                / F.col("n_vecs").cast("double"),
                6,
            ).alias("avg_sse"),
        )
    )


def docs_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level shingle document-frequency table, top-50 — the stats
    pass that backs boilerplate detection / the hot-shingle cap in
    docs_ngram_jaccard_pairs. One explode + one partial-aggregated
    groupBy; top-K is TakeOrdered, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    n = F.size("toks")
    shingles = F.when(
        n >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.concat_ws(" ", F.slice("toks", i, F.lit(3))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = toks.select(F.explode(shingles).alias("shingle"))
    return (
        ex.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("shingle"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# Multimodal plumbing (binary columns + typed metadata)
# --------------------------------------------------------------------------

def multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat text as an opaque blob (the image/audio stand-in): encode to
    binary, carry byte-length + content hash metadata, aggregate per
    source. The decode/feature-extract stage is the pandas-UDF path in
    operators/multimodal.py (stubbed: codec libs absent here)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("blob"),
    ).select(
        "doc_id",
        "source",
        F.length("blob").alias("n_bytes"),
        F.md5("blob").alias("content_hash"),
    )
    return blob.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count_distinct("content_hash").alias("n_distinct_blobs"),
    )


# --------------------------------------------------------------------------
# Scale-path variants (rows-only driver checks: engine-specific hashing /
# pandas stages have no portable SQL twin)
# --------------------------------------------------------------------------

def minhash_near_dups(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """MinHash-LSH near-dup pairs (operators/dedup.py) — the bounded-
    shuffle variant of docs_ngram_jaccard_pairs. ``materialize=False``
    keeps the plan lazy for audits/schema-only callers."""
    from hrfco_data_pipeline_spark.operators.dedup import minhash_dedup

    docs = _docs_parallel(spark, sf_dir)
    return minhash_dedup(docs, threshold=0.5, materialize=materialize)


def simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-≤3 near-dup pairs (operators/dedup.py)."""
    from hrfco_data_pipeline_spark.operators.dedup import simhash_pairs

    docs = _docs_parallel(spark, sf_dir)
    return simhash_pairs(docs, max_hamming=3)


def lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH approximate cosine top-5 (operators/similarity.py) —
    the sub-linear variant of ann_cosine_topk. Oracle-backed: the
    plane constants are seeded literals and every double (signature
    dots, norms, cosines) is a fold-left the DuckDB twin reproduces
    bit-for-bit, so candidate banding and the raw-cosine ranking match
    exactly; only the displayed cosine is rounded."""
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        hyperplane_lsh_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    queries = vecs.filter(F.col("vec_id") % 50 == 0)
    topk = hyperplane_lsh_topk(vecs, queries, k=5, dim=64, n_planes=16, bands=4)
    return topk.select(
        F.col("qid").alias("query_id"),
        F.col("cid").alias("neighbor_id"),
        _r4(F.col("cos_sim")).alias("cos_sim"),
        "rank",
    )


def ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN top-5 (operators/similarity.py): corpus bucketed by
    nearest centroid, nprobe=1 — the inverted-file sibling of
    lsh_cosine_topk. Oracle-backed end to end: centroid training is
    exact integer arithmetic (floor-quantized DECIMAL sums over a
    portable md5-based cell pre-assignment, see ivf_centroids), so the
    DuckDB twin recomputes the identical centroid doubles, the same
    fold-left argmax cell assignment, and the same raw-cosine ranking;
    only the displayed cosine is rounded."""
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        ivf_centroids,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    cents = ivf_centroids(vecs, n_centroids=16, dim=64)
    queries = vecs.filter(F.col("vec_id") % 50 == 0)
    topk = ivf_topk(vecs, queries, cents, k=5)
    return topk.select(
        F.col("qid").alias("query_id"),
        F.col("cid").alias("neighbor_id"),
        _r4(F.col("cos_sim")).alias("cos_sim"),
        "rank",
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads
    (operators/multimodal.py, deterministic fake decode)."""
    from hrfco_data_pipeline_spark.operators.multimodal import (
        extract_features,
        to_multimodal,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(to_multimodal(docs), fake=True, n_bins=16)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("feature", 1), 6).alias("bin0"),
        F.round(F.element_at("feature", 2), 6).alias("bin1"),
    )


def docs_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: word pieces + standalone punctuation via
    a regex whose semantics agree between Java regex and RE2."""
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(
        F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return docs.select(
        "doc_id",
        F.size(pieces).alias("n_pieces"),
        F.size(F.array_distinct(pieces)).alias("n_uniq_pieces"),
    )


def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via sign-LSH banding
    (operators/similarity.lsh_near_dup_pairs). Oracle-backed: seeded
    literal planes + fold-left cosines are bit-identical in the DuckDB
    twin, so the banded candidate set and the >= threshold cut on the
    raw double agree exactly; only the displayed cosine is rounded."""
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        lsh_near_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    # the synthetic embeddings top out near cos~0.45; 0.35 captures the
    # genuine tail while keeping the candidate set sparse
    pairs = lsh_near_dup_pairs(vecs, threshold=0.35)
    return pairs.select("id_a", "id_b", _r4(F.col("cos_sim")).alias("cos_sim"))


def embedding_block_near_dups(
    spark: SparkSession, sf_dir: str, max_block: int = 64
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs, blocked by cluster label.

    The exact (non-LSH) twin of embedding_near_dups: instead of banded
    hyperplane signatures, candidate pairs come from a keyed self-join
    on a coarse partition key (the ``label`` column — in a real corpus,
    a k-means cluster id or shard key). Within-block all-pairs cosine,
    filtered at >= 0.3 on the 4-decimal-rounded value.

    Hot-block guard: a label with n rows costs n² pairs, and a single
    skewed label at corpus scale would put a quadratic block in one
    task. Labels over ``max_block`` rows are therefore sub-sharded:
    each row gets a deterministic sub-shard s = hash(vec_id) mod k with
    k = ceil(n/max_block), and the self-join runs per (sub-shard i,
    sub-shard j) pair-block, i <= j — the left side replicates a row
    into blocks (s, s..k-1), the right side into (0..s, s), so every
    unordered pair meets in exactly one block and no task ever handles
    more than ~max_block² candidate pairs. The output is invariant to
    the sharding (pairs are canonicalized to id_a < id_b), so the
    oracle twin is the plain label self-join. Replication cost per row
    is k+1 — linear in skew, versus quadratic task blow-up without it.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vecd = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    with_norm = vecd.withColumn("nrm", F.sqrt(_dot("v", "v")))
    counts = vecd.groupBy("label").agg(F.count("*").alias("n_lbl"))
    sharded = (
        with_norm.join(F.broadcast(counts), "label")
        .withColumn(
            "k",
            F.greatest(
                F.lit(1), F.ceil(F.col("n_lbl") / F.lit(max_block))
            ).cast("int"),
        )
        .withColumn("s", F.pmod(F.xxhash64("vec_id"), F.col("k")).cast("int"))
    )
    a = sharded.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("label"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        F.col("s").alias("bl_a"),
        F.explode(F.sequence(F.col("s"), F.col("k") - 1)).alias("br_a"),
    )
    b = sharded.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        F.explode(F.sequence(F.lit(0), F.col("s"))).alias("bl_b"),
        F.col("s").alias("br_b"),
    )
    pairs = a.join(
        b,
        (F.col("label") == F.col("lb"))
        & (F.col("bl_a") == F.col("bl_b"))
        & (F.col("br_a") == F.col("br_b"))
        & (F.col("id_a") != F.col("id_b")),
    )
    # diagonal blocks see both orderings of a pair — keep one; off-
    # diagonal blocks see exactly one ordering — canonicalize the ids
    dedup = pairs.filter(
        (F.col("bl_a") != F.col("br_a")) | (F.col("id_a") < F.col("id_b"))
    )
    cos = _r4(_dot("va", "vb") / (F.col("na") * F.col("nb")))
    return (
        dedup.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "label",
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )


def dedup_docs_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with keep-lowest-id policy — the surviving rows."""
    from hrfco_data_pipeline_spark.operators.dedup import dedup_keep_best

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text_hash", F.md5(F.lower(F.trim("text")))
    )
    kept = dedup_keep_best(docs, "text_hash", [F.asc("doc_id")])
    return kept.select("doc_id", "text_hash", "lang", "source")


# --------------------------------------------------------------------------
# Text normalization + PII redaction
# --------------------------------------------------------------------------

def docs_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/control-char normalization over an augmented corpus.

    The synthetic documents are already clean, so a deterministic
    fixture injects tabs/CRLF/padding per doc_id band — the operator
    (operators/textnorm.normalize_text) then has real work to undo.
    Pure projection: no shuffle, codegen'd regex, scales as the scan.
    """
    from hrfco_data_pipeline_spark.operators.textnorm import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    aug = (
        F.when(m == 0, F.concat("text", F.lit("\ttail\r\n")))
        .when(m == 1, F.concat(F.lit("  "), "text", F.lit("  ")))
        .otherwise(F.col("text"))
    )
    staged = docs.select("doc_id", aug.alias("raw"))
    norm = normalize_text("raw")
    return staged.select(
        "doc_id",
        F.length("raw").alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        F.md5(norm).alias("norm_hash"),
    )


def docs_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking (URL/email/phone/ID-run) with per-pattern counts.

    Deterministic PII fixture: each doc_id band gets one synthetic PII
    token appended so every mask is exercised; counts are taken on the
    progressively-redacted text (operators/textnorm.pii_counts) so a
    pattern inside an earlier match is never double-counted. The
    redacted-text md5 verifies the full replacement byte-for-byte.
    """
    from hrfco_data_pipeline_spark.operators.textnorm import pii_counts, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    did = F.col("doc_id").cast("string")
    aug = (
        F.when(m == 0, F.concat("text", F.lit(" contact a"), did, F.lit("@example.com")))
        .when(m == 1, F.concat("text", F.lit(" see https://data.example.org/d/"), did))
        .when(
            m == 2,
            F.concat(
                "text",
                F.lit(" call 010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit("-1234"),
            ),
        )
        .otherwise(
            F.concat(
                "text",
                F.lit(" ref 9"),
                F.lpad((F.col("doc_id") % 100000000).cast("string"), 8, "0"),
            )
        )
    )
    staged = docs.select("doc_id", aug.alias("raw"))
    return staged.select(
        "doc_id",
        *pii_counts("raw"),
        F.md5(redact_pii("raw")).alias("redacted_hash"),
    )


def docs_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: duplicate 3-gram fraction per doc —
    the Gopher-style quality signal that catches boilerplate loops and
    degenerate generations. dup_ngram_frac = 1 - distinct/total
    3-grams. Pure per-row HOFs: no shuffle, scales as the scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    n = F.size("toks")
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(" ", F.slice("toks", i, F.lit(3))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = toks.select("doc_id", grams.alias("g"))
    total = F.size("g")
    uniq = F.size(F.array_distinct("g"))
    return g.select(
        "doc_id",
        total.alias("n_grams"),
        uniq.alias("n_uniq_grams"),
        F.when(total > 0, 1.0 - uniq.cast("double") / total)
        .otherwise(F.lit(0.0))
        .alias("dup_gram_frac"),
    )


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any 3-token
    shingle with the eval set (doc_id % 97 == 0 stands in for the
    benchmark corpus).

    Scale shape: the eval shingle set is tiny relative to the corpus →
    distinct xxhash64 shingle keys, broadcast, left-semi join against
    the exploded training shingles. The training side never shuffles;
    contaminated ids come back from a map-side semi probe. This is the
    standard n-gram-overlap decontamination pass (GPT-3 appendix C
    style) expressed as a broadcast semi-join.
    """
    docs = load_table(spark, sf_dir, "documents")

    def _shingled(df: DataFrame) -> DataFrame:
        toks = df.select("doc_id", _tokens().alias("toks"))
        n = F.size("toks")
        shingles = F.when(
            n >= 3,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n - 2),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice("toks", i, F.lit(3)))
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return toks.select("doc_id", F.explode(shingles).alias("s"))

    # shingle the (tiny) eval split on its own scan — the big corpus is
    # tokenized exactly once, not once per side
    eval_sh = _shingled(docs.filter(F.col("doc_id") % 97 == 0)).select("s").distinct()
    train = _shingled(docs.filter(F.col("doc_id") % 97 != 0))
    contaminated = (
        train.join(F.broadcast(eval_sh), "s", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return contaminated.join(docs, "doc_id").select("doc_id", "lang", "source")


# --------------------------------------------------------------------------
# Corpus curation: sampling, domain mixing, sequence packing
# --------------------------------------------------------------------------

SAMPLE_RATES = {"en": 0.5, "de": 0.3, "fr": 0.3, "es": 0.2}
MIX_TARGETS = {"src0": 0.15, "src1": 0.15, "src2": 0.1, "src3": 0.05, "src4": 0.05}


def docs_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced deterministic sample (hash-bucket Bernoulli,
    per-stratum rates; operators/sampling.stratified_sample). Exactly
    reproducible across runs/engines — unlike F.rand, which re-deals on
    partition-layout changes (AQE, retries)."""
    from hrfco_data_pipeline_spark.operators.sampling import (
        hash_bucket,
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "doc_id", "lang", SAMPLE_RATES, default=0.1)
    return kept.select("doc_id", "lang", "source", hash_bucket("doc_id").alias("bucket"))


def docs_sample_hash_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample: top-100 by multiplicative key hash —
    the deterministic distributed analog of reservoir sampling. Plan is
    TakeOrderedAndProject (per-partition top-k then merge), never a
    global sort."""
    from hrfco_data_pipeline_spark.operators.sampling import KNUTH

    docs = load_table(spark, sf_dir, "documents")
    # pre-reduce mod 2^31 to stay in BIGINT under ANSI (identity for
    # the id range here; the oracle mirrors the unreduced form)
    m = F.lit(2_147_483_648)
    h = ((F.col("doc_id") % m) * F.lit(KNUTH)) % m
    return (
        docs.select("doc_id", "lang", "source", h.alias("h"))
        .orderBy(F.asc("h"), F.asc("doc_id"))
        .limit(100)
    )


def docs_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing plan: per-source keep rates realizing MIX_TARGETS
    in exact proportion, bounded by the scarcest targeted domain
    (operators/sampling.domain_mix_rates)."""
    from hrfco_data_pipeline_spark.operators.sampling import domain_mix_rates

    docs = load_table(spark, sf_dir, "documents")
    return domain_mix_rates(docs, "source", MIX_TARGETS)


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (512-token packs, per-language
    running sum; operators/sampling.pack_sequences)."""
    from hrfco_data_pipeline_spark.operators.sampling import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.size(_tokens()).alias("n_tokens"))
    return pack_sequences(toks, "n_tokens", "doc_id", budget=512, stratum="lang")


def gram_hashes_expr(toks: Column, gram: int = 4) -> Column:
    """md5 hex of every ``gram``-token gram of a token array."""
    n = F.size(toks)
    return F.when(
        n >= gram,
        F.transform(
            F.sequence(F.lit(1), n - (gram - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, F.lit(gram)))),
        ),
    ).otherwise(F.array().cast("array<string>"))


def window_min_fps_expr(h: Column, window: int = 5) -> Column:
    """Winnowing selection over a gram-hash array: min of each sliding
    ``window``, distinct.

    CRITICAL: pass an *attribute* (a materialized column), not an
    inline expression — ``slice(h, i, w)`` in the lambda re-evaluates
    its target per window position, so an inline gram expression makes
    the whole thing O(n_grams^2) md5 calls (measured 15 s vs 0.5 s at
    sf0.1). doc_winnow_fingerprints puts an exchange between the two
    stages for exactly this reason.
    """
    nh = F.size(h)
    return F.when(
        nh >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), nh - (window - 1)),
                lambda i: F.array_min(F.slice(h, i, F.lit(window))),
            )
        ),
    ).otherwise(F.array_distinct(h))


def winnow_fingerprints_expr(
    toks: Column, gram: int = 4, window: int = 5
) -> Column:
    """Winnowing fingerprint selection (Schleimer et al., MOSS) as a
    pure column expression over a token array: hash every ``gram``-token
    gram, slide a ``window``-hash window, keep each window's minimum,
    distinct the selections.

    Guarantee: any shared token run of length >= gram + window - 1
    between two documents yields at least one shared fingerprint — the
    local-similarity primitive exact/MinHash dedup lacks (both are
    whole-document). Hashes are md5 hex strings compared
    lexicographically — uniform order, portable to a DuckDB oracle
    byte-for-byte (at scale you'd xxhash64 to shrink the shuffle; same
    algorithm).

    Single-expression composition — correct anywhere (the form the
    property tests pin), but quadratic in grams-per-doc when evaluated
    inline (see window_min_fps_expr); use the two-stage form in
    doc_winnow_fingerprints for real corpora.
    """
    return window_min_fps_expr(gram_hashes_expr(toks, gram), window)


def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint summary (4-gram, window 5 —
    detects any shared run of >= 8 tokens); selection logic in
    gram_hashes_expr / window_min_fps_expr.

    Two stages with an exchange between them: stage 1 computes the
    gram-md5 array once per row; the repartition barrier materializes
    it as an attribute, so stage 2's sliding-window mins do O(1)
    lookups instead of re-evaluating the gram expression per window
    position (inline: O(n²) md5 calls — 15 s vs 0.5 s at sf0.1). The
    exchange doubles as the core-spread for a single-split scan; at
    real scale it ships ~n_grams × 32 B per row — switch the hash to
    xxhash64 BIGINTs to cut that 4× (same selection order semantics,
    different fingerprint values than the md5 oracle).
    """
    docs = _docs_parallel(spark, sf_dir)
    toks = docs.select("doc_id", _tokens().alias("toks"))
    h = toks.select("doc_id", gram_hashes_expr(F.col("toks")).alias("h"))
    h = h.repartition(spark.sparkContext.defaultParallelism)
    out = h.select(
        "doc_id", window_min_fps_expr(F.col("h")).alias("fps")
    )
    return out.select(
        "doc_id",
        F.size("fps").alias("n_fps"),
        F.md5(F.concat_ws("|", F.array_sort("fps"))).alias("fp_set_hash"),
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run dedup: docs with id >= 250 (the 'new crawl') against
    the hash index of docs with id < 250 (the accumulated corpus), then
    within-batch first-occurrence dedup
    (operators/dedup.incremental_dedup)."""
    from hrfco_data_pipeline_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text_hash", F.md5(F.lower(F.trim("text")))
    )
    seen = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    return incremental_dedup(new, seen).select("doc_id", "text_hash", "lang", "source")


def dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the shingle-Jaccard
    pair graph (iterative min-label propagation; rows-only check)."""
    from hrfco_data_pipeline_spark.operators.dedup import connected_components

    pairs = docs_ngram_jaccard_pairs(spark, sf_dir)
    return connected_components(pairs, "doc_a", "doc_b", distinct_pairs=True)


def docs_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (term -> posting list), the retrieval-side
    primitive of a corpus pipeline: explode distinct terms per doc, one
    partial-aggregated groupBy on term, emit df + posting-list summary
    (min/max doc + md5 of the sorted postings — scalar so the driver
    hash stays portable; at scale the full posting array would be
    written bucketed-by-term instead of summarized). Top-100 by df is
    TakeOrderedAndProject, never a global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("term")
    )
    postings = F.transform(
        F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
    )
    return (
        terms.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.md5(F.concat_ws(",", postings)).alias("posting_hash"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(100)
    )


def docs_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinctive terms by a rational TF-IDF
    (tf/n_tokens scaled by N/df — no transcendental log, so the double
    arithmetic is IEEE-identical across engines; same ranking order as
    log-idf for fixed tf). Shapes: one explode + (doc,term) groupBy,
    a term-df groupBy joined back on term (shuffle on term — fine, df
    table is corpus-vocabulary-sized), N via broadcast scalar join, and
    a per-doc window for the top-3. No driver actions, no UDFs.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    terms = toks.select(
        "doc_id", F.size("toks").alias("n_tokens"), F.explode("toks").alias("term")
    )
    tf = terms.groupBy("doc_id", "n_tokens", "term").agg(
        F.count("*").alias("tf_cnt")
    )
    # tf is already distinct on (doc, term), so df falls out of it —
    # no second explode / distinct pass over the corpus
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_total"))
    scored = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf_cnt").cast("double") / F.col("n_tokens").cast("double"))
            * (F.col("n_total").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tfidf")
    )


def docs_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-output sharding: multiplicative Knuth hash
    of doc_id -> 16 shards, verified balanced via per-shard counts and
    byte mass. The hash (not doc_id % N) decorrelates shard from crawl
    order, so every shard is an unbiased corpus sample — what a
    downstream trainer wants from a shard file. One groupBy on a
    16-value key; at 100 TB this is the partitionBy("shard") write key.
    """
    from hrfco_data_pipeline_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    shard = hash_bucket("doc_id", 16)
    return (
        docs.select(shard.alias("shard"), "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("shard")
    )


def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence chunking: split each document into overlapping
    token windows (size 128, stride 64) — the context-window prep step
    between cleaning and packing in an LLM data pipeline. One explode
    over per-row chunk starts; slices reference the materialized token
    attribute (O(window) each — see window_min_fps_expr's warning).
    Emits chunk coordinates + content hash; the text itself would be
    carried alongside in production (hash keeps the checked schema
    scalar and the oracle exact).
    """
    size, stride = 128, 64
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks")).filter(
        F.size("toks") >= 1
    )
    starts = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.size("toks"), F.lit(stride))
        ).alias("start"),
    )
    chunk = F.slice("toks", F.col("start"), F.lit(size))
    return starts.select(
        "doc_id",
        F.expr(f"div(start - 1, {stride})").alias("chunk_idx"),
        "start",
        F.size(chunk).alias("n_chunk_toks"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


def docs_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) by Knuth hash
    of doc_id — stable across runs/retries/AQE (no rand()), stratified
    reporting per language. The canonical last step before sharded
    output; at scale `split` joins `shard` as partitionBy keys."""
    from hrfco_data_pipeline_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    pct = hash_bucket("doc_id", 100)
    split = (
        F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "split")
    )


def docs_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline as a one-row funnel report: how many
    documents survive each stage (normalize → non-empty → quality gate
    → exact dedup) and the surviving token budget — the
    acceptance-dashboard number a corpus build publishes per run.

    Shapes: one scan computing all flags, a single groupBy on the
    16-byte content hash for the dedup level (identical text ⇒
    identical token count, so per-group min is exact), then two scalar
    aggregates joined — no window, no second scan of the corpus.
    """
    from hrfco_data_pipeline_spark.operators.textnorm import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    n = normalize_text("text")
    base = docs.select(
        F.col("doc_id"),
        n.alias("norm"),
    ).select(
        "doc_id",
        "norm",
        (F.length("norm") > 0).alias("nonempty"),
        F.split(F.col("norm"), r"\s+").alias("toks"),
        F.md5(F.lower("norm")).alias("h"),
    )
    q = quality_score_expr(F.col("toks")) >= 0.7
    flagged = base.select(
        "h",
        "nonempty",
        (F.col("nonempty") & q).alias("quality"),
        F.size("toks").alias("n_toks"),
    )
    totals = flagged.agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("nonempty").cast("int")).alias("n_nonempty"),
        F.sum(F.col("quality").cast("int")).alias("n_quality"),
    )
    uniq = (
        flagged.filter("quality")
        .groupBy("h")
        .agg(F.min("n_toks").alias("toks_g"))
        .agg(
            F.count("*").alias("n_unique"),
            F.sum("toks_g").alias("surviving_tokens"),
        )
    )
    return totals.crossJoin(uniq)


def docs_range_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-depth range sharding over document length: ntile(8) on the
    (n_chars, doc_id) total order, summarized per shard — boundary
    audit for the range-sharded writer (sinks/writers.
    write_range_sharded).

    The window ntile is a global sort — correct and oracle-checkable
    at audit scale, but the *write* path never does this: at 100 TB,
    ``repartitionByRange`` derives boundaries from a sample and ships
    rows straight to their shard (one exchange, per-shard local sort).
    This query is the small-scale twin that pins the equal-depth
    semantics those sampled boundaries approximate.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(F.asc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "n_chars", F.ntile(8).over(w).alias("shard"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# Round-3 curation additions: Gopher-rule quality, token entropy,
# C4-style segment dedup
# --------------------------------------------------------------------------

def docs_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/shape rules (beyond the banded
    quality_score_expr signals): mean word length, short-token
    fraction, single-most-frequent-word fraction, and the combined
    keep flag.

    Scale plan: the per-token mode needs real grouping — explode →
    count per (doc_id, token) → max per doc. Both aggregations key on
    doc_id (the second reuses the first's partitioning, no extra
    exchange), and the shuffle carries (doc_id, token, count) partials
    after map-side combine — never raw token instances.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    n = F.size("toks")
    mean_wlen = (
        F.aggregate(
            "toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / n
    )
    frac_short = F.size(F.filter("toks", lambda x: F.length(x) <= 2)).cast(
        "double"
    ) / n
    per_doc = toks.select(
        "doc_id",
        n.alias("n_toks"),
        _r4(mean_wlen).alias("mean_wlen"),
        _r4(frac_short).alias("frac_short"),
    )
    top = (
        toks.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"))
    )
    out = per_doc.join(top, "doc_id")
    top_frac = F.col("top_cnt").cast("double") / F.col("n_toks")
    keep = (
        (F.col("n_toks") >= 30)
        & F.col("mean_wlen").between(2.5, 10.0)
        & (F.col("frac_short") <= 0.3)
        & (top_frac <= 0.2)
    )
    return out.select(
        "doc_id",
        "n_toks",
        "mean_wlen",
        "frac_short",
        _r4(top_frac).alias("top_frac"),
        keep.alias("keep"),
    )


def docs_token_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram repetition/diversity per document via EXACT collision
    statistics — the cheap degenerate-text screen, migrated in r15
    from the ln-emitting ``docs_token_entropy`` (SCALE.md watch list:
    JVM ``Math.log`` is one ulp off correctly-rounded ln on some
    arguments, so a Shannon emission is a latent driver-hash split on
    regenerated data; the Rényi-2/collision family carries the same
    signal over exact integers — the multimodal patch-profile
    precedent, VERDICT r14 'Next round' #4).

    simpson = Σc²/n² — the probability two random tokens of the doc
    coincide (1/n_distinct = perfectly even usage, 1.0 = one token
    repeated; high = degenerate/boilerplate, the entropy-collapse
    face). eff_vocab = n²/Σc² is its inverse 'effective vocabulary
    size' (the Rényi-2 analogue of perplexity); top_share = max(c)/n
    the mode share. sum_c2 is the raw exact collision count.

    Exactness: sum_c2, n, n_distinct, c_max are exact longs
    (Σc² ≤ n² — doc-length bounded, orders of magnitude under 2^53);
    each emitted ratio is ONE IEEE division (or one divide of two
    exact casts) on identical operands in both engines — correctly
    rounded, no transcendental, no order-dependent fold anywhere.

    Scale shape: one (doc_id, token) count shuffle with map-side
    partials, then a per-doc aggregate — strictly cheaper than the
    entropy form it replaces (no sorted-list collect, plain SUM of
    c·c)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    counts = (
        toks.select("doc_id", F.size("toks").alias("n"), F.explode("toks").alias("tok"))
        .groupBy("doc_id", "n", "tok")
        .agg(F.count("*").alias("c"))
    )
    per_doc = counts.groupBy("doc_id", "n").agg(
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c").cast("long") * F.col("c")).alias("sum_c2"),
        F.max("c").alias("c_max"),
    )
    # two chained divisions instead of an n·n product: no integer
    # product ever crosses into the double domain (the 2^53 audit
    # class stays structurally empty), and both engines evaluate the
    # identical left-associative chain
    nd = F.col("n").cast("double")
    s2 = F.col("sum_c2").cast("double")
    return per_doc.select(
        "doc_id",
        F.col("n").alias("n_toks"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("sum_c2").cast("long").alias("sum_c2"),
        _r4(s2 / nd / nd).alias("simpson"),
        _r4(nd / s2 * nd).alias("eff_vocab"),
        _r4(F.col("c_max").cast("double") / nd).alias("top_share"),
    )


def docs_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style segment-level dedup stats: split each doc into
    consecutive 10-token segments, hash them (md5 — portable to the
    oracle), and count per doc how many segments also occur elsewhere
    in the corpus (df > 1, counting multiplicity across all docs).

    The real C4 rule drops duplicated *lines*; the synthetic corpus has
    no newlines, so fixed-stride segments are the unit. Scale shape:
    explode → md5 df groupBy (one segment-key shuffle, map-side
    partials) → join back on the hash (Catalyst broadcasts the df
    table while it fits, falls back to a shuffle hash join at scale),
    then a doc_id re-aggregate. No all-pairs anywhere; the df table is
    the same bounded-key shape MinHash banding uses.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    n = F.size("toks")
    segs = F.transform(
        F.sequence(F.lit(1), F.ceil(n / F.lit(10)).cast("int")),
        lambda i: F.md5(
            F.encode(
                F.concat_ws(" ", F.slice("toks", (i - F.lit(1)) * 10 + 1, F.lit(10))),
                "utf-8",
            )
        ),
    )
    ex = toks.select("doc_id", F.explode(segs).alias("h"))
    df_tbl = ex.groupBy("h").agg(F.count("*").alias("df"))
    per_doc = (
        ex.join(df_tbl, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum((F.col("df") > 1).cast("int")).alias("n_shared"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_segments",
        F.col("n_shared").cast("long").alias("n_shared"),
        _r4(F.col("n_shared").cast("double") / F.col("n_segments")).alias(
            "shared_frac"
        ),
    )


def docs_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring exposure report (the Lee et al. 2022
    "Deduplicating Training Data" EXACTSUBSTR family, at token-8-gram
    granularity): an 8-gram is duplicated when it occurs in >= 2
    distinct documents; a token is dup-covered when any duplicated
    8-gram window contains it. Per source: document/token totals, how
    many docs carry cross-doc duplicated spans, how many tokens sit
    inside them, and the dup-token fraction — the number that decides
    whether a source needs substring-level masking before training.

    Coverage is exact interval union, not a per-gram sum: duplicated
    starts per doc are sorted and each contributes
    min(8, start - prev_start) tokens (first contributes 8), which is
    the union length of fixed-width-8 intervals.

    Scale shape: tokenize -> explode one md5 per gram (the 128-bit
    hash key IS the dedup unit at 100 TB — no raw-text shuffle), one
    gram-key exchange for the distinct-doc frequency, join back on
    the same key (Catalyst reuses the partitioning; broadcast only if
    the dup set shrinks below threshold), then a doc-key window whose
    partitions are bounded by per-doc gram counts. No all-pairs
    anywhere; within-doc repetition alone does NOT mark a gram
    (cross-doc duplication is the decontamination signal — documented
    choice).
    """
    docs = _docs_parallel(spark, sf_dir)
    toks = docs.select("doc_id", "source", _tokens().alias("toks"))
    n = F.size("toks")
    grams = F.transform(
        F.sequence(F.lit(0), n - 8),
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(
                F.encode(F.concat_ws(" ", F.slice("toks", i + 1, 8)), "utf-8")
            ).alias("h"),
        ),
    )
    ex = (
        toks.filter(n >= 8)
        .select("doc_id", "source", F.explode(grams).alias("g"))
        .select("doc_id", "source", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )
    dup = (
        ex.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = ex.join(dup, "h")
    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = hits.withColumn("prev", F.lag("pos").over(w)).withColumn(
        "cover",
        F.when(F.col("prev").isNull(), F.lit(8)).otherwise(
            F.least(F.lit(8), F.col("pos") - F.col("prev"))
        ),
    )
    per_src_dup = (
        cov.groupBy("doc_id", "source")
        .agg(F.sum("cover").alias("doc_dup_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("dup_docs"),
            F.sum("doc_dup_tokens").alias("dup_tokens"),
        )
    )
    totals = toks.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum(n).alias("total_tokens")
    )
    return (
        totals.join(per_src_dup, "source", "left")
        .select(
            "source",
            "n_docs",
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.coalesce("dup_docs", F.lit(0)).cast("long").alias("dup_docs"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("dup_token_frac"),
        )
    )


def near_dedup_keep(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.7,
    materialize: bool = True,
) -> DataFrame:
    """End-to-end near-dedup — the one-call corpus workflow: MinHash
    signatures → banded LSH candidate pairs → estimated-Jaccard
    threshold → connected components → keep the min doc_id per cluster.

    Output: one row per document that belongs to a near-dup cluster,
    with its cluster label and survivor flag; singleton docs (no
    near-dup) are implicitly all kept and omitted, so row count =
    clustered docs only. Rows-only check (MinHash hashing is
    engine-specific); the invariants — exact duplicates always cluster
    together, exactly one survivor per cluster, survivor = min id —
    are pinned in tests/test_dedup_similarity.py.

    Scale shape: every stage is a bounded-key shuffle (signature bands,
    component labels); components run O(log diameter) iterations with
    lineage checkpointing. No all-pairs, no driver collects.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        connected_components,
        minhash_dedup,
    )

    docs = _docs_parallel(spark, sf_dir)
    pairs = minhash_dedup(docs, threshold=threshold, materialize=materialize)
    comp = connected_components(pairs, "id_a", "id_b", distinct_pairs=True)
    w = Window.partitionBy("component")
    return (
        comp.withColumn("keep_doc_id", F.min("id").over(w))
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            (F.col("id") == F.col("keep_doc_id")).alias("kept"),
        )
        # write-path workflow: no global sort (a terminal
        # Exchange+Sort is pure overhead at corpus scale) — keep rows
        # clustered within partitions for downstream scans; consumers
        # needing a total order sort their own bounded result.
        .sortWithinPartitions("cluster_id", "doc_id")
    )


def minhash_sig_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-verifiable MinHash kernel probe: the first two signature
    values per document, computed by the production min-permutation
    kernel over a portable md5-60bit base hash
    (operators/dedup.minhash_signatures_portable). The DuckDB twin
    recomputes both values exactly via HUGEINT mod-2^64 arithmetic with
    the same (a, b) constants — hard evidence for the kernel math that
    the xxhash64 production variant exercises rows-only.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        minhash_signatures_portable,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures_portable(docs, k=2)
    return sigs.select(
        F.col("id").alias("doc_id"),
        F.element_at("sig", 1).alias("m0"),
        F.element_at("sig", 2).alias("m1"),
    )


def simhash_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-verifiable SimHash kernel probe: the production 64-bit
    bit-majority kernel (operators/dedup.simhash_64_from_token_hashes)
    over portable md5-60bit token hashes. Bits 60-63 of the input are
    always zero, so their votes are all -1 and the output stays below
    2^60 — the identical kernel, exactly recomputable in the DuckDB
    twin via integer shift/modulo bit extraction with multiplicity-
    preserving token votes.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        simhash_64_from_token_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = F.transform(
        _tokens(),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    staged = docs.select("doc_id", base.alias("h"))
    return staged.select(
        "doc_id", simhash_64_from_token_hashes(F.col("h")).alias("simhash60")
    )


def lsh_sig_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-verifiable sign-LSH probe: the production 16-plane
    hyperplane signature (operators/similarity.hyperplane_signature)
    over every embedding. Deterministic end to end — the plane
    constants are a seeded pure-python PRNG and the dot product is a
    fold-left from 0.0 — so the DuckDB twin recomputes each bitmask
    bit-for-bit with the same fold order and literal plane values
    (embedded via repr, which round-trips doubles exactly).
    """
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        hyperplane_planes,
        hyperplane_signature,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    planes = hyperplane_planes(dim=64, n_planes=16, seed=42)
    return vecs.select(
        "vec_id", hyperplane_signature("v", planes).alias("sig")
    )


def minhash_band_pairs_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-verifiable probe of the FULL MinHash-LSH banding
    pipeline: portable md5-60bit signatures (k=8) pushed through the
    production lsh_candidate_pairs path (operators/dedup.py) —
    band/bucket key build, bucket self-join, pair dedup, and the
    est-Jaccard estimator (exact multiples of 1/8, no float order
    sensitivity). The production minhash_near_dups differs ONLY in the
    base hash (xxhash64) and k; every downstream line is the same
    code, so a green row here certifies the banding math the rows-only
    query exercises.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_portable,
    )

    docs = _docs_parallel(spark, sf_dir)
    sigs = minhash_signatures_portable(docs, k=8)
    pairs = lsh_candidate_pairs(sigs, bands=4, k=8)
    return pairs.select("id_a", "id_b", "est_jaccard")


def near_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-verifiable probe of the FULL near_dedup_keep workflow:
    portable md5-60bit MinHash signatures (k=8) through the production
    banding path (lsh_candidate_pairs), the est-Jaccard >= 0.7 cut,
    iterative connected components, and min-id survivor selection —
    every line downstream of the base hash is the very code
    near_dedup_keep runs (which differs only in xxhash64 and k=64).
    The DuckDB twin recomputes the signatures in HUGEINT arithmetic
    and the components with a recursive min-reachable-label CTE, so
    the whole workflow earns an exact value-multiset row.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures_portable,
    )

    docs = _docs_parallel(spark, sf_dir)
    sigs = minhash_signatures_portable(docs, k=8)
    pairs = lsh_candidate_pairs(sigs, bands=4, k=8).filter(
        F.col("est_jaccard") >= 0.7
    )
    comp = connected_components(pairs, "id_a", "id_b", distinct_pairs=True)
    w = Window.partitionBy("component")
    return (
        comp.withColumn("keep_doc_id", F.min("id").over(w))
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            (F.col("id") == F.col("keep_doc_id")).alias("kept"),
        )
        .sortWithinPartitions("cluster_id", "doc_id")
    )


def simhash_pairs_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-verifiable probe of the FULL SimHash pairing pipeline:
    the production 16-bit pigeonhole chunking, bucket self-join, pair
    dedup, and Hamming filter (operators/dedup.simhash_pairs_from)
    over the portable md5-60bit token hashes of simhash_probe. The
    production simhash_clusters differs ONLY in the base hash
    (xxhash64); a green row here certifies the pairing math end to
    end — pure integer arithmetic, recomputed exactly in DuckDB.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        simhash_64_from_token_hashes,
        simhash_pairs_from,
    )

    docs = _docs_parallel(spark, sf_dir)
    base = F.transform(
        _tokens(),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    hashed = docs.select(
        F.col("doc_id").alias("id"),
        simhash_64_from_token_hashes(base).alias("sh"),
    )
    return simhash_pairs_from(hashed, max_hamming=3)


def docs_simjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 shingle-set similarity self-join via prefix
    filtering (operators/dedup.prefix_jaccard_pairs). The DuckDB twin
    computes the naive all-pairs answer, so a green row certifies the
    prefix-filter candidate scheme is *lossless* — every pair the
    optimized plan skips is provably below threshold.

    Reference parity: the reference has no similarity operators
    (SURVEY §2.9 gap list); this is the beyond-reference exact-
    threshold companion to the MinHash-LSH approximate path.
    """
    from hrfco_data_pipeline_spark.operators.dedup import prefix_jaccard_pairs

    docs = _docs_parallel(spark, sf_dir)
    return prefix_jaccard_pairs(docs, threshold=0.5)


def docs_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination: the 100 TB version of
    docs_decontaminate. Instead of broadcasting the eval set's distinct
    shingle hashes (which grows with the benchmark corpus), the eval
    shingles are folded into a fixed-size Bloom filter — m = 2^16 bits,
    k = 3 probes via Kirsch-Mitzenmaucher double hashing
    pos_j = (h1 + j*h2) mod m over two 60-bit md5 slice hashes — and
    the training side probes it map-side. The filter is represented as
    the distinct set of SET bit positions (≤ m rows, ≤ 512 KiB), which
    broadcasts at any corpus scale.

    The md5-slice double hash is the oracle-portable certification
    form (the same tax the MinHash probes pay — conv() on every
    shingle); the production swap is xxhash64(s), xxhash64(s, seed)
    one line up, identical plan shape.

    Bloom guarantees no false negatives: every exact-overlap shingle is
    a Bloom hit. The query emits, per flagged training doc, the count
    of Bloom-hit shingles AND the exact-overlap count, plus the
    false-positive marker (bloom-flagged, zero exact hits) — and every
    quantity is pure md5/integer arithmetic, so the DuckDB twin
    recomputes the whole filter bit-for-bit. At 100 TB the exact face
    would run only over the Bloom-flagged docs (here it is computed for
    all flagged docs, which is exactly that shape).
    """
    m_bits = 1 << 16
    k = 3
    docs = _docs_parallel(spark, sf_dir)
    from hrfco_data_pipeline_spark.operators.dedup import shingle_array

    sh = docs.select(
        "doc_id", F.explode(shingle_array(F.col("text"), 3)).alias("s")
    )
    h1 = F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("s"), 17, 15), 16, 10).cast("long")
    hashed = sh.select("doc_id", "s", h1.alias("h1"), h2.alias("h2"))
    is_eval = F.col("doc_id") % 97 == 0

    positions = (
        hashed.filter(is_eval)
        .select(
            F.explode(
                F.array(
                    *[
                        ((F.col("h1") + F.lit(j) * F.col("h2")) % m_bits).alias(f"p{j}")
                        for j in range(k)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    eval_exact = hashed.filter(is_eval).select("s").distinct()

    # Probe the filter with k chained BROADCAST LEFT-SEMI joins — one
    # per probe position, each a map-side hash lookup against the
    # ≤ m_bits-row set-bit table (the Bloom membership test "bit p_j
    # set for every j" is exactly the conjunction of the k semi
    # joins). The previous form posexploded the train side 3x and
    # re-grouped by (doc_id, shingle) to require all k probes — two
    # shuffles of 3x the corpus shingle count, measured 4.2 s at
    # sf0.1; the semi-join chain runs zero shuffles (~1.5 s), and at
    # 100 TB the broadcast stays bounded by the constant m_bits no
    # matter the eval-corpus size.
    train = hashed.filter(~is_eval)
    probe = train.select(
        "doc_id",
        "s",
        *[
            ((F.col("h1") + F.lit(j) * F.col("h2")) % m_bits).alias(f"p{j}")
            for j in range(k)
        ],
    )
    for j in range(k):
        probe = probe.join(
            F.broadcast(positions.withColumnRenamed("pos", f"p{j}")),
            f"p{j}",
            "left_semi",
        )
    bloom_hit_shingles = probe.select("doc_id", "s")
    exact_hit_shingles = train.join(F.broadcast(eval_exact), "s", "left_semi").select(
        "doc_id", "s"
    )
    bloom_counts = bloom_hit_shingles.groupBy("doc_id").agg(
        F.count("*").alias("bloom_hits")
    )
    exact_counts = exact_hit_shingles.groupBy("doc_id").agg(
        F.count("*").alias("exact_hits")
    )
    return (
        bloom_counts.join(exact_counts, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_hits",
            F.coalesce("exact_hits", F.lit(0)).alias("exact_hits"),
            (F.coalesce("exact_hits", F.lit(0)) == 0).alias("is_false_positive"),
        )
    )


def cms_cells(text_col: str = "text", w_cells: int = 1024, d_rows: int = 3):
    """(token, j, pos) occurrences for the CMS counter build — shared by
    the batch query and the streaming twin (same expressions, so the
    incremental streaming aggregation provably equals the batch
    counters; pinned in tests/test_streaming_curation.py)."""
    tok = F.explode(_tokens(text_col)).alias("t")
    h1 = F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("t"), 17, 15), 16, 10).cast("long")
    cells = F.array(*[(h1 + F.lit(j) * h2) % w_cells for j in range(d_rows)])
    return tok, cells


def cms_counters(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """CMS counter matrix as a (j, pos, c) DataFrame — works unchanged
    over a batch DataFrame or a streaming one (groupBy count is an
    incremental-merge aggregation; the fixed 3x1024 key space keeps
    streaming state constant-size).

    Batch cell counts are built from DISTINCT-token counts, not raw
    occurrences: count per token first (map-side partial aggregation
    on the token string), then hash only the distinct tokens and sum
    their counts into cells. Σ_t∈cell count(t) == count of occurrences
    per cell — identical longs — but the md5/conv pair runs once per
    distinct term instead of once per token occurrence (r16
    optimization, guide §1.2 per-task work: the corpus has ~20x more
    occurrences than distinct terms, and the hash is the kernel's
    dominant cost).

    A STREAMING frame keeps the pre-r16 one-level form (hash every
    occurrence, one groupBy over the fixed key space): the two-level
    form chains two stateful aggregations, which Spark's
    global-watermark correctness check rejects in a streaming query.
    Same counters either way — the two forms differ only in where the
    per-term partial sums happen."""
    tok, cells = cms_cells(text_col)
    if docs.isStreaming:
        occ = docs.select(tok).select(F.posexplode(cells).alias("j", "pos"))
        return occ.groupBy("j", "pos").agg(F.count("*").alias("c"))
    term_counts = (
        docs.select(tok).groupBy("t").agg(F.count("*").alias("n"))
    )
    occ = term_counts.select(
        "n", F.posexplode(cells).alias("j", "pos")
    )
    return occ.groupBy("j", "pos").agg(F.sum("n").alias("c"))


def docs_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch term frequencies, fully oracle-verified: d=3
    counter rows of w=1024 cells, cell index per row via
    Kirsch-Mitzenmaucher double hashing (h1 + j*h2 mod w) over two
    60-bit md5 slice hashes — the same portable-hash discipline as
    minhash_sig_probe, so DuckDB rebuilds the identical counter matrix.

    The sketch is the scale object: counters partial-aggregate
    map-side onto a FIXED 3×1024 key space no matter how many distinct
    terms the corpus has, and two sketches merge by cell-wise add —
    the streaming/rollup shape exact groupBy counts cannot give at
    unbounded key cardinality. The query probes the exact top-20 terms
    (deterministic count-desc/term-asc order) and emits exact count,
    CMS estimate, and the inflation (estimate - exact, provably >= 0:
    CMS never underestimates) so the driver certifies the whole
    counter arithmetic bit-for-bit.
    """
    top_k = 20
    docs = _docs_parallel(spark, sf_dir)
    tok_expr, cells = cms_cells()
    # ONE tokenize+count pass feeds both the exact top-k probe and the
    # counter matrix (cells from distinct-term counts — see
    # cms_counters; r16 optimization: previously the corpus was
    # tokenized twice, once per arm)
    term_counts = (
        docs.select(tok_expr).groupBy("t").agg(F.count("*").alias("n"))
    )
    counters = (
        term_counts.select("n", F.posexplode(cells).alias("j", "pos"))
        .groupBy("j", "pos")
        .agg(F.sum("n").alias("c"))
    )

    top = (
        term_counts.select("t", F.col("n").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("t"))
        .limit(top_k)
    )
    probe = top.select(
        "t", "exact_cnt", F.posexplode(cells).alias("j", "pos")
    )
    return (
        probe.join(counters, ["j", "pos"])
        .groupBy("t", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
        .select(
            F.col("t").alias("term"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("inflation"),
        )
    )


def docs_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dup pairs by edit distance <= 8 over 64-char doc prefixes,
    via the q-gram count filter: ed(a,b) <= d implies the positional
    bigram multisets share >= max(|a|,|b|) - 1 - 2d grams, so candidate
    generation is a bigram equi-join + per-pair min-count sum, and only
    survivors pay the O(n*m) levenshtein verify (JVM built-in both in
    Spark and DuckDB — the oracle is the naive all-pairs answer, so a
    green row certifies the filter chain is lossless).

    Pairs where the count bound degenerates (max length <= 2d+1: no
    prunable gram mass) are routed through an explicit short-bucket
    cross pair — bounded, and empty on any corpus whose docs exceed
    17 chars. A length filter (|la - lb| <= d) prunes before counting.

    Scale: the gram join shuffles (gram, doc, cnt) tuples; selectivity
    comes from 2-gram diversity. The production upgrade at 100 TB is
    Ed-Join's location-based prefix (only the q*d+1 rarest grams join),
    same discipline as docs_simjoin_prefix — kept simple here because
    the verify stage already bounds the quadratic term to candidates.
    """
    d = 8
    docs = _docs_parallel(spark, sf_dir)
    p = docs.select(
        "doc_id", F.substring(F.trim(F.col("text")), 1, 64).alias("s")
    ).withColumn("ln", F.length("s"))

    bigrams = F.transform(
        F.sequence(F.lit(1), F.col("ln") - 1),
        lambda i: F.col("s").substr(i, F.lit(2)),
    )
    grams = (
        p.filter(F.col("ln") >= 2)
        .select("doc_id", "ln", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "ln", "g")
        .agg(F.count("*").alias("c"))
    )
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= d),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ln").alias("la"),
            F.col("b.ln").alias("lb"),
        )
        .agg(F.sum(F.least("a.c", "b.c")).alias("common"))
        .filter(
            F.col("common") >= F.greatest("la", "lb") - 1 - 2 * d
        )
        .select("doc_a", "doc_b")
    )
    shorts = p.filter(F.col("ln") <= 2 * d + 1)
    sa, sb = shorts.alias("sa"), shorts.alias("sb")
    short_cand = sa.join(
        sb,
        (F.col("sa.doc_id") < F.col("sb.doc_id"))
        & (F.abs(F.col("sa.ln") - F.col("sb.ln")) <= d),
    ).select(
        F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b")
    )
    all_cand = cand.unionByName(short_cand).distinct()

    pa = p.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"))
    pb = p.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    return (
        all_cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= d)
        .select("doc_a", "doc_b", "dist")
    )


def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-5 (operators/similarity.py):
    8 sub-spaces x 16 sub-centroids over the 64-dim embeddings —
    corpus scanned as 8-byte codes, queries score via table lookups.
    Oracle-backed end to end: codebook training is the same
    integer-exact DECIMAL-sum arithmetic as ivf_centroids (per-sub-
    space md5 pre-assignment), encoding is a fold-left squared-L2
    argmin, and the ADC sum is a fixed-order fold — all bit-
    reproducible in DuckDB; only the displayed distance is rounded.
    """
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        pq_adc_topk as _pq_topk,
        pq_subcentroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    cents = pq_subcentroids(vecs, m=8, ksub=16, dim=64)
    queries = vecs.filter(F.col("vec_id") % 50 == 0)
    topk = _pq_topk(vecs, queries, cents, k=5)
    return topk.select(
        F.col("qid").alias("query_id"),
        F.col("cid").alias("neighbor_id"),
        _r4(F.col("approx_dist")).alias("approx_dist"),
        "rank",
    )


def docs_line_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicate-segment REMOVAL with document reconstruction
    (docs_segment_dedup reports the stats; this applies the edit): each
    10-token segment is kept only in its globally-first occurrence —
    lowest owning doc_id, then lowest position within that doc — and
    every other copy is dropped; surviving segments reassemble in
    position order. Emits per doc the segment counts and an md5 of the
    rebuilt text, so the oracle certifies the reconstruction
    byte-for-byte without shipping full texts through the compare.

    Scale shape: segment-hash groupBy (min doc / min pos — map-side
    partials), join back on the hash, and a per-doc ordered
    re-aggregate; the sort feeding reassembly is within-doc only
    (array_sort over bounded per-doc segment lists), never global.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    n = F.size("toks")
    segs = F.transform(
        F.sequence(F.lit(1), F.ceil(n / F.lit(10)).cast("int")),
        lambda i: F.concat_ws(
            " ", F.slice("toks", (i - F.lit(1)) * 10 + 1, F.lit(10))
        ),
    )
    ex = toks.select(
        "doc_id", F.posexplode(segs).alias("i", "seg")
    ).withColumn("h", F.md5(F.encode("seg", "utf-8")))
    owner = ex.groupBy("h").agg(F.min("doc_id").alias("owner"))
    keep_pos = (
        ex.join(owner, "h")
        .filter(F.col("doc_id") == F.col("owner"))
        .groupBy("h")
        .agg(F.min("i").alias("keep_i"), F.first("owner").alias("owner"))
    )
    marked = ex.join(keep_pos, "h").withColumn(
        "kept", (F.col("doc_id") == F.col("owner")) & (F.col("i") == F.col("keep_i"))
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.array_sort(
            F.collect_list(F.when(F.col("kept"), F.struct("i", "seg")))
        ).alias("kept_segs"),
    )
    rebuilt = F.concat_ws(
        " ", F.transform("kept_segs", lambda s: s["seg"])
    )
    return per_doc.select(
        "doc_id",
        "n_segments",
        "n_kept",
        F.md5(F.encode(rebuilt, "utf-8")).alias("rebuilt_hash"),
    )


def ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-5: coarse cell routing (ivf_centroids, nprobe=1)
    composed with compressed-domain PQ ADC scoring — the structure
    behind billion-scale vector indexes, as a pure composition of the
    two oracle-certified operators. The DuckDB twin recomputes both
    codebooks and the fused scoring bit-for-bit."""
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        ivf_centroids,
        ivfpq_topk,
        pq_subcentroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    coarse = ivf_centroids(vecs, n_centroids=16, dim=64)
    pq = pq_subcentroids(vecs, m=8, ksub=16, dim=64)
    queries = vecs.filter(F.col("vec_id") % 50 == 0)
    topk = ivfpq_topk(vecs, queries, coarse, pq, k=5)
    return topk.select(
        F.col("qid").alias("query_id"),
        F.col("cid").alias("neighbor_id"),
        _r4(F.col("approx_dist")).alias("approx_dist"),
        "rank",
    )


def docs_editdist_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ed-Join-style positional-prefix edit-distance join — the 100 TB
    upgrade of docs_editdist_pairs. Candidate generation explodes only
    each string's 2d+1 = 17 rarest gram occurrences instead of every
    bigram: d edits destroy at most q*d = 2d q-grams, so any pair with
    ed <= d must share an element among the first 2d+1 under a global
    (df, gram, occurrence) ordering — the same smallest-common-element
    argument as docs_simjoin_prefix, over multiset elements
    (gram, k-th occurrence). Pairs too short for the bound
    (len <= 2d+1) route through the bounded short-bucket cross pair.
    Survivors verify with exact levenshtein. The DuckDB oracle is the
    same naive all-pairs answer docs_editdist_pairs checks against, so
    a green row proves the sharper pruning is equally lossless.
    """
    d = 8
    from pyspark.sql import Window

    docs = _docs_parallel(spark, sf_dir)
    p = docs.select(
        "doc_id", F.substring(F.trim(F.col("text")), 1, 64).alias("s")
    ).withColumn("ln", F.length("s"))

    bigrams = F.transform(
        F.sequence(F.lit(1), F.col("ln") - 1),
        lambda i: F.col("s").substr(i, F.lit(2)),
    )
    occ = (
        p.filter(F.col("ln") >= 2)
        .select("doc_id", "ln", F.posexplode(bigrams).alias("pos", "g"))
        .withColumn(
            "k",
            F.row_number().over(
                Window.partitionBy("doc_id", "g").orderBy("pos")
            ),
        )
    )
    df_tbl = occ.groupBy("g").agg(F.count("*").alias("df"))
    ranked = occ.join(df_tbl, "g").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "g", "k")
        ),
    )
    prefix = ranked.filter(F.col("rk") <= 2 * d + 1).select(
        "doc_id", "ln", F.xxhash64("g").alias("gh"), "k"
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gh") == F.col("b.gh"))
            & (F.col("a.k") == F.col("b.k"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= d),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    shorts = p.filter(F.col("ln") <= 2 * d + 1)
    sa, sb = shorts.alias("sa"), shorts.alias("sb")
    short_cand = sa.join(
        sb,
        (F.col("sa.doc_id") < F.col("sb.doc_id"))
        & (F.abs(F.col("sa.ln") - F.col("sb.ln")) <= d),
    ).select(
        F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b")
    )
    all_cand = cand.unionByName(short_cand).distinct()

    pa = p.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"))
    pb = p.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    return (
        all_cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= d)
        .select("doc_a", "doc_b", "dist")
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over multimodal blobs (every 4th 64-byte frame
    via Arrow-batched mapInPandas — operators/multimodal.sample_frames)
    summarized as (doc_id, frame_idx, n_bytes, md5). The deterministic
    chunk rule makes the Python fan-out stage oracle-checkable: the
    DuckDB twin reproduces each frame with substring arithmetic over
    the ASCII payload."""
    from hrfco_data_pipeline_spark.operators.multimodal import (
        sample_frames,
        to_multimodal,
    )

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(to_multimodal(docs), frame_bytes=64, every_k=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame").cast("long").alias("n_bytes"),
        F.md5("frame").alias("frame_hash"),
    )


def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embeddings table
    (operators/similarity.semantic_dedup): IVF cells as the clusters,
    within-cell cosine >= 0.35 pairs pruned keeping the member closest
    to its centroid. Oracle-backed end to end — the centroid doubles,
    argmax cell assignment, cosines, and the dominance keep rule are
    all fold-left/exact-integer arithmetic the DuckDB twin replays
    bit-identically; only the displayed cosine is rounded."""
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        ivf_centroids,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    cents = ivf_centroids(vecs, n_centroids=16, dim=64)
    out = semantic_dedup(vecs, cents, threshold=0.35)
    return out.select(
        "vec_id", "cell", _r4(F.col("cos_cent")).alias("cos_cent"), "kept"
    )


def kmeans_refine_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd refinement round over the IVF seed centroids, emitted
    as per-cell M-step statistics (count + first four refined centroid
    components). Demonstrates the iterative-clustering loop shape
    (broadcast centroids out, exact-integer sums back) with a DuckDB
    twin that unrolls the same E-step/M-step: the floor-quantized
    DECIMAL sums make every refined component an engine-exact double
    (|sum| < 2^53 holds through ~10^9 rows/cell at |v| <= 1)."""
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        assign_cells,
        ivf_centroids,
    )

    quant = 1_000_000
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    cents = ivf_centroids(vecs, n_centroids=16, dim=64)
    assigned = assign_cells(vecs, cents)
    seeded = assigned.select(
        "cell", F.transform("v", lambda x: F.floor(x * quant)).alias("q")
    )
    sums = seeded.groupBy("cell").agg(
        *[
            F.sum(F.element_at("q", i + 1).cast("decimal(38,0)")).alias(f"s{i}")
            for i in range(4)
        ],
        F.count("*").alias("n"),
    )
    denom = (F.col("n") * quant).cast("double")
    return sums.select(
        "cell",
        "n",
        *[
            F.round(F.col(f"s{i}").cast("double") / denom, 6).alias(f"c{i}")
            for i in range(4)
        ],
    )


def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023,
    arXiv:2302.03169): hashed unigram bucket counts estimate a target
    (lang='en') and raw token distribution; each document scores
    log w(d) = Σ_b c_b(d) · ln((tgt_b + 1) / (raw_b + 1)) — the
    log-likelihood ratio under the two hashed-ngram models, the
    resampling weight for target-seeking data selection.

    Scale shape: one 256-key bucket aggregate (map-side partials →
    broadcast back) and one (doc_id, bucket) aggregate; no all-pairs,
    no Python. Bit-determinism: the per-doc sum folds over the
    bucket-sorted term list, mirrored exactly by the DuckDB twin
    (same precedent as docs_token_entropy's sorted-count fold)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.explode(_tokens()).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5(F.lower("tok")), 1, 15), 16, 10).cast("long")
        % 256
    ).alias("b")
    tb = toks.select("doc_id", "lang", bucket)
    global_counts = tb.groupBy("b").agg(
        F.count("*").alias("raw_c"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tgt_c"),
    )
    doc_counts = tb.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    joined = doc_counts.join(F.broadcast(global_counts), "b")
    per_doc = joined.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("b", "c", "tgt_c", "raw_c"))
        ).alias("terms"),
        F.sum("c").alias("n_toks"),
    )
    term = lambda t: t["c"].cast("double") * F.log(
        (t["tgt_c"] + 1).cast("double") / ((t["raw_c"] + 1).cast("double"))
    )
    return per_doc.select(
        "doc_id",
        "n_toks",
        _r4(
            F.aggregate("terms", F.lit(0.0), lambda acc, t: acc + term(t))
        ).alias("log_weight"),
    )


def docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: every member of a
    near-dup cluster (connected components over the shingle-Jaccard
    pair graph) is routed by its CLUSTER ROOT's hash, not its own, so
    near-duplicates can never straddle the train/test boundary — the
    contamination mode a per-doc hash split silently allows.

    Composition of two certified operators (dup_components +
    operators/sampling.hash_bucket); singletons (docs in no pair) root
    at their own id. Scale shape: the components labeling is the
    O(log d)-round min-label loop; the split itself is one broadcast-
    sized join (component table is a projection of the pair graph,
    far smaller than the corpus)."""
    from hrfco_data_pipeline_spark.operators.sampling import hash_bucket

    comp = dup_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    joined = docs.join(comp, docs["doc_id"] == comp["id"], "left")
    root = F.coalesce(F.col("component"), F.col("doc_id"))
    pct = hash_bucket(root, 100)
    split = (
        F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test")
    )
    return joined.select(
        "doc_id", root.alias("cluster_root"), split.alias("split")
    )


def docs_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration (tokenizer induction over the corpus):
    count adjacent character pairs across all word occurrences and
    surface the top-50 merge candidates — the inner loop of training a
    BPE vocabulary at corpus scale.

    Plan: one word-frequency groupBy collapses the corpus to its
    vocabulary (the classic BPE trick — pair counts weight by word
    frequency, so the explode runs over DISTINCT words, not tokens),
    then a per-word character-pair fan-out and one pair-key aggregate.
    Top-50 is TakeOrderedAndProject on (count desc, pair asc) — a
    total order, so the cut is deterministic in any engine."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(_tokens()).alias("w0")).select(
        F.lower("w0").alias("w")
    )
    wc = words.groupBy("w").agg(F.count("*").alias("wn"))
    pair_arr = F.when(
        F.length("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.col("w").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = wc.select("wn", F.explode(pair_arr).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(50)
    )


def docs_quality_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source adaptive quality gate: keep documents at or above
    their source's median quality score — the relative-threshold
    variant of docs_quality_score's fixed cut, used when sources have
    incomparable score distributions.

    The median is the DISCRETE lower median (the score at row
    ceil(n/2) under (score, doc_id) order) — an actual sample value,
    so the >= comparison is engine-exact with no interpolation
    arithmetic. Exact medians need a per-source sort: fine while
    source cardinality ~20 and rows/source fit a partition; at 100 TB
    swap in percentile_approx (events_approx_stats pattern) or
    pre-aggregate per (source, rounded-score) first."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", quality_score_expr(_tokens()).alias("q")
    )
    w = Window.partitionBy("source").orderBy(F.asc("q"), F.asc("doc_id"))
    cw = Window.partitionBy("source")
    ranked = scored.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(cw)
    )
    med = ranked.filter(
        F.col("rn") == F.ceil(F.col("n") / F.lit(2.0))
    ).select("source", F.col("q").alias("med"))
    return (
        scored.join(med, "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("q") >= F.col("med")).cast("long")).alias("n_kept"),
            _r4(F.first("med")).alias("median_q"),
        )
    )


def dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup report artifact: the cluster-size histogram of the
    near-dup component graph (how much of the corpus is duplicated,
    and in how large clumps). Two bounded-key aggregates over the
    certified components labeling; singleton docs (no near-dup edge)
    are excluded, as in dup_components."""
    comp = dup_components(spark, sf_dir)
    return (
        comp.groupBy("component")
        .agg(F.count("*").alias("size"))
        .groupBy("size")
        .agg(F.count("*").alias("n_clusters"))
    )


def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-3 most-cosine-similar corpus vectors with a
    DIFFERENT label — the semantically-close-but-wrong examples that
    make metric-learning batches informative.

    Same broadcast-query/corpus-scan shape as ann_cosine_topk with the
    label inequality fused into the join predicate (no post-filter:
    the pruned pairs never materialize). At corpus×corpus scale, swap
    the broadcast for the IVF cell routing exactly as ivf_topk does."""
    from hrfco_data_pipeline_spark.operators.similarity import as_double_vec

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", "label", as_double_vec("embedding", "v")
    ).withColumn("nrm", F.sqrt(_dot("v", "v")))
    q = vecs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    joined = vecs.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("label") != F.col("qlabel")),
    )
    cos = _r4(_dot("qv", "v") / (F.col("qn") * F.col("nrm")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("negative_id")
    )
    return (
        joined.select(
            "query_id",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            cos.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


def _model_z(docs: DataFrame) -> DataFrame:
    """Per-document logistic-model score numerator z = Σ_b c_b·w_b / n
    over hashed unigram buckets — the exact, order-pinned fold shared
    by docs_model_quality_score (keep gate + sigmoid display) and
    docs_ccnet_quality_buckets (per-lang tercile ranking). The fold is
    pure +/*// doubles over integer counts in bucket order, so z is
    bit-identical across engines — safe to RANK on, unlike any
    log/exp-derived score. Output: doc_id, n_toks, z."""
    toks = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5(F.lower("tok")), 1, 15), 16, 10).cast("long")
        % 256
    ).alias("b")
    dc = toks.select("doc_id", bucket).groupBy("doc_id", "b").agg(
        F.count("*").alias("c")
    )
    w_b = (
        F.conv(
            F.substring(F.md5(F.col("b").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 2001
        - 1000
    ).cast("double") / 1000.0
    terms = dc.withColumn("w", w_b)
    per_doc = terms.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("b", "c", "w"))).alias("ts"),
        F.sum("c").alias("n_toks"),
    )
    z = F.aggregate(
        "ts",
        F.lit(0.0),
        lambda acc, t: acc + t["c"].cast("double") * t["w"],
    ) / F.col("n_toks")
    return per_doc.select("doc_id", "n_toks", z.alias("z"))


def docs_model_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the fastText-classifier shape
    used by CCNet/DataComp/FineWeb): a logistic model over hashed
    unigram features scores every document map-side; keep = score
    above 0.5.

    The weight vector is deterministic — w_b = (md5-60bit(b) mod 2001
    - 1000) / 1000 ∈ [-1, 1] for bucket b — standing in for trained
    weights with the exact serving-time plan: feature hashing, a
    sparse dot product folded over the doc's bucket-sorted counts
    (docs_token_entropy's order-pinned fold), and the sigmoid. At
    100 TB this is one (doc, bucket) aggregate + a zero-shuffle
    projection; swapping in real weights is a broadcast join against
    a 2^b-row weight table."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = _model_z(docs)
    z = F.col("z")
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    # keep is decided on z >= 0 (bit-exact fold arithmetic), not on the
    # sigmoid output — sigmoid(0) = 0.5 exactly at the same boundary,
    # but exp() is the one libm call engines may round differently
    return per_doc.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        _r4(score).alias("quality_prob"),
        (z >= 0).alias("keep"),
    )


def docs_lang_balance_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual sampling (the mBERT/XLM-R
    alpha-mixing formula): q_l ∝ p_l^alpha with alpha = 0.5 boosts
    low-resource languages; the sampling rate per language is
    q_l / p_l normalized so the largest language keeps rate 1.0 —
    i.e. downsample the head, never upsample past the corpus.

    One language-count aggregate (bounded keys), all arithmetic folds
    over the lang-sorted ~|languages| row list — broadcast scale by
    definition, same posture as domain_mix_rates."""
    docs = load_table(spark, sf_dir, "documents")
    lc = docs.groupBy("lang").agg(F.count("*").alias("n"))
    # alpha = 0.5, i.e. q_l ∝ sqrt(p_l): sqrt is the ONE power IEEE
    # defines as correctly rounded, so every derived double is
    # engine-exact (pow(x, 0.3) is libm-dependent). The double sums
    # over the ~|languages| table fold over the lang-sorted list
    # (total is an exact LONG sum), pinning summation order.
    packed = lc.agg(
        F.sort_array(F.collect_list(F.struct("lang", "n"))).alias("ls"),
        F.sum("n").alias("total"),
    )
    p_of = lambda t: t["n"].cast("double") / F.col("total").cast("double")
    qsum = F.aggregate(
        "ls", F.lit(0.0), lambda acc, t: acc + F.sqrt(p_of(t))
    )
    ratio_of = lambda t: (F.sqrt(p_of(t)) / F.col("qsum")) / p_of(t)
    ex = (
        packed.withColumn("qsum", qsum)
        .withColumn(
            "max_ratio",
            F.aggregate(
                "ls",
                F.lit(0.0),
                lambda acc, t: F.greatest(acc, ratio_of(t)),
            ),
        )
        .select("total", "qsum", "max_ratio", F.explode("ls").alias("t"))
    )
    p = F.col("t.n").cast("double") / F.col("total").cast("double")
    q = F.sqrt(p) / F.col("qsum")
    rate = (q / p) / F.col("max_ratio")
    return ex.select(
        F.col("t.lang").alias("lang"),
        F.col("t.n").alias("n"),
        _r4(p).alias("p_corpus"),
        _r4(q).alias("q_target"),
        _r4(rate).alias("sample_rate"),
        F.floor(rate * F.col("t.n")).cast("long").alias("n_sampled"),
    )


def docs_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order interleave (the corpus 'shuffle'
    step before sharded write-out): docs are ordered by a stable
    per-source hash permutation, then sources are round-robin
    interleaved — position p goes to the doc ranked p within its
    source, globally ordered by (rank, source). No rand() anywhere, so
    the order is identical across runs/retries/AQE, and near-equal
    source mixing holds at every prefix of the stream — the property
    curriculum schedules care about.

    One window shuffle on source (rank within source by Knuth hash);
    the emitted global position is arithmetic over (rank, source
    index) — no global sort; at scale the position feeds the
    range-sharded writer (docs_range_shards) as its ordering key."""
    from hrfco_data_pipeline_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    srcs = Window.partitionBy("source").orderBy(
        F.asc(hash_bucket("doc_id", 1 << 20)), F.asc("doc_id")
    )
    ranked = docs.select(
        "doc_id",
        "source",
        (F.row_number().over(srcs) - 1).alias("rank_in_source"),
    )
    # source index from the source name's digits (src0..src19) keeps
    # the interleave arithmetic engine-portable without a second window
    src_idx = F.regexp_replace("source", "[^0-9]", "").cast("long")
    n_sources = F.lit(20)
    return ranked.select(
        "doc_id",
        "source",
        "rank_in_source",
        (F.col("rank_in_source") * n_sources + src_idx).alias("position"),
    )


def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration for the MinHash near-dup path: every
    banded candidate pair's signature-based Jaccard estimate next to
    its EXACT shingle-set Jaccard, with the absolute error — the
    accuracy artifact that justifies the production estimator's
    threshold choice (est is unbiased with sd ~ sqrt(j(1-j)/k)).

    Portable end to end: the md5-60bit signatures (k=8, bands=4) are
    the oracle-certified kernel, est is a rational count/8, and the
    exact side intersects the string shingle sets — so the DuckDB twin
    reproduces every row bit-for-bit. Scale shape: candidates come
    from the banded join (never all-pairs); the exact verify joins
    shingle arrays back on the bounded candidate set only."""
    from hrfco_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_portable,
        shingle_array,
    )

    docs = _docs_parallel(spark, sf_dir)
    sigs = minhash_signatures_portable(docs, k=8)
    pairs = lsh_candidate_pairs(sigs, bands=4, k=8)
    sh = docs.select(
        "doc_id", shingle_array(F.col("text"), 5).alias("sh")
    ).withColumn("n", F.size("sh"))
    a = sh.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh").alias("sa"),
        F.col("n").alias("na"),
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh").alias("sb"),
        F.col("n").alias("nb"),
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    common = F.size(F.array_intersect("sa", "sb")).cast("long")
    exact = common.cast("double") / (
        F.col("na") + F.col("nb") - common
    )
    return j.select(
        "id_a",
        "id_b",
        _r4(F.col("est_jaccard")).alias("est_jaccard"),
        _r4(exact).alias("exact_jaccard"),
        _r4(F.abs(F.col("est_jaccard") - exact)).alias("abs_err"),
    )


def docs_bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second BPE iteration: apply the corpus's top merge (winner of
    docs_bpe_pair_counts) to every vocabulary word, then re-count
    adjacent SYMBOL pairs — the step that turns pair counting into an
    actual merge-table training loop. Symbols after one merge are the
    merged pair plus single chars; pair labels join with '+'.

    The merge applies via literal (non-regex) replace — left-to-right,
    non-overlapping in both engines, exactly BPE's greedy application
    — with chr(1) as the in-flight placeholder (never in the corpus:
    normalize strips control chars upstream, and raw testdata text is
    printable). Still vocabulary-collapsed: all per-word work runs on
    DISTINCT words; the iteration-to-iteration state is ONE broadcast
    row. Top-20 under the same total order as iteration one."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(_tokens()).alias("w0")).select(
        F.lower("w0").alias("w")
    )
    wc = words.groupBy("w").agg(F.count("*").alias("wn"))
    pair_arr = F.when(
        F.length("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.col("w").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top1 = (
        wc.select("wn", F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("wn").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
        .select(F.col("pair").alias("mp"))
    )
    SEP = "\x01"
    staged = (
        wc.crossJoin(F.broadcast(top1))
        .withColumn("w2", F.replace(F.col("w"), F.col("mp"), F.lit(SEP)))
        .withColumn(
            "syms",
            F.transform(
                F.sequence(F.lit(1), F.length("w2")),
                lambda i: F.col("w2").substr(i, F.lit(1)),
            ),
        )
        .withColumn(
            "ms",
            F.transform(
                "syms",
                lambda s: F.when(s == SEP, F.col("mp")).otherwise(s),
            ),
        )
    )
    pairs2 = F.when(
        F.size("ms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ms") - 1),
            lambda i: F.concat(
                F.element_at("ms", i.cast("int")),
                F.lit("+"),
                F.element_at("ms", (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        staged.select("wn", F.explode(pairs2).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("wn").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


def docs_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation artifact: the (true lang × predicted
    lang) confusion matrix with per-cell counts and the row-level
    recall — the quality report a corpus build publishes for its
    classifier stage. One scan (the heuristic is a projection) plus
    one bounded-key groupBy; the window for row totals runs over the
    ≤ |langs|² matrix."""
    pred = docs_lang_id(spark, sf_dir).select("lang", "pred_lang")
    cells = pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "pred_lang",
        "n",
        F.sum("n").over(w).alias("n_true"),
        _r4(F.col("n").cast("double") / F.sum("n").over(w)).alias("frac"),
    )


def docs_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained selection: rank documents by quality
    (composite score desc, doc_id asc) and keep the prefix whose
    cumulative token count fits a fixed budget — "fill 1B tokens with
    the best data", the final selection step before training. The
    budget boundary doc (the first to overflow) is kept iff it starts
    within budget, making the cut deterministic and total.

    The global cumulative sum runs through operators/ranking.
    ranked_cumsum — range-bucketed two-pass prefix sums, no
    single-partition sort of the corpus — so the plan survives the
    100 TB documents table."""
    from hrfco_data_pipeline_spark.operators.ranking import ranked_cumsum

    budget = 15_000
    docs = load_table(spark, sf_dir, "documents")
    # r17 (guide §2.4; the r15 live-subplan lesson): ranked_cumsum
    # consumes its input from FOUR branches (two sample passes, the
    # local windows, the bucket stats), each of which re-embedded the
    # tokenize + quality-score derivation — 6 parquet scans per
    # execution. ``scored`` is 3 narrow columns per doc (the
    # featurize-once shape), so it materializes once and every branch
    # reads the checkpoint. Static plan 6 → 0 embedded scans (one
    # eager build scan).
    from hrfco_data_pipeline_spark.operators.dedup import _materialized

    scored = _materialized(
        docs.select(
            "doc_id",
            quality_score_expr(_tokens()).alias("q"),
            F.size(_tokens()).cast("long").alias("n_toks"),
        )
    )
    ranked = ranked_cumsum(
        scored,
        -F.col("q"),
        [F.desc("q"), F.asc("doc_id")],
        sample_key=F.col("doc_id"),
        sums={"cum_toks": F.col("n_toks")},
        rank_name="_rn",
    ).drop("_rn")
    return ranked.filter(
        F.col("cum_toks") - F.col("n_toks") < budget
    ).select(
        "doc_id", _r4(F.col("q")).alias("q"), "n_toks", "cum_toks"
    )


def docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty score: the fraction of a document's distinct
    5-gram shingles whose FIRST corpus occurrence (min doc_id) is this
    document — near 1.0 for original text, near 0.0 for recombined
    boilerplate. The dedup-aware sampling signal that catches remixes
    exact and near dedup both miss.

    One shingle-key groupBy finds each shingle's owner; the join back
    rides the same hashed key. Short docs (< 5 tokens) score over
    their single whole-text shingle."""
    from hrfco_data_pipeline_spark.operators.dedup import shingle_array

    docs = _docs_parallel(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        F.explode(shingle_array(F.col("text"), 5)).alias("s"),
    ).select("doc_id", F.xxhash64("s").alias("h"))
    owner = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(owner, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles"), 4
            ).alias("novelty"),
        )
    )


def docs_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication report: document count, distinct-content
    count, and the duplicate fraction — the first diagnostic a corpus
    audit prints per provider. One (source, hash) aggregate, exact
    integer ratio."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim("text")))
    return (
        docs.select("source", h.alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("h").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.round(
                (F.col("n_docs") - F.col("n_unique")).cast("double")
                / F.col("n_docs"),
                4,
            ).alias("dup_rate"),
        )
    )


def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table quality control: rows whose L2 norm sits beyond
    the 3-MAD fence of the corpus norm distribution — the standard
    screen for broken encoders / zero vectors before any ANN or dedup
    runs. Norms are fold-exact doubles (similarity.dot), the median /
    MAD are engine-portable exact medians (events_value_outliers
    pattern), and the fence compare runs on raw doubles."""
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        dot,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v")).select(
        "vec_id", F.sqrt(dot("v", "v")).alias("nrm")
    )
    med = vecs.agg(F.median("nrm").alias("med"))
    dev = vecs.crossJoin(F.broadcast(med)).withColumn(
        "ad", F.abs(F.col("nrm") - F.col("med"))
    )
    mad = dev.agg(F.median("ad").alias("mad"))
    flagged = dev.crossJoin(F.broadcast(mad))
    return flagged.filter(F.col("ad") > 3 * F.col("mad")).select(
        "vec_id",
        F.round(F.col("nrm"), 4).alias("nrm"),
        F.round(F.col("med"), 4).alias("median_nrm"),
        F.round(F.col("mad"), 4).alias("mad"),
    )


def docs_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (the Heaps'-law diagnostic): cumulative
    distinct token count after each corpus decile under the canonical
    doc_id order. Each token charges only its FIRST-occurrence doc
    (min doc_id — one token-keyed aggregate), docs map to deciles via
    the range-bucketed two-pass rank (operators/ranking.ranked_cumsum
    + int_ntile — no single-partition sort of the corpus), and the
    cumulative sum runs over the 10-row curve — no re-scanning per
    checkpoint, the incremental-distinct shape of
    events_running_distinct_users applied to corpus statistics."""
    from hrfco_data_pipeline_spark.operators.ranking import (
        int_ntile,
        ranked_cumsum,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").alias("_n"))
    deciles = (
        ranked_cumsum(
            docs.select("doc_id"),
            F.col("doc_id").cast("double"),
            [F.asc("doc_id")],
            sample_key=F.col("doc_id"),
            rank_name="_rn",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            int_ntile(F.col("_rn"), F.col("_n"), 10).alias("decile"),
        )
    )
    first = (
        docs.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy(F.lower("tok").alias("w"))
        .agg(F.min("doc_id").alias("first_doc"))
    )
    new_per_decile = (
        first.join(
            deciles, first["first_doc"] == deciles["doc_id"]
        )
        .groupBy("decile")
        .agg(F.count("*").alias("new_tokens"))
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return new_per_decile.select(
        "decile",
        "new_tokens",
        F.sum("new_tokens").over(wc).alias("vocab_size"),
    )


def docs_shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard balance audit: per-shard doc and token totals plus the
    relative deviation from the mean token load — the number that
    tells you whether the hash sharding actually balanced the write
    (and the readers' task sizes). Exact integer loads; the mean is
    one exact total divided once in double."""
    from hrfco_data_pipeline_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    per_shard = docs.select(
        hash_bucket("doc_id", 16).alias("shard"),
        F.size(_tokens()).cast("long").alias("n_toks"),
    ).groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("tokens"),
    )
    w = Window.partitionBy()
    mean_tokens = F.sum("tokens").over(w).cast("double") / F.count(
        "*"
    ).over(w)
    return per_shard.select(
        "shard",
        "n_docs",
        "tokens",
        F.round(
            (F.col("tokens").cast("double") - mean_tokens) / mean_tokens, 4
        ).alias("rel_dev"),
    )


def minhash_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding recall certificate: how many of the EXACT Jaccard >= 0.5
    pairs the (k=8, bands=4) portable-MinHash candidate generation
    actually surfaces — the single number that justifies a bands/rows
    configuration. Truth comes from the lossless PPJoin prefix join;
    candidates from the certified banding path; both sides and the
    intersection are exact, so the DuckDB twin reproduces the report
    bit-for-bit."""
    from hrfco_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_portable,
        prefix_jaccard_pairs,
    )

    docs = _docs_parallel(spark, sf_dir)
    truth = prefix_jaccard_pairs(docs, threshold=0.5).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    sigs = minhash_signatures_portable(docs, k=8)
    cand = lsh_candidate_pairs(sigs, bands=4, k=8).select("id_a", "id_b")
    found = truth.join(cand, ["id_a", "id_b"], "left_semi")
    stats = truth.agg(F.count("*").alias("n_true")).crossJoin(
        cand.agg(F.count("*").alias("n_candidates"))
    ).crossJoin(found.agg(F.count("*").alias("n_found")))
    return stats.select(
        "n_true",
        "n_candidates",
        "n_found",
        F.round(
            F.when(
                F.col("n_true") > 0,
                F.col("n_found").cast("double") / F.col("n_true"),
            ),
            4,
        ).alias("recall"),
    )


def docs_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination severity report (the GPT-3/PaLM-appendix metric
    behind docs_decontaminate's binary flag): for each contaminated
    training doc, the FRACTION of its distinct 3-token shingles found
    in the eval set, banded into clean-up severities. Same scale shape
    as the flag pass — the corpus is tokenized once, the tiny eval
    shingle set broadcasts into a map-side probe (left join + flag
    instead of semi, so the miss rows still count toward the
    denominator), and one doc-keyed aggregate closes it."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    n = F.size("toks")
    shingles = F.when(
        n >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice("toks", i, F.lit(3)))
                ),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    ex = toks.select("doc_id", F.explode(shingles).alias("s"))
    eval_sh = (
        ex.filter(F.col("doc_id") % 97 == 0)
        .select("s")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = ex.filter(F.col("doc_id") % 97 != 0)
    per_doc = (
        train.join(F.broadcast(eval_sh), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"),
        )
        .filter(F.col("n_overlap") > 0)
    )
    frac = F.col("n_overlap").cast("double") / F.col("n_shingles").cast(
        "double"
    )
    severity = (
        F.when(frac >= 0.5, "high")
        .when(frac >= 0.1, "medium")
        .otherwise("low")
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.round(frac, 4).alias("overlap_frac"),
        severity.alias("severity"),
    )


def corpus_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus health scorecard a data-curation run
    publishes: volume (docs, tokens), duplication (exact-text dup
    share), contamination (eval 3-gram overlap count), quality (mean
    heuristic score + keep-rate at the 0.7 gate), and language
    spread. Every number reduces to exact integer counts (the mean
    quality rides deci-unit integers, so no float-sum order
    dependence); each sub-metric is a bounded aggregate and the
    five 1-row legs cross-join broadcast-style."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    vol = docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.countDistinct("lang").alias("n_langs"),
    )
    tok = toks.agg(F.sum(F.size("toks")).alias("n_tokens"))
    q = quality_score_expr(F.col("toks"))
    qual = toks.select(
        F.round(q * 10).cast("long").alias("q10")
    ).agg(
        F.sum("q10").alias("q10_sum"),
        F.sum((F.col("q10") >= 7).cast("long")).alias("n_keep"),
    )
    n = F.size("toks")
    shingles = F.when(
        n >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice("toks", i, F.lit(3)))
                ),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    ex = toks.select("doc_id", F.explode(shingles).alias("s"))
    eval_sh = (
        ex.filter(F.col("doc_id") % 97 == 0).select("s").distinct()
    )
    contam = (
        ex.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(eval_sh), "s", "left_semi")
        .agg(F.countDistinct("doc_id").alias("n_contaminated"))
    )
    card = (
        vol.crossJoin(tok).crossJoin(qual).crossJoin(contam)
    )
    nd = F.col("n_docs").cast("double")
    return card.select(
        "n_docs",
        "n_tokens",
        "n_langs",
        _r4(
            (F.col("n_docs") - F.col("n_distinct_texts")).cast("double")
            / nd
        ).alias("exact_dup_share"),
        "n_contaminated",
        _r4(F.col("q10_sum").cast("double") / F.lit(10.0) / nd).alias(
            "mean_quality"
        ),
        _r4(F.col("n_keep").cast("double") / nd).alias("keep_rate"),
    )


def docs_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection by shingle CONTAINMENT
    (|A∩B| / min(|A|,|B|) ≥ 0.8): catches quotation/subset
    duplicates that symmetric Jaccard misses — a short doc fully
    embedded in a long one scores low Jaccard but full containment.
    Same candidate machinery as docs_ngram_jaccard_pairs (int64
    shingle-hash equi-join with the hot-shingle df cap), different
    acceptance metric."""
    docs = _docs_parallel(spark, sf_dir)
    toks = docs.select("doc_id", _tokens().alias("toks"))
    n = F.size("toks")
    shingles = F.when(
        n >= 5,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 4),
                lambda i: F.concat_ws(" ", F.slice("toks", i, F.lit(5))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = toks.select("doc_id", shingles.alias("sh")).withColumn(
        "n_sh", F.size("sh")
    )
    ex = sh.select(
        "doc_id",
        "n_sh",
        F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("s"),
    )
    hot = (
        ex.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > 50)
        .select("s")
    )
    ex = ex.join(F.broadcast(hot), "s", "left_anti")
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    containment = F.col("common") / F.least("na", "nb")
    return pairs.filter(containment >= 0.8).select(
        "doc_a",
        "doc_b",
        "common",
        "na",
        "nb",
        _r4(containment).alias("containment"),
    )


# --------------------------------------------------------------------------
# Round-5 additions: LM-based quality, within-doc span dedup, selection
# --------------------------------------------------------------------------

def docs_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy per document — the CCNet/Gopher-style
    perplexity filter: train an add-α bigram model ON the corpus
    itself, score every document by mean negative log2-likelihood
    (bits per bigram; low = fluent/repetitive of the corpus register,
    high = junk or out-of-register). The standard model-based quality
    signal next to the heuristic screens (docs_quality_score,
    docs_gopher_quality).

    P(w2|w1) = (c(w1w2)+α) / (c(w1·)+α·V), α=0.5, V = corpus unigram
    vocabulary. Scale shape: bigram/prefix counts are two vocab-sized
    aggregates (map-side partials) joined on the prefix key; docs join
    their distinct-bigram counts to the prob table on the bigram key —
    every shuffle is vocab-bounded, never token-instance-bounded. The
    per-doc term sum folds over the SORTED bigram list
    (docs_token_entropy's order-pinned double fold), so the score is
    bit-deterministic at any parallelism and engine-portable."""
    # r17: a _docs_parallel spread was tried and REVERTED — interleaved
    # A/B made the kernel slower (the forced exchange costs more than
    # the serial scan saves here; the r3 docs_ngram lesson repeats).
    docs = load_table(spark, sf_dir, "documents")
    toks = F.transform(_tokens(), lambda t: F.lower(t))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    db = (
        docs.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("k"))
    )
    corpus_bg = db.groupBy("bg").agg(F.sum("k").alias("c_bg"))
    prefix = corpus_bg.withColumn(
        "w1", F.split(F.col("bg"), " ", 2)[0]
    )
    c_w1 = prefix.groupBy("w1").agg(F.sum("c_bg").alias("c_w1"))
    probs = prefix.join(c_w1, "w1").select("bg", "c_bg", "c_w1")
    vocab = (
        docs.select(F.explode(toks).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    terms = db.join(probs, "bg").crossJoin(F.broadcast(vocab))
    per_doc = terms.groupBy("doc_id", "v").agg(
        F.sort_array(
            F.collect_list(F.struct("bg", "k", "c_bg", "c_w1"))
        ).alias("ts"),
        F.sum("k").alias("m"),
    )
    alpha = F.lit(0.5)
    logp = lambda t: F.log2(  # noqa: E731
        (t["c_bg"].cast("double") + alpha)
        / (t["c_w1"].cast("double") + alpha * F.col("v").cast("double"))
    )
    folded = per_doc.withColumn(
        "nll",
        -F.aggregate(
            "ts", F.lit(0.0), lambda acc, t: acc + t["k"].cast("double") * logp(t)
        ),
    )
    return folded.select(
        "doc_id",
        F.col("m").alias("n_bigrams"),
        _r4(F.col("nll") / F.col("m").cast("double")).alias("xent_bits"),
    )


def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional weighted subsampling, deterministic across
    retries/AQE/engines: keep each document with probability
    n_chars / max(n_chars) using the portable Knuth hash as the
    uniform draw — the weighted analogue of docs_sample_hash_topk
    (importance sampling toward long documents, the cheap token-budget
    draw). The keep test is pure integer arithmetic
    (hash·w_max < w·2³¹, products < 2⁶³), so there is no rand(), no
    float threshold, and the DuckDB twin reproduces the exact sample.
    One corpus max (1-row broadcast) + a codegen'd filter; summarized
    per source with exact expected-vs-actual rates."""
    from hrfco_data_pipeline_spark.operators.sampling import KNUTH

    docs = load_table(spark, sf_dir, "documents")
    m = F.lit(2_147_483_648)
    h = (F.col("doc_id").cast("long") % m * F.lit(KNUTH)) % m
    wmax = docs.agg(F.max("n_chars").alias("w_max"))
    flagged = docs.crossJoin(F.broadcast(wmax)).select(
        "source",
        "n_chars",
        "w_max",
        (h * F.col("w_max") < F.col("n_chars") * m).alias("keep"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0)).alias(
                "kept_chars"
            ),
            # exact integer sum divided ONCE: a per-row double sum
            # would be summation-order-dependent
            F.round(
                F.sum("n_chars").cast("double")
                / F.first("w_max").cast("double"),
                4,
            ).alias("expected_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            "total_chars",
            F.col("kept_chars").cast("long").alias("kept_chars"),
            "expected_kept",
        )
    )


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimensionality reduction by sparse random projection (the
    Achlioptas construction): project every embedding to 8 components
    with entries s(i,j) ∈ {+1, 0, -1} (probabilities 1/6, 2/3, 1/6)
    scaled by √3 — the JL-lemma-backed cheap alternative to PCA for
    shrinking ANN/dedup index footprints 4×.

    The projection matrix is never materialized: each entry derives
    from the integer Knuth hash of its flat index ((i·8+j)·KNUTH mod
    2³¹ mod 6), so Spark and the DuckDB twin regenerate the identical
    matrix from arithmetic alone — no float literals, no RNG, no
    broadcast. Each component is an index-ordered fold over the
    vector (deterministic summation), one scan, zero shuffles: scales
    exactly as the read.

    Components ship as RAW doubles: the fold chains are op-for-op
    identical across engines so the bits agree, whereas round(x, 4)
    does not — Spark's BigDecimal HALF_UP has no signed zero while
    DuckDB's binary round keeps -0.0 (CORRECTNESS_r06 caught exactly
    that on one near-zero component)."""
    from hrfco_data_pipeline_spark.operators.similarity import as_double_vec

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", as_double_vec("embedding", "v"))
    return v.select(
        "vec_id",
        *[_achlioptas_component("v", j).alias(f"p{j}") for j in range(8)],
    )


def _achlioptas_component(vcol: str, j: int) -> Column:
    """Component j of the Achlioptas sparse random projection over the
    double-array column ``vcol`` (the embedding_random_projection
    construction, factored in r15 so the JL distortion audit reads
    the exact same matrix): entry sign from the integer Knuth hash of
    the flat index, index-ordered fold, sqrt(3) scale — regenerated
    from arithmetic alone in both engines."""
    import math as _math

    kn, m = 2654435761, 2_147_483_648
    d = F.size(vcol)

    def sign(i: Column) -> Column:
        h = F.pmod((i * 8 + F.lit(j)) * F.lit(kn), F.lit(m)) % 6
        return (
            F.when(h == 0, F.lit(1.0))
            .when(h == 1, F.lit(-1.0))
            .otherwise(F.lit(0.0))
        )

    fold = F.aggregate(
        F.sequence(F.lit(0), d - 1),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(vcol, (i + 1).cast("int")) * sign(i),
    )
    return F.lit(_math.sqrt(3.0)) * fold


def _nb_confusion(train: DataFrame, evald: DataFrame) -> DataFrame:
    """Shared multinomial-NB core: train priors/likelihoods on
    ``train``, score and argmax every ``evald`` doc, return the
    (true lang x predicted lang) confusion matrix. Eval tokens absent
    from the training vocabulary are dropped (the deterministic OOV
    rule both faces and their oracles mirror).

    r17 (the r15 live-subplan lesson; guide §2.4): the trained model
    tables are MATERIALIZED once. ``ct`` is consumed by four branches
    (nl, vocab, v, and the dense grid) and each used to re-embed the
    whole tokenize+count subtree — the classifier face executed
    7 parquet scans / 11 exchanges per run. ``ct`` is vocab×langs
    rows BY CONSTRUCTION (never token-instance-bounded), so the
    checkpoint is sketch-sized; ``pri`` likewise, and ``tot`` is now
    derived from ``pri`` (Σ n_docs ≡ count(*), exact longs) instead
    of a separate corpus scan. Executed plan: 7 scans → 2 (the ct
    build + the eval tokenize), 11 → 5 exchanges."""
    from hrfco_data_pipeline_spark.operators.dedup import _materialized

    toks_of = lambda d: d.select(  # noqa: E731
        "doc_id",
        "lang",
        F.explode(
            F.transform(_tokens(), lambda t: F.lower(t))
        ).alias("tok"),
    )
    toks = toks_of(train)
    # training counts: c(tok, lang), N_lang, priors, vocabulary
    ct = _materialized(
        toks.groupBy("tok", "lang").agg(F.count("*").alias("c"))
    )
    nl = ct.groupBy("lang").agg(F.sum("c").alias("n_l"))
    pri = _materialized(
        train.groupBy(F.col("lang").alias("p_lang")).agg(
            F.count("*").alias("n_docs")
        )
    )
    tot = pri.agg(F.sum("n_docs").alias("n_total"))
    vocab = ct.select("tok").distinct()
    v = vocab.agg(F.count("*").alias("v"))
    # dense (tok, lang) grid so unseen cells carry the smoothed
    # default; vocab/nl/ct share lineage, so qualify the self-join
    grid = (
        vocab.alias("vb")
        .crossJoin(nl.alias("nlt"))
        .join(
            ct.alias("ctt"),
            (F.col("vb.tok") == F.col("ctt.tok"))
            & (F.col("nlt.lang") == F.col("ctt.lang")),
            "left",
        )
        .select(
            F.col("vb.tok").alias("tok"),
            F.col("nlt.lang").alias("m_lang"),
            F.coalesce(F.col("ctt.c"), F.lit(0)).alias("c"),
            F.col("nlt.n_l").alias("n_l"),
        )
    )
    # per-doc distinct token counts joined to all |langs| model rows
    dt = toks_of(evald).groupBy("doc_id", "lang", "tok").agg(
        F.count("*").alias("k")
    )
    terms = dt.join(grid, "tok").crossJoin(F.broadcast(v))
    logp = F.log2(
        (F.col("c").cast("double") + 1.0)
        / (F.col("n_l").cast("double") + F.col("v").cast("double"))
    )
    scored = (
        terms.groupBy("doc_id", "lang", "m_lang")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("tok", "k", "c", "n_l", "v"))
            ).alias("ts")
        )
        .withColumn(
            "loglik",
            F.aggregate(
                "ts",
                F.lit(0.0),
                lambda acc, t: acc
                + t["k"].cast("double")
                * F.log2(
                    (t["c"].cast("double") + 1.0)
                    / (t["n_l"].cast("double") + t["v"].cast("double"))
                ),
            ),
        )
    )
    del logp
    with_prior = (
        scored.join(pri, scored["m_lang"] == pri["p_lang"])
        .drop("p_lang")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "score",
            F.col("loglik")
            + F.log2(
                F.col("n_docs").cast("double")
                / F.col("n_total").cast("double")
            ),
        )
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("m_lang")
    )
    pred = with_prior.withColumn("rn", F.row_number().over(wd)).filter(
        F.col("rn") == 1
    )
    return (
        pred.groupBy(
            F.col("lang").alias("true_lang"),
            F.col("m_lang").alias("pred_lang"),
        )
        .agg(F.count("*").alias("n"))
    )


def docs_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed model TRAINING, not just scoring: fit a multinomial
    Naive Bayes language classifier on the corpus (priors + add-1
    token likelihoods per language) and evaluate it on the training
    set, reported as the (true lang x predicted lang) confusion matrix
    — the supervised companion to the heuristic docs_lang_id and its
    docs_lang_confusion report.

    score(d, l) = log2 P(l) + sum_tok k*log2((c(tok,l)+1)/(N_l+V));
    unseen (tok, l) cells get the smoothed default via a dense
    vocab×lang grid (|V|*|langs| rows — vocab-bounded, never
    token-instance-bounded). Every input to the floating math is an
    exact integer count, per-(doc, lang) sums fold over the SORTED
    token list, and the argmax is a deterministic (score desc, lang)
    rank — so the trained model's predictions are bit-reproducible at
    any parallelism and engine-portable (core shared with
    docs_nb_holdout_eval via _nb_confusion)."""
    # r17: a _docs_parallel spread was tried and REVERTED — interleaved
    # same-process A/B at sf0.1: old 2.95-3.66 s vs spread 3.41-4.24 s
    # per run (the forced exchange costs more than the serial scan
    # saves; the r3 docs_ngram lesson repeats on the NB kernels).
    docs = load_table(spark, sf_dir, "documents")
    return _nb_confusion(docs, docs)


def docs_nb_holdout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out NB evaluation — the methodology half the training-set
    confusion (docs_nb_lang_classifier) cannot give: train on the 75%
    Knuth-hash split, score ONLY the held-out 25%, report the
    generalization confusion matrix. The split is the deterministic
    portable bucket hash (no rand(), identical under retries/AQE and
    in the oracle); held-out tokens outside the training vocabulary
    are dropped by the documented OOV rule."""
    from hrfco_data_pipeline_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id", 4)
    return _nb_confusion(docs.filter(b != 0), docs.filter(b == 0))


def docs_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic: log-log OLS fit of token frequency
    against frequency rank over the corpus head (top 1000 terms) —
    slope ≈ -1 for natural language, far off for boilerplate or
    synthetic junk; the corpus-statistics companion to vocab growth
    (Heaps) and token entropy.

    The global frequency rank routes through operators/ranking.
    ranked_cumsum (range-bucketed two-pass — the vocab table grows
    with the corpus, so no single-partition sort), the head filter
    bounds everything after it at 1000 rows, and the four OLS sums
    fold over the RANK-SORTED list so every double add is
    order-pinned and engine-portable."""
    from hrfco_data_pipeline_spark.operators.ranking import ranked_cumsum

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_tokens()).alias("tok"))
        .groupBy(F.lower("tok").alias("w"))
        .agg(F.count("*").alias("c"))
    )
    ranked = ranked_cumsum(
        counts,
        -F.col("c").cast("double"),
        [F.desc("c"), F.asc("w")],
        sample_key=F.col("w"),
        rank_name="rank",
    ).filter(F.col("rank") <= 1000)
    pts = ranked.select(
        "rank",
        F.log2(F.col("rank").cast("double")).alias("x"),
        F.log2(F.col("c").cast("double")).alias("y"),
    )
    head = pts.agg(
        F.count("*").alias("n"),
        F.sort_array(F.collect_list(F.struct("rank", "x", "y"))).alias(
            "ps"
        ),
    )
    fold = lambda expr: F.aggregate(  # noqa: E731
        "ps", F.lit(0.0), lambda acc, p: acc + expr(p)
    )
    sums = head.select(
        "n",
        fold(lambda p: p["x"]).alias("sx"),
        fold(lambda p: p["y"]).alias("sy"),
        fold(lambda p: p["x"] * p["y"]).alias("sxy"),
        fold(lambda p: p["x"] * p["x"]).alias("sxx"),
    )
    nn = F.col("n").cast("double")
    slope = (nn * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nn * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / nn
    return sums.select(
        "n",
        _r4(slope).alias("zipf_slope"),
        _r4(intercept).alias("log2_c_at_rank1"),
    )


def pq_distortion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-quality audit for the PQ index: per sub-space, the
    mean squared reconstruction error (distance from each vector's
    sub-segment to its assigned sub-centroid) — the distortion number
    that decides whether m/ksub are adequate before shipping a
    compressed ANN index (the QA companion to pq_adc_topk, like
    minhash_calibration is to the LSH path).

    Codebook training is the shared integer-exact pq_subcentroids;
    each per-vector min-distance double is bit-reproducible, so it is
    floor-quantized to integer nanos and SUMMED EXACTLY (DECIMAL) —
    no float-summation-order dependence at any parallelism — with one
    division per report row. One scan + an 8-row aggregate."""
    from hrfco_data_pipeline_spark.operators.similarity import (
        _cmat_lit,
        as_double_vec,
        l2sq,
        pq_subcentroids,
    )

    m, ksub, dim = 8, 16, 64
    dsub = dim // m
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    cents = pq_subcentroids(vecs, m=m, ksub=ksub, dim=dim)
    qcols = []
    for j in range(m):
        sub = F.slice("v", j * dsub + 1, dsub)
        mind = F.array_min(
            F.transform(_cmat_lit(cents[j]), lambda c: l2sq(sub, c))
        )
        qcols.append(
            F.floor(mind * 1_000_000_000).cast("long").alias(f"q{j}")
        )
    quantized = vecs.select(*qcols)
    stacked = quantized.selectExpr(
        "stack({}, {}) AS (subspace, q)".format(
            m, ", ".join(f"{j}, q{j}" for j in range(m))
        )
    )
    return (
        stacked.groupBy("subspace")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(
                F.sum(F.col("q").cast("decimal(38,0)")).cast("double")
                / (F.count("*") * F.lit(1_000_000_000)).cast("double"),
                6,
            ).alias("mean_distortion"),
        )
    )


# The derived previous-snapshot fixture (shared by docs_snapshot_diff,
# docs_crosssnap_dup_trend, and their oracle twins via
# oracles.SNAPSHOT_GAP_MOD/SNAPSHOT_REV_MOD — r14 self-review: the
# constants were maintained in four places):
SNAPSHOT_GAP_MOD = 97  # doc_id % GAP == 0: not yet ingested in prev
SNAPSHOT_REV_MOD = 89  # doc_id % REV == 0: stale upstream revision


def prev_snapshot_hashes(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, h_old) of the deterministically-derived previous
    snapshot, including the one retired key the current snapshot no
    longer carries (exercises the 'removed' class; harmless to
    consumers that join on current keys only)."""
    return docs.filter(F.col("doc_id") % SNAPSHOT_GAP_MOD != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % SNAPSHOT_REV_MOD == 0,
                F.concat(F.col("text"), F.lit(" [rev1]")),
            ).otherwise(F.col("text"))
        ).alias("h_old"),
    ).unionByName(
        spark.range(1).select(
            F.lit(-1).cast("long").alias("doc_id"),
            F.md5(F.lit("retired")).alias("h_old"),
        )
    )


def docs_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff: classify every document key as added,
    removed, changed, or unchanged between two corpus snapshots — the
    audit an incremental curation pipeline publishes per release
    ("what moved since the last training set"). The 'previous'
    snapshot derives deterministically from the current table
    (prev_snapshot_hashes: SNAPSHOT_GAP_MOD drops not-yet-ingested
    keys, SNAPSHOT_REV_MOD marks stale upstream revisions), so the
    diff is oracle-checkable without a second stored table; a real
    deployment points the two sides at two snapshot paths.

    Shape: one full-outer join on the key comparing 16-byte content
    hashes — never the texts themselves — with map-side-combined
    classification counts; scales as two scans + one key shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    cur = docs.select("doc_id", F.md5("text").alias("h_new"))
    prev = prev_snapshot_hashes(spark, docs)
    j = cur.join(prev, "doc_id", "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_new") != F.col("h_old"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"))
    )


def docs_train_linear_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed TRAINING by gradient descent: fit a linear quality
    gate (5 weights over bias/length/diversity/stopword/word-length
    features) to the heuristic keep label with 3 full-batch descent
    steps, and report the learned weights + training accuracy — the
    classifier-training loop (the fastText-style quality model's
    ancestor) run as a Spark job.

    Bit-portability is engineered end to end: the link is the RATIONAL
    squash 0.5 + 0.5·z/(1+|z|) — only +,-,*,/,abs, all exactly rounded
    — because exp() differs between engines in the last ulp (measured:
    ~4% of sigmoid values), so true logistic cannot hash-match. Each
    per-doc gradient contribution is floor-quantized to integer nanos
    and summed EXACTLY (DECIMAL), so the gradient — and therefore every
    weight and the final accuracy — is identical at any parallelism
    and in the DuckDB twin (which unrolls the same three iterations as
    CTEs). Per iteration: one 5-sum aggregate over the MATERIALIZED
    feature table; the driver holds only the 5 weights (the k-means
    bounded-collect pattern). r17 (guide §2.4 — don't compute things
    four times; the hydro_level_mad_outliers domain-checkpoint
    precedent): the featurization pass (tokenize + array_distinct +
    stopword filter + per-token length fold) used to re-run inside all
    THREE descent aggregates AND the accuracy pass; `feats` is 6
    narrow doubles per doc, so it checkpoints once and the four
    aggregates read the checkpoint — the classic featurize-once ML
    shape. Interleaved 6-rep A/B at sf0.1: old 5.10 s / new 2.86 s
    median, new wins every pair; identical output row.
    Eager exception like events_median_bisect: the descent loop runs
    at call time (the CLI explain path warns)."""
    from hrfco_data_pipeline_spark.operators.dedup import _materialized

    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    stop = (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n
    )
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_wlen = sum_len.cast("double") / n.cast("double")
    quality = (
        F.when((n >= 20) & (n <= 1000), 0.4).otherwise(0.0)
        + F.when(ttr >= 0.3, 0.3).otherwise(0.0)
        + F.when((stop >= 0.01) & (stop <= 0.5), 0.3).otherwise(0.0)
    )
    feats = _materialized(
        docs.select(
            F.lit(1.0).alias("x0"),
            (F.least(n, F.lit(1000)).cast("double") / 1000.0).alias("x1"),
            ttr.alias("x2"),
            stop.alias("x3"),
            (F.least(mean_wlen, F.lit(20.0)) / 20.0).alias("x4"),
            F.when(quality >= 0.7, 1.0).otherwise(0.0).alias("y"),
        )
    )

    def dot(w: list[float]):
        z = F.lit(w[0]) * F.col("x0")
        for j in range(1, 5):
            z = z + F.lit(w[j]) * F.col(f"x{j}")
        return z

    w = [0.0] * 5
    n_docs = None
    for _ in range(3):
        z = dot(w)
        s = F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))
        row = feats.agg(
            F.count("*").alias("n"),
            *[
                F.sum(
                    F.floor(
                        F.col(f"x{j}") * (s - F.col("y")) * 1_000_000_000
                    ).cast("decimal(38,0)")
                ).alias(f"g{j}")
                for j in range(5)
            ],
        ).collect()[0]
        n_docs = row["n"]
        w = [
            w[j] - (int(row[f"g{j}"]) / 1e9) / n_docs for j in range(5)
        ]
    z = dot(w)
    correct = (
        (z >= 0).cast("int") == (F.col("y") == 1.0).cast("int")
    ).cast("long")
    acc = feats.agg(
        F.count("*").alias("n_docs"),
        F.sum(correct).alias("n_correct"),
    )
    return acc.select(
        "n_docs",
        "n_correct",
        F.round(
            F.col("n_correct").cast("double") / F.col("n_docs").cast("double"),
            4,
        ).alias("train_accuracy"),
        *[F.round(F.lit(w[j]), 6).alias(f"w{j}") for j in range(5)],
    )


def docs_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-scaling learning curve — the question an LLM-data engine
    exists to answer ("how does model quality scale with data"): train
    the NB language model on growing Knuth-hash fractions of the
    corpus (1/4, 2/4, 3/4) and score each against the SAME held-out
    quarter, reporting held-out accuracy per training fraction. Nested
    training subsets make the curve monotone-comparable; the fixed
    eval fold keeps the comparison honest.

    Three runs of the shared _nb_confusion core (vocab-bounded
    shuffles each; the eval fold never leaks into any training set);
    accuracy reduces each confusion matrix to one row. Bit-exact for
    the same reasons as the parent queries."""
    from hrfco_data_pipeline_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id", 4)
    evald = docs.filter(b == 0)
    curves = []
    for k in (1, 2, 3):
        conf = _nb_confusion(docs.filter((b >= 1) & (b <= k)), evald)
        curves.append(
            conf.agg(
                F.lit(k).alias("n_quarters"),
                F.sum("n").alias("n_eval"),
                F.sum(
                    F.when(
                        F.col("true_lang") == F.col("pred_lang"), F.col("n")
                    ).otherwise(0)
                ).alias("n_correct"),
            ).select(
                "n_quarters",
                "n_eval",
                F.col("n_correct").cast("long").alias("n_correct"),
                F.round(
                    F.col("n_correct").cast("double")
                    / F.col("n_eval").cast("double"),
                    4,
                ).alias("holdout_accuracy"),
            )
        )
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    return out


def ann_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF-flat index against the brute-force ground
    truth — the QA report every ANN deployment keeps next to its
    index build (the minhash_recall_report sibling for the embedding
    side). Per query: how many of IVF's nprobe=1 top-5 sit in the true
    cosine top-5. Composes the two oracle-exact faces (ann_cosine_topk,
    ivf_cosine_topk), so the recall itself is oracle-backed — both
    engines join identical neighbor sets.

    Scale shape: inherits the bounded shapes of its inputs (cell-routed
    candidates, WindowGroupLimit top-k); the report join keys on
    (query, neighbor) — a query-bounded exchange."""
    ivf = ivf_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    brute = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        ivf.join(brute, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    qs = brute.select("query_id").distinct()
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)).cast("double") / F.lit(5.0)).alias(
            "recall_at_5"
        ),
    )


def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the (uncentered) embedding
    second-moment matrix by DISTRIBUTED power iteration — the
    spectral sibling of docs_train_linear_gate's gradient descent:
    the model is trained on the engine, and every arithmetic step is
    engine-portable so the DuckDB twin reproduces it bit-for-bit.

    Per iteration: dot_i = <x_i, v> as an index-ordered fold
    (deterministic summation), contribution x_i * dot_i floor-quantized
    to integer nanos and summed as DECIMAL(38,0) (order-invariant
    exact — the same trick as the GD gradients, but widened past
    BIGINT so a 100 TB corpus cannot silently wrap the accumulator
    under non-ANSI mode; the DuckDB twin accumulates HUGEINT, so both
    engines are exact to ~1e38 — per-row terms are ~1e12, putting the
    ceiling at ~1e26 rows, unreachable), then v <- w / max_j |w_j|
    with the single division done in doubles on identical integer
    operands.
    Three iterations; the first two collect one 64-long row each
    (bounded k*dim-style collect), the last stays a DataFrame and
    normalizes engine-side. Output: one row per dimension with its
    loading — suited for spectral screening of embedding spaces
    (dominant-direction energy, whitening prep) before ANN indexing.

    Scale shape: each iteration is one full scan + one 64-column
    partial-aggregated sum (map-side combine, 1-row result); no
    shuffle wider than the aggregate, driver state is 64 doubles.
    """
    from hrfco_data_pipeline_spark.operators.similarity import as_double_vec

    dim = 64
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))

    def dot_with(v_lits: list[float]) -> Column:
        # left fold FROM 0.0, matching the oracle's list_reduce seed
        # (0.0 + (-0.0) = 0.0 — starting from the first product would
        # diverge on a negative-zero leading term)
        expr: Column = F.lit(0.0)
        for j in range(dim):
            expr = expr + F.element_at("v", j + 1) * F.lit(v_lits[j])
        return expr

    def w_aggs(dot: Column) -> list[Column]:
        # per-row floor() output fits LONG easily (terms ~1e12); the
        # overflow risk is the SUM, so it accumulates as decimal
        return [
            F.sum(
                F.floor(
                    F.element_at("v", j + 1) * dot * F.lit(1000000000.0)
                ).cast("decimal(38,0)")
            ).alias(f"s{j}")
            for j in range(dim)
        ]

    v = [1.0] * dim
    for _ in range(2):
        row = vecs.agg(*w_aggs(dot_with(v))).collect()[0]
        w = [int(row[f"s{j}"]) for j in range(dim)]
        wmax = max(abs(x) for x in w)
        # float()/float() mirrors the oracle's ::DOUBLE / ::DOUBLE
        v = [float(x) / float(wmax) for x in w]

    wrow = vecs.agg(*w_aggs(dot_with(v)))
    arr = F.array(*[F.col(f"s{j}") for j in range(dim)])
    tmp = wrow.select(
        arr.alias("arr"),
        F.array_max(F.transform(arr, lambda x: F.abs(x))).alias("wmax"),
    )
    return tmp.select(
        F.posexplode("arr").alias("dim", "w"), F.col("wmax")
    ).select(
        F.col("dim").cast("int").alias("dim"),
        (F.col("w").cast("double") / F.col("wmax").cast("double")).alias(
            "loading"
        ),
    )


def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style overlapping-window analysis over binary payloads
    (operators/multimodal.frame_windows: frame 64, hop 32 — 50%
    overlap): per document, the window count, total and peak window
    energy, and the peak window index (lowest index on ties — the
    deterministic argmax a real loudest-segment sampler would use).
    Docs shorter than one frame carry no full window and are omitted.
    The Python stage is Arrow-batched mapInPandas fan-out only; all
    aggregation is JVM-side."""
    from hrfco_data_pipeline_spark.operators.multimodal import (
        frame_windows,
        to_multimodal,
    )

    docs = load_table(spark, sf_dir, "documents")
    wins = frame_windows(
        to_multimodal(docs, modality="audio-blob"), frame_bytes=64, hop_bytes=32
    )
    agg = wins.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.sum("energy").alias("total_energy"),
        F.max("energy").alias("max_energy"),
    )
    peak = (
        wins.join(
            agg.select("doc_id", F.col("max_energy").alias("me")), "doc_id"
        )
        .filter(F.col("energy") == F.col("me"))
        .groupBy("doc_id")
        .agg(F.min("win_idx").alias("peak_idx"))
    )
    return agg.join(peak, "doc_id").select(
        "doc_id",
        "n_windows",
        F.col("total_energy").cast("long").alias("total_energy"),
        F.col("max_energy").cast("long").alias("max_energy"),
        F.col("peak_idx").cast("long").alias("peak_idx"),
    )


BM25_QUERIES = [
    (1, "hash"),
    (1, "join"),
    (2, "stream"),
    (2, "window"),
    (2, "agg"),
    (3, "sort"),
    (3, "merge"),
    (4, "scan"),
    (4, "filter"),
    (4, "table"),
]


def _bm25_candidates(docs: DataFrame, qterms: DataFrame) -> DataFrame:
    """Per-term BM25 partial scores of every document containing a
    query term: (query_id, doc_id, term, s). ``qterms`` is a small
    (query_id, term) frame (broadcast). Shared by docs_bm25_topk and
    the hybrid RRF fusion; the arithmetic chain is the bit-portable
    one documented on docs_bm25_topk.

    The postings frame is consumed three times downstream (tf join
    side, per-term df aggregate, corpus stats aggregate) and each
    consumer re-embeds the scan+tokenize chain — but an r16
    interleaved A/B showed `_materialized(bm25_postings(docs))` is a
    WASH-to-loss (old 1.63–1.84 s vs new 1.54–3.00 s warm at sf0.1):
    the re-embedded subtrees are column-pruned far below the full
    postings row (df needs `term` only, stats `doc_id`/`tf` only) and
    execute as parallel stages, while the checkpoint pays a full
    serialize+write of the widest row. Left as live subplans
    deliberately.

    r16 batch-face stats: (n_docs, total_tokens) ≡
    (count of docs with a non-null token array, sum of dl) — every doc
    with non-null text yields ≥1 token (split(trim('')) is ['']), so
    the doc set and token total match the postings-derived aggregates
    integer-for-integer while skipping the explode + (doc, term)
    aggregate the postings pass pays (guide §2.3 — aggregate before
    you shuffle; this arm now shuffles 2 longs)."""
    toks = docs.select("doc_id", _tokens().alias("toks"))
    stats = toks.agg(
        F.countDistinct(
            F.when(F.col("toks").isNotNull(), F.col("doc_id"))
        ).alias("n_docs"),
        F.sum(F.size("toks").cast("long")).alias("total_tokens"),
    )
    return bm25_candidates_from_postings(
        bm25_postings(docs), qterms, stats=stats
    )


def bm25_postings(docs: DataFrame) -> DataFrame:
    """The BM25 index rows: (doc_id, dl, term, tf). This is the table
    the streaming index maintainer (streaming/curation.
    bm25_index_stream) appends per micro-batch — the corpus is
    tokenized exactly once, at ingest."""
    toks = docs.select("doc_id", _tokens().alias("toks"))
    terms = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        F.explode("toks").alias("term"),
    )
    return terms.groupBy("doc_id", "dl", "term").agg(
        F.count("*").alias("tf")
    )


def bm25_candidates_from_postings(
    tf: DataFrame, qterms: DataFrame, stats: DataFrame | None = None
) -> DataFrame:
    """The scoring tail over a postings frame — batch and stored-index
    faces share it row for row. df and the corpus stats re-derive
    from the postings, never the raw corpus: n_docs = distinct doc_id,
    total tokens = sum(tf) (each doc's tf sums to its dl exactly).

    ``stats`` may be supplied by callers that can derive
    (n_docs, total_tokens) cheaper than a postings scan (the batch
    face's explode-free pass); identity is pinned by the parity
    certificate.

    r16 tried-and-reverted: semi-joining the postings to the broadcast
    query-term list FIRST (so the tf exchange and the df aggregate see
    only query-term occurrences — the 100 TB-right shape) lost 0.9 s
    median in an 8-rep interleaved A/B at sf0.1 (1.75 → 2.64 s): the
    filter needs the distinct-term list built and broadcast under BOTH
    arms (two extra jobs + broadcast exchanges), the planner does not
    ReuseExchange the two filtered aggregates, and at this corpus size
    the saved work (a 31-term vocabulary aggregate) is free. Left in
    the pre-filterless form; at real scale the semi-join belongs ahead
    of the tf aggregate."""
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    if stats is None:
        stats = tf.agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("tf").alias("total_tokens"),
        )
    return (
        tf.join(df_tbl, "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "avgdl",
            F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"),
        )
        .withColumn(
            "idf",
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0),
        )
        .withColumn(
            "s",
            F.col("idf")
            * (
                (F.col("tf") * F.lit(2.2))
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (
                        F.lit(1.0)
                        - F.lit(0.75)
                        + F.lit(0.75) * F.col("dl") / F.col("avgdl")
                    )
                )
            ),
        )
    )


def _bm25_fold(cand: DataFrame) -> DataFrame:
    """(query_id, doc_id, score, n_terms): per-doc BM25 totals folding
    the matched terms in sorted-term order (bit-identical doubles)."""
    return cand.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score"),
        F.count("*").alias("n_terms"),
    )


def docs_bm25_topk(spark: SparkSession, sf_dir: str, topk: int = 10) -> DataFrame:
    """BM25 lexical retrieval top-k over the document corpus — the
    classic sparse-retrieval face that pairs with the dense ANN family
    (brute/LSH/IVF/PQ) for hybrid query-document relevance mining:
    per (query, doc), sum over query terms of
    idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
    k1=1.2, b=0.75 and a RATIONAL idf — the raw Robertson odds
    (N - df + 0.5)/(df + 0.5) + 1 without the log damping. The log is
    deliberately avoided: Spark's LOG2 evaluates ln(x)/ln(2), which
    is 1 ulp off a true log2 for some arguments (measured: df=393 at
    sf0.01 flips the last bit and reorders ranks 4-10), so a
    log-idf cannot be engine-exactly verified; the rational idf is
    transcendental-free, monotone in df like log-idf, and the log2
    variant is a one-line swap where cross-engine verification is
    not required (same trade docs_tfidf_top_terms documents).

    Exactness: tf/df/dl/N are integers; avgdl is one double division
    of exact integers; the per-term score chain is written in the
    same operation order on both engines; the per-doc sum folds the
    matched terms in sorted-term order (sort_array + F.aggregate ≡
    DuckDB list ORDER BY + list_reduce), so the doubles are
    bit-identical and ties break on doc_id.

    Scale shape: one tokenize + (doc, term) tf groupBy (the same
    postings shape as docs_tfidf_top_terms — df falls out of tf with
    no second corpus pass), the 10-row query-term list broadcast onto
    the postings, and a TWO-PHASE top-k: query_id is a handful of
    values, so a single row_number window over candidates would put
    each query's whole candidate set in one task at 100 TB — instead
    candidates first rank within (query, pmod(xxhash64(doc_id), 64))
    salt buckets (deterministic, AQE-safe), survivors <= 64*topk per
    query, then the exact global window runs over that bounded set.
    """
    docs = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(BM25_QUERIES, "query_id long, term string")
    scored = _bm25_fold(_bm25_candidates(docs, qterms))
    return bm25_rank_topk(scored, topk)


def bm25_rank_topk(scored: DataFrame, topk: int = 10) -> DataFrame:
    """The two-phase top-k tail (salt-bucket local rank, then the
    exact global window over the bounded survivor set — see
    docs_bm25_topk's scale note). Shared by the batch face and the
    stored-index face."""
    local_w = Window.partitionBy(
        "query_id", F.pmod(F.xxhash64("doc_id"), F.lit(64))
    ).orderBy(F.desc("score"), F.asc("doc_id"))
    survivors = (
        scored.withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= topk)
        .drop("_lr")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "doc_id", "score", "n_terms")
    )


RAKE_STOPWORDS = ("a", "the")


def docs_rake_keyphrases(spark: SparkSession, sf_dir: str, topn: int = 3) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) per document:
    candidate phrases are the maximal token runs between stopwords,
    each word scores deg(w)/freq(w) over the CORPUS-wide phrase
    co-occurrence graph (deg = sum of lengths of phrases containing
    w, freq = occurrence count), a phrase scores the sum of its word
    scores, and each doc keeps its topn phrases — the unsupervised
    keyword face of the text-analysis family (tfidf = distinctive
    single terms; RAKE = multi-word phrases).

    Exactness: deg/freq are exact integers, the word score is one
    double division, and the per-phrase sum folds word scores in
    token-position order (sort_array + F.aggregate ≡ DuckDB list
    ORDER BY + list_reduce) — bit-identical; identical phrase texts
    fold identically, ranking ties break on the phrase string.

    Scale shape: posexplode + one per-doc running-sum window (state
    bounded by doc length) segments phrases; word stats are one
    map-side-combined word-key groupBy; scores join back on the word
    key; the topn window partitions by doc_id. No driver actions, no
    UDFs, nothing denser than the (word) and (doc, phrase) keys.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    pos = toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "w")
    ).withColumn("is_stop", F.col("w").isin(*RAKE_STOPWORDS))
    wd = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = (
        pos.withColumn(
            "phrase_id", F.sum(F.col("is_stop").cast("long")).over(wd)
        )
        .filter(~F.col("is_stop"))
        .select("doc_id", "phrase_id", "pos", "w")
    )
    plen = seg.groupBy("doc_id", "phrase_id").agg(F.count("*").alias("plen"))
    wstats = (
        seg.join(plen, ["doc_id", "phrase_id"])
        .groupBy("w")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("deg"))
        .withColumn(
            "wscore",
            F.col("deg").cast("double") / F.col("freq").cast("double"),
        )
    )
    phrases = (
        seg.join(wstats.select("w", "wscore"), "w")
        .groupBy("doc_id", "phrase_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "w", "wscore"))).alias("ws"))
        .select(
            "doc_id",
            F.array_join(
                F.transform("ws", lambda x: x["w"]), " "
            ).alias("phrase"),
            F.size("ws").cast("long").alias("n_words"),
            F.aggregate(
                "ws", F.lit(0.0), lambda acc, x: acc + x["wscore"]
            ).alias("score"),
        )
    )
    uniq = phrases.groupBy("doc_id", "phrase").agg(
        F.min("n_words").alias("n_words"),
        F.min("score").alias("score"),
        F.count("*").alias("n_occurrences"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("phrase"))
    return (
        uniq.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topn)
        .select("doc_id", "rank", "phrase", "n_words", "n_occurrences", "score")
    )


HYBRID_SEEDS = (10, 20, 30, 40)


def docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid more-like-this retrieval with reciprocal-rank fusion:
    for each seed document, a DENSE arm ranks the corpus by embedding
    cosine (exact brute force — the documents and embeddings tables
    share the 0..N id domain) and a SPARSE arm ranks it by BM25 using
    the seed's own distinct terms as the query; each arm keeps its
    top-20 and the lists fuse with the standard RRF
    score = 1/(60+rank_dense) + 1/(60+rank_sparse) (missing arm
    contributes 0), top-10 per seed — the curation pattern for
    harvesting near-topical training data where lexical and semantic
    similarity disagree.

    Exactness: both arm rankings order bit-identical doubles (the
    fold-left cosine chain of ann_cosine_topk; the rational-idf BM25
    chain of docs_bm25_topk) with id tie-breaks; RRF terms are single
    divisions of exact small integers added in fixed written order.

    Scale shape: dense arm = broadcast 4 seed vectors over one corpus
    scan; sparse arm = the BM25 postings shape with the seed-term
    list broadcast; both top-20 windows partition by seed over
    already-filtered candidates; fusion is a (seed, doc)-key full
    join of two 80-row frames.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # dense arm (ann_cosine_topk's exact chain, seeds as queries)
    vecd = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    with_norm = vecd.withColumn("nrm", F.sqrt(_dot("v", "v")))
    q = with_norm.filter(F.col("vec_id").isin(*HYBRID_SEEDS)).select(
        F.col("vec_id").alias("seed_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    dj = with_norm.join(F.broadcast(q), F.col("vec_id") != F.col("seed_id"))
    cos = _dot("qv", "v") / (F.col("qn") * F.col("nrm"))
    dw = Window.partitionBy("seed_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    dense = (
        dj.select("seed_id", F.col("vec_id").alias("doc_id"), cos.alias("cos"))
        .withColumn("dense_rank", F.row_number().over(dw).cast("int"))
        .filter(F.col("dense_rank") <= 20)
        .select("seed_id", "doc_id", "dense_rank")
    )

    # sparse arm: seed doc's distinct terms as the BM25 query
    seed_docs = docs.filter(F.col("doc_id").isin(*HYBRID_SEEDS))
    qterms = (
        seed_docs.select(
            F.col("doc_id").alias("query_id"),
            F.explode(_tokens()).alias("term"),
        )
        .distinct()
    )
    scored = _bm25_fold(
        _bm25_candidates(docs, qterms).filter(
            F.col("doc_id") != F.col("query_id")
        )
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    sparse = (
        scored.withColumn("sparse_rank", F.row_number().over(sw).cast("int"))
        .filter(F.col("sparse_rank") <= 20)
        .select(
            F.col("query_id").alias("seed_id"), "doc_id", "sparse_rank"
        )
    )

    fused = dense.join(sparse, ["seed_id", "doc_id"], "full").withColumn(
        "rrf",
        F.coalesce(
            F.lit(1.0) / (F.lit(60) + F.col("dense_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(60) + F.col("sparse_rank")), F.lit(0.0)
        ),
    )
    fw = Window.partitionBy("seed_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(fw).cast("int"))
        .filter(F.col("rank") <= 10)
        .select(
            "seed_id", "rank", "doc_id", "rrf", "dense_rank", "sparse_rank"
        )
    )


def multimodal_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D patch analysis over image-like binary payloads
    (operators/multimodal.image_patches: 32-byte rows, 8x8 patches —
    the ViT-tokenizer fan-out), reduced per document to the patch
    count, total/max patch energy, and the argmax patch's grid
    coordinates (row-major first on ties) — the 2-D sibling of
    multimodal_audio_windows' 1-D framing. All aggregation JVM-side;
    the only Python is the Arrow-batched patch fan-out."""
    from hrfco_data_pipeline_spark.operators.multimodal import (
        image_patches,
        to_multimodal,
    )

    docs = load_table(spark, sf_dir, "documents")
    pat = image_patches(
        to_multimodal(docs, modality="image-blob"), width=32, patch=8
    )
    agg = pat.groupBy("doc_id").agg(
        F.count("*").alias("n_patches"),
        F.sum("energy").alias("total_energy"),
        F.max("energy").alias("max_energy"),
    )
    peak = (
        pat.join(
            agg.select("doc_id", F.col("max_energy").alias("me")), "doc_id"
        )
        .filter(F.col("energy") == F.col("me"))
        .groupBy("doc_id")
        .agg(F.min(F.struct("py", "px")).alias("pk"))
        .select("doc_id", F.col("pk.py").alias("peak_py"), F.col("pk.px").alias("peak_px"))
    )
    return agg.join(peak, "doc_id").select(
        "doc_id",
        "n_patches",
        F.col("total_energy").cast("long").alias("total_energy"),
        F.col("max_energy").cast("long").alias("max_energy"),
        F.col("peak_py").cast("long").alias("peak_py"),
        F.col("peak_px").cast("long").alias("peak_px"),
    )


def embedding_mutual_knn(
    spark: SparkSession, sf_dir: str, k: int = 3, max_block: int = 64
) -> DataFrame:
    """Mutual k-NN graph over the embedding corpus: each vector's top-k
    cosine neighbours within its label block, plus the MUTUAL flag
    (neighbour lists that contain each other) — the graph primitive
    semantic-clustering and reciprocal-nearest-neighbour dedup build
    on (a mutual edge is far stronger duplicate evidence than a
    one-way edge from a hub vector). The label is the coarse blocking
    key, exactly as in embedding_block_near_dups (in production: a
    k-means cell or shard id).

    Exactness: cosine = fold-left dot in dimension order over one
    sqrt-norm product — the bit-portable chain every certified
    embedding query uses; cos values ship RAW (no rounding), ranks
    break ties on neighbour id.

    Scale shape: candidate pairs come from the same sub-sharded
    pair-block scheme as embedding_block_near_dups (labels over
    ``max_block`` rows split so no task exceeds ~max_block² pairs;
    replication linear in skew). Each unordered pair's cosine is
    computed ONCE and exploded to both orientations (elementwise
    products commute, so the directed values are bit-identical), then
    one hash-partitioned window ranks each source's neighbours.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vecd = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    with_norm = vecd.withColumn("nrm", F.sqrt(_dot("v", "v")))
    counts = vecd.groupBy("label").agg(F.count("*").alias("n_lbl"))
    sharded = (
        with_norm.join(F.broadcast(counts), "label")
        .withColumn(
            "kk",
            F.greatest(
                F.lit(1), F.ceil(F.col("n_lbl") / F.lit(max_block))
            ).cast("int"),
        )
        .withColumn("s", F.pmod(F.xxhash64("vec_id"), F.col("kk")).cast("int"))
    )
    a = sharded.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("label"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        F.col("s").alias("bl_a"),
        F.explode(F.sequence(F.col("s"), F.col("kk") - 1)).alias("br_a"),
    )
    b = sharded.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        F.explode(F.sequence(F.lit(0), F.col("s"))).alias("bl_b"),
        F.col("s").alias("br_b"),
    )
    pairs = a.join(
        b,
        (F.col("label") == F.col("lb"))
        & (F.col("bl_a") == F.col("bl_b"))
        & (F.col("br_a") == F.col("br_b"))
        & (F.col("id_a") != F.col("id_b")),
    )
    dedup = pairs.filter(
        (F.col("bl_a") != F.col("br_a")) | (F.col("id_a") < F.col("id_b"))
    )
    scored = dedup.select(
        "id_a",
        "id_b",
        (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos"),
    )
    directed = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"), F.col("id_b").alias("nbr")
                ),
                F.struct(
                    F.col("id_b").alias("src"), F.col("id_a").alias("nbr")
                ),
            )
        ).alias("e"),
        "cos",
    ).select("e.src", "e.nbr", "cos")
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("nbr"))
    knn = directed.select(
        "src", "nbr", "cos", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= k)
    rev = knn.select(
        F.col("src").alias("r_src"), F.col("nbr").alias("r_nbr")
    )
    return (
        knn.join(
            rev,
            (F.col("nbr") == F.col("r_src")) & (F.col("src") == F.col("r_nbr")),
            "left",
        )
        .select(
            F.col("src").alias("vec_id"),
            F.col("nbr").alias("nbr_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("cos").alias("cos_sim"),
            F.col("r_src").isNotNull().alias("mutual"),
        )
    )


def docs_pmi_top_pairs(
    spark: SparkSession,
    sf_dir: str,
    vocab_size: int = 100,
    min_co_docs: int = 5,
    topk: int = 50,
) -> DataFrame:
    """Top co-occurring token pairs by PMI lift over the document
    corpus: lift(x,y) = N·df(x,y) / (df(x)·df(y)) — the association
    score collocation mining and taxonomy induction start from
    (lift > 1 = the pair co-occurs more than independence predicts).
    Scores stay in the RATIONAL domain (the docs_bm25_topk pattern):
    one double division of exact integer products, no log anywhere —
    log₂(lift) would re-import Spark's 1-ulp LOG2 drift for zero
    ranking power.

    Scale shape: the pair explosion is bounded by construction — the
    corpus-wide top-``vocab_size`` vocabulary (doc-frequency, ties on
    the token) is a TakeOrderedAndProject broadcast, per-doc distinct
    tokens are filtered to it BEFORE pairing, so a doc contributes
    <= vocab_size²/2 pairs regardless of its length and the candidate
    space is <= vocab_size² rows total: the final ranking window runs
    over a bounded frame, never the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.transform(_tokens(), lambda t: F.lower(t)))
        ).alias("tok"),
    )
    df_counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    vocab = df_counts.orderBy(F.desc("c"), F.asc("tok")).limit(vocab_size)
    tv = toks.join(F.broadcast(vocab), "tok")
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    a = tv.select(
        "doc_id", F.col("tok").alias("tok_a"), F.col("c").alias("c_a")
    )
    b = tv.select(
        F.col("doc_id").alias("d2"),
        F.col("tok").alias("tok_b"),
        F.col("c").alias("c_b"),
    )
    co = (
        a.join(
            b,
            (F.col("doc_id") == F.col("d2")) & (F.col("tok_a") < F.col("tok_b")),
        )
        .groupBy("tok_a", "tok_b")
        .agg(
            F.count("*").alias("c_xy"),
            F.min("c_a").alias("c_a"),
            F.min("c_b").alias("c_b"),
        )
        .filter(F.col("c_xy") >= min_co_docs)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "c_xy",
            "c_a",
            "c_b",
            (
                (F.col("n_docs") * F.col("c_xy")).cast("double")
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.desc("lift"), F.asc("tok_a"), F.asc("tok_b"))
    return (
        co.select(
            "tok_a",
            "tok_b",
            F.col("c_xy").cast("long").alias("n_co_docs"),
            F.col("c_a").cast("long").alias("df_a"),
            F.col("c_b").cast("long").alias("df_b"),
            "lift",
            F.row_number().over(w).cast("int").alias("rank"),
        )
        .filter(F.col("rank") <= topk)
    )


def docs_ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail quality bucketing per language:
    rank every document inside its language by the trained-model score
    and cut the ranking into terciles (ntile(3)) — head = the third a
    CCNet pipeline keeps unconditionally, tail = the third it drops or
    reserves for contrastive training. Per (lang, bucket): document
    and token volume plus the score range, i.e. the per-language
    quality ladder the sampling stage reads.

    The ranking key is _model_z's exact fold (bit-identical across
    engines) — NOT the sigmoid or a perplexity: CCNet's original
    log-perplexity ordering would re-import Spark's 1-ulp LOG2 drift
    into tercile BOUNDARIES, where one flipped comparison relabels two
    documents (the docs/ROUND8.md log2 finding applied at design
    time). min_z/max_z ship raw — selection only, no accumulation.

    Scale shape: one (doc, bucket) aggregate for z (map-side combined),
    then a per-language window — partition count = |languages|, each
    partition one language's docs (skew-bounded by corpus language
    mix; a 100 TB run would range-bucket the giant-language partition
    with operators/ranking.int_ntile, same output).
    """
    docs = load_table(spark, sf_dir, "documents")
    z = _model_z(docs)
    zl = z.join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("z"), F.asc("doc_id"))
    bucketed = zl.select(
        "lang", "n_toks", "z", F.ntile(3).over(w).alias("bucket")
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_toks"),
        F.min("z").alias("min_z"),
        F.max("z").alias("max_z"),
    ).select(
        "lang",
        F.col("bucket").cast("int").alias("bucket"),
        "n_docs",
        "total_toks",
        "min_z",
        "max_z",
    )


# Poisson(1) inverse-CDF thresholds pre-scaled to the 2^31 Knuth-hash
# space (floor(P(X<=k)·2^31) for k=0..6, computed once in Python so
# both engines compare INTEGERS; mass beyond w=7 is 8.3e-5 and folds
# into the top band). The Poisson bootstrap is the standard
# distributed bootstrap: independent per-row weights need no
# with-replacement shuffle.
POISSON1_T = [
    790015084,
    1580030168,
    1975037710,
    2106706891,
    2139624186,
    2146207645,
    2147304888,
]


def docs_quality_bootstrap_ci(
    spark: SparkSession, sf_dir: str, n_resamples: int = 200
) -> DataFrame:
    """Per-source 95% bootstrap confidence interval for mean document
    quality — the error bar a curation report should put next to every
    corpus-health number. Distributed as a POISSON BOOTSTRAP (Chamandy
    et al., the industry-standard shuffle-free form): resample b gives
    each document an independent Poisson(1) weight derived from the
    portable Knuth hash of (doc_id, b), so one pass computes all B
    resample means; the CI is the rank-rule [2.5%, 97.5%] selection
    over them.

    INTEGER-EXACT throughout: the quality score is rebuilt as q10 ∈
    {0,3,4,7,10} (the band constants ×10), weights come from
    pre-scaled integer thresholds (POISSON1_T — no float CDF at run
    time), every resample mean is ONE division of two exact integer
    sums, and the CI bounds only SELECT among those doubles. No
    accumulation of floats anywhere.

    Scale shape: the ×B blowup is map-side (explode 0..B-1 after the
    per-doc score — aggregate state is B·|sources| rows per task,
    combiner-friendly); the CI window runs over the B-row-per-source
    resample frame, bounded by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    ratio = (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
        / n
    )
    q10 = (
        F.when((n >= 20) & (n <= 1000), 4).otherwise(0)
        + F.when(ttr >= 0.3, 3).otherwise(0)
        + F.when((ratio >= 0.01) & (ratio <= 0.5), 3).otherwise(0)
    )
    scored = docs.select("doc_id", "source", q10.alias("q10"))
    M = F.lit(2_147_483_648)
    b = F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1))).alias("b")
    h = ((F.col("doc_id") * n_resamples + F.col("b")) % M * 2654435761) % M
    w = sum(
        (h >= F.lit(t)).cast("long") for t in POISSON1_T
    )  # 0..7 Poisson(1) weight, integer comparisons only
    weighted = scored.select("doc_id", "source", "q10", b).select(
        "source",
        "b",
        w.alias("w"),
        (w * F.col("q10")).alias("wq"),
    )
    means = (
        weighted.groupBy("source", "b")
        .agg(F.sum("w").alias("sw"), F.sum("wq").alias("swq"))
        .filter(F.col("sw") > 0)
        .select(
            "source",
            "b",
            (
                F.col("swq").cast("double")
                / (F.lit(10) * F.col("sw")).cast("double")
            ).alias("mean_q"),
        )
    )
    wq = Window.partitionBy("source").orderBy("mean_q", "b")
    ranked = means.select(
        "source",
        "mean_q",
        F.row_number().over(wq).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("nb"),
    )
    ci = ranked.groupBy("source").agg(
        F.max("nb").cast("long").alias("n_resamples"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("nb") * F.lit(0.025)),
                F.col("mean_q"),
            )
        ).alias("ci_lo"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("nb") * F.lit(0.975)),
                F.col("mean_q"),
            )
        ).alias("ci_hi"),
    )
    point = scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        (
            F.sum("q10").cast("double")
            / (F.lit(10) * F.count("*")).cast("double")
        ).alias("mean_quality"),
    )
    return point.join(ci, "source").select(
        "source", "n_docs", "mean_quality", "n_resamples", "ci_lo", "ci_hi"
    )


def docs_source_halves_drift(
    spark: SparkSession, sf_dir: str, n_buckets: int = 256
) -> DataFrame:
    """Within-source snapshot drift: per source, the total-variation
    distance between the token-bucket distributions of its two
    interleaved doc_id halves (even vs odd — the deterministic
    snapshot-half split) — the cross-table drift matrix of VERDICT
    r14 'Next round' #2, expressed TV-style per the Math.log rule
    (the PSI form would add a watch-list entry; TV carries the same
    drift signal with an integer-exact core). A source whose halves
    diverge is changing register mid-corpus (a mixed crawl, a feed
    format flip); docs_source_tv_distance reads drift ACROSS sources,
    this reads drift WITHIN each.

    INTEGER-EXACT core (the tv_from_counts convention):
    TV·2·n_a·n_b = Σ_b |c_a·n_b − c_b·n_a| summed in DECIMAL(38,0);
    the oracle converts the sum through the hi/lo 2^40 split (exact
    for sums to 2^93 — stricter than the parent's direct HUGEINT
    cast, per SCALE.md §r14), and the single final division runs on
    identical operands in both engines.

    Scale shape: one map-side-combined (source, half, bucket) count
    over the token stream, then everything runs on the bounded
    |sources|·2·n_buckets grid — dense-grid left joins and the final
    per-source rollup are broadcast-sized by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        (F.col("doc_id") % 2).alias("half"),
        F.explode(_tokens()).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.lower("tok")), 1, 15), 16, 10).cast("long")
        % n_buckets
    ).alias("b")
    from hrfco_data_pipeline_spark.operators.dedup import _materialized

    # the bounded |sources|·2·n_buckets count grid MATERIALIZES so its
    # two consumers (bucket pivot, per-source totals) tokenize the
    # corpus once, not twice (the r14 plan-census rule)
    counts = _materialized(
        toks.select("source", "half", bucket)
        .groupBy("source", "half", "b")
        .agg(F.count("*").alias("c"))
    )
    # pivot the halves into columns instead of self-joining two
    # filtered branches of the same frame (a filter-divergent
    # self-join mis-resolves the join condition — measured: 0 rows);
    # buckets absent from BOTH halves contribute |0-0| = 0, so no
    # dense grid is needed either
    ch = lambda h: F.coalesce(  # noqa: E731
        F.sum(F.when(F.col("half") == h, F.col("c"))), F.lit(0)
    )
    piv = counts.groupBy("source", "b").agg(
        ch(0).alias("ca"), ch(1).alias("cb")
    )
    tot = counts.groupBy("source").agg(
        ch(0).alias("n_a"), ch(1).alias("n_b")
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pairs = piv.join(F.broadcast(tot), "source").select(
        "source", "n_a", "n_b",
        F.abs(
            d38(F.col("ca")) * d38(F.col("n_b"))
            - d38(F.col("cb")) * d38(F.col("n_a"))
        ).alias("term"),
    )
    return pairs.groupBy("source", "n_a", "n_b").agg(
        # NULL when either half is empty (a single-half source has no
        # drift to measure; ANSI mode would throw on the division)
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.sum("term").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_a").cast("double")
                * F.col("n_b").cast("double")
            ),
        ).alias("tv_distance")
    ).select(
        "source",
        F.col("n_a").cast("long").alias("n_toks_even"),
        F.col("n_b").cast("long").alias("n_toks_odd"),
        "tv_distance",
    )


def docs_source_tv_distance(
    spark: SparkSession, sf_dir: str, n_buckets: int = 256
) -> DataFrame:
    """Pairwise distribution drift between sources as TOTAL-VARIATION
    distance over hashed token buckets: TV = ½·Σ_b |p_b − q_b| — the
    drift metric that, unlike KL/JS divergence, needs NO logarithm
    (the docs/ROUND8.md log2 lesson applied at design time) and is a
    true metric bounded in [0, 1]. The report a corpus-mix monitor
    reads to spot a source whose token distribution walked away from
    the rest between snapshots.

    INTEGER-EXACT core: TV·2·n1·n2 = Σ_b |c1_b·n2 − c2_b·n1| — every
    term an exact integer cross-product (summed in DECIMAL(38,0) /
    HUGEINT, the double-mass precedent); the single final division is
    by 2·n1·n2 computed in doubles from identical operands. Nothing
    order-dependent survives to the float domain.

    Scale shape: one map-side-combined (source, bucket) count over the
    token stream, then everything runs on the BOUNDED
    |sources|·n_buckets aggregate — the dense-grid left join, the
    pair join, and the rollup are broadcast-sized by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = source_bucket_counts(docs, n_buckets)
    return tv_from_counts(counts, n_buckets)


def source_bucket_counts(docs: DataFrame, n_buckets: int = 256) -> DataFrame:
    """(source, bucket, c) token counts — the mergeable substrate of
    the TV drift report (counts merge by plain addition, so per-batch
    partials union into the corpus counts: the streaming face
    streaming/curation.tv_drift_stream appends exactly these rows)."""
    toks = docs.select("source", F.explode(_tokens()).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5(F.lower("tok")), 1, 15), 16, 10).cast("long")
        % n_buckets
    ).alias("b")
    return toks.select("source", bucket).groupBy("source", "b").agg(
        F.count("*").alias("c")
    )


def tv_from_counts(counts: DataFrame, n_buckets: int = 256) -> DataFrame:
    """Pairwise TV distances from a (source, b, c) counts frame — the
    shared tail of the batch query and the streaming serve face (the
    stored per-batch partials sum to the same counts, so the two faces
    emit identical rows)."""
    counts = counts.groupBy("source", "b").agg(F.sum("c").alias("c"))
    totals = counts.groupBy("source").agg(F.sum("c").alias("n"))
    grid = totals.select(
        "source",
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("b"),
    )
    dense = grid.join(counts, ["source", "b"], "left").select(
        "source", "n", "b", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    a = dense.select(
        F.col("source").alias("source_a"),
        F.col("n").alias("n_a"),
        F.col("b").alias("ba"),
        F.col("c").alias("ca"),
    )
    bb = dense.select(
        F.col("source").alias("source_b"),
        F.col("n").alias("n_b"),
        F.col("b").alias("bb"),
        F.col("c").alias("cb"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")
    pairs = a.join(
        F.broadcast(bb),
        (F.col("ba") == F.col("bb"))
        & (F.col("source_a") < F.col("source_b")),
    ).select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        F.abs(
            d38(F.col("ca")) * d38(F.col("n_b"))
            - d38(F.col("cb")) * d38(F.col("n_a"))
        ).alias("term"),
    )
    return pairs.groupBy("source_a", "source_b", "n_a", "n_b").agg(
        (
            F.sum("term").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_a").cast("double")
                * F.col("n_b").cast("double")
            )
        ).alias("tv_distance")
    ).select(
        "source_a",
        "source_b",
        F.col("n_a").cast("long").alias("n_toks_a"),
        F.col("n_b").cast("long").alias("n_toks_b"),
        "tv_distance",
    )


def docs_length_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sizing report: for each candidate sequence
    length (64·2^k tokens), how many documents would truncate and what
    share of corpus TOKENS the cutoff discards — the two numbers that
    actually decide max_seq_len for a training run (doc-count survival
    alone hides that the tail docs carry disproportionate tokens).

    Exactness: pure integer token counts; tokens_lost = Σ max(0, n−L)
    per cutoff; the share is one division of exact integers.

    Scale shape: one per-doc token count (map-side), then an explode
    over the 8 candidate cutoffs — aggregate state is 8 rows per task,
    combiner-friendly; no sort, no window.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(_tokens())
    per_doc = docs.select(n.alias("n_toks"))
    cutoffs = [64 * (2 ** k) for k in range(8)]  # 64 .. 8192
    lv = per_doc.select(
        "n_toks",
        F.explode(
            F.array(*[F.lit(c) for c in cutoffs])
        ).alias("cutoff"),
    )
    return (
        lv.groupBy("cutoff")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_toks") > F.col("cutoff")).cast("long")).alias(
                "n_truncated"
            ),
            F.sum(F.greatest(F.lit(0), F.col("n_toks") - F.col("cutoff")))
            .cast("long")
            .alias("tokens_lost"),
            F.sum("n_toks").cast("long").alias("tokens_total"),
        )
        .select(
            F.col("cutoff").cast("int").alias("cutoff"),
            F.col("n_docs").cast("long").alias("n_docs"),
            "n_truncated",
            "tokens_lost",
            (
                F.col("tokens_lost").cast("double")
                / F.col("tokens_total").cast("double")
            ).alias("share_lost"),
        )
    )


def ann_prefix_dim_recall(
    spark: SparkSession, sf_dir: str, topk: int = 10
) -> DataFrame:
    """Matryoshka-style dimension-truncation QA: for the bounded query
    set (vec_id % 50 == 0), recall@10 of the HALF-dimension cosine
    ranking against the full-dimension ranking — the measurement that
    decides whether an index can store d/2 prefixes (2× memory/IO
    saving at 100 TB index scale) without losing neighbors
    (Kusupati et al. 2022, Matryoshka Representation Learning).

    Exactness: both rankings use the fold dot product (fixed
    left-to-right order on both engines), round-4 cosines, and the
    (cos desc, neighbor_id asc) tie-break shared with ann_cosine_topk;
    recall is one division of exact integers. Zero-norm vectors (in
    either arm) are excluded on BOTH faces before ranking so no
    division-by-zero Inf enters an order.

    Scale shape: the ann_cosine_topk posture — tiny query side
    broadcast, one corpus stream computing both cosines in the same
    projection, two bounded per-query top-k windows; the overlap join
    runs on |queries|·k rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vecd = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("h", F.expr("slice(v, 1, size(v) div 2)"))
    with_norms = (
        vecd.withColumn("nrm", F.sqrt(_dot("v", "v")))
        .withColumn("hnrm", F.sqrt(_dot("h", "h")))
        .filter((F.col("nrm") > 0) & (F.col("hnrm") > 0))
    )
    q = with_norms.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("h").alias("qh"),
        F.col("nrm").alias("qn"),
        F.col("hnrm").alias("qhn"),
    )
    joined = with_norms.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _r4(_dot("qv", "v") / (F.col("qn") * F.col("nrm"))).alias("cf"),
        _r4(_dot("qh", "h") / (F.col("qhn") * F.col("hnrm"))).alias("ch"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("cf"), F.asc("neighbor_id")
    )
    wh = Window.partitionBy("query_id").orderBy(
        F.desc("ch"), F.asc("neighbor_id")
    )
    ranked = joined.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wh).alias("rh"),
    )
    full10 = ranked.filter(F.col("rf") <= topk)
    half10 = ranked.filter(F.col("rh") <= topk).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        full10.join(half10, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"))
        .select(
            "query_id",
            F.col("n_overlap").cast("long").alias("n_overlap"),
            (F.col("n_overlap").cast("double") / F.lit(float(topk))).alias(
                "recall_at_10"
            ),
        )
    )


def docs_oov_rate(
    spark: SparkSession, sf_dir: str, vocab_size: int = 1000
) -> DataFrame:
    """Out-of-vocabulary rate per (lang, source) against the corpus's
    own top-``vocab_size`` token vocabulary — the tokenizer-coverage
    audit run before freezing a vocab for training: a segment whose
    OOV share is an outlier either needs vocab budget or is noise
    (the CCNet/Gopher sibling on the LEXICAL axis instead of the
    quality axis).

    Exactness: occurrence counts are exact integers end to end; the
    vocabulary cut is deterministic under (count desc, token asc);
    the rate is one double division.

    Scale shape: two token-explode passes (vocab build, then rate),
    both map-side combined; the vocabulary is a bounded
    TakeOrderedAndProject broadcast, so membership is a broadcast
    join, never a shuffle keyed on tokens.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        "source",
        F.explode(F.transform(_tokens(), lambda t: F.lower(t))).alias(
            "tok"
        ),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "lang",
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            (
                F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("oov_rate"),
        )
    )


def docs_sqrt_temperature_mix(
    spark: SparkSession, sf_dir: str, budget: int = 100_000
) -> DataFrame:
    """Temperature-sampled language-mix allocation at alpha = 0.5: the
    multilingual-pretraining standard (mBERT / XLM-R exponent-smoothed
    sampling) that upweights low-resource languages by sampling
    proportional to n^alpha instead of n. Allocates a fixed token
    budget across languages by sqrt(n_tokens) weights using
    LARGEST-REMAINDER (Hamilton) apportionment, so the allocations are
    integers that sum EXACTLY to the budget — the property a
    downstream shard planner needs.

    Exactness: alpha = 1/2 is deliberate — sqrt is the one IEEE
    transcendental-adjacent op that is correctly rounded everywhere,
    unlike pow/exp/log (banned in this registry); the weight total is
    an ORDER-PINNED fold (sort by lang) so the double sum is
    bit-identical across engines; quotas, floors, and remainder ranks
    then run on identical doubles.

    Scale shape: one token-count aggregate (map-side combined), then
    everything runs on the BOUNDED language frame (|langs| rows):
    a 1-row broadcast total, one bounded window for remainder ranks.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.sum(F.size(_tokens())).alias("n_tokens")
    )
    wl = per.select(
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.sqrt(F.col("n_tokens").cast("double")).alias("w"),
    )
    tot = wl.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("lang", "w"))),
            F.lit(0.0),
            lambda a, x: a + x["w"],
        ).alias("tw")
    )
    q = wl.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        "w",
        (F.lit(float(budget)) * F.col("w") / F.col("tw")).alias("q"),
    )
    based = q.select(
        "lang",
        "n_tokens",
        "w",
        F.floor("q").cast("long").alias("base"),
        (F.col("q") - F.floor("q")).alias("rem"),
    )
    bs = based.agg(F.sum("base").alias("base_sum"))
    wr = Window.orderBy(F.desc("rem"), F.asc("lang"))
    alloc = (
        based.crossJoin(F.broadcast(bs))
        .select(
            "lang",
            "n_tokens",
            "w",
            "base",
            (F.lit(budget) - F.col("base_sum")).alias("leftover"),
            F.row_number().over(wr).alias("rk"),
        )
        .select(
            "lang",
            "n_tokens",
            F.col("w").alias("weight"),
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc_tokens"),
        )
    )
    return alloc.select(
        "lang",
        "n_tokens",
        "weight",
        "alloc_tokens",
        (
            F.col("alloc_tokens").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("sampling_rate"),
    )


def embedding_shard_centroid_drift(
    spark: SparkSession, sf_dir: str, n_shards: int = 4
) -> DataFrame:
    """Per-label centroid drift across shards: cosine similarity of
    each shard's label centroid against the whole-corpus label
    centroid — the cross-shard consistency audit a distributed
    embedding job runs before trusting per-shard ANN indexes or
    per-shard semantic dedup (a shard whose centroid drifts flags a
    bad encoder batch or a skewed partition assignment).

    Exactness: components floor-quantize to integer NANOS and sum as
    DECIMAL(38,0) (the PQ-distortion order-free exact-sum precedent);
    centroid components are then one double division each, and the
    three per-(label, shard) reductions over dims (dot, |a|², |b|²)
    are ORDER-PINNED folds (sort by dim) of plain a + x products —
    bit-identical across engines, never an order-dependent SQL sum.

    Scale shape: the dim explode blows up rows by the (fixed, small)
    dimension count but every sum partial-aggregates map-side onto
    the BOUNDED |labels|·|shards|·dims key space; the fold stage runs
    on |labels|·|shards| rows of dim-length arrays. No all-pairs, no
    unbounded state.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        F.pmod(F.col("vec_id"), F.lit(n_shards)).alias("shard"),
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim", "val"),
    ).select(
        "label",
        "shard",
        "dim",
        F.floor(F.col("val") * F.lit(1e9)).cast("long").alias("nanos"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")
    per_shard = comp.groupBy("label", "shard", "dim").agg(
        F.sum(d38(F.col("nanos"))).alias("s_nanos"),
        F.count("*").alias("n"),
    )
    per_label = per_shard.groupBy("label", "dim").agg(
        F.sum("s_nanos").alias("t_nanos"),
        F.sum("n").alias("tn"),
    )
    joined = per_shard.join(per_label, ["label", "dim"]).select(
        "label",
        "shard",
        "dim",
        "n",
        (
            F.col("s_nanos").cast("double") / F.col("n").cast("double")
        ).alias("cs"),
        (
            F.col("t_nanos").cast("double") / F.col("tn").cast("double")
        ).alias("cl"),
    )
    packed = joined.groupBy("label", "shard").agg(
        F.max("n").cast("long").alias("n_vecs"),
        F.sort_array(
            F.collect_list(F.struct("dim", "cs", "cl"))
        ).alias("pts"),
    )

    def fold(expr):
        return F.aggregate(F.col("pts"), F.lit(0.0), expr)

    scored = packed.select(
        "label",
        "shard",
        "n_vecs",
        fold(lambda a, x: a + x["cs"] * x["cl"]).alias("dot"),
        fold(lambda a, x: a + x["cs"] * x["cs"]).alias("na"),
        fold(lambda a, x: a + x["cl"] * x["cl"]).alias("nb"),
    )
    return scored.select(
        "label",
        F.col("shard").cast("long").alias("shard"),
        "n_vecs",
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            F.col("dot") / (F.sqrt("na") * F.sqrt("nb")),
        ).alias("cos_drift"),
    )


def multimodal_dhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup buckets for binary blobs via dHash
    (difference hash — the standard image near-dup fingerprint,
    e.g. the pHash family): sample a deterministic 8×8 grid of bytes
    at evenly spaced offsets across the blob, take the 7 horizontal
    brightness-gradient bits per row (g[c] < g[c+1]), and fold the 56
    bits into one BIGINT fingerprint. Blobs whose CONTENT differs but
    whose byte-level gradient structure matches land in one bucket —
    the multimodal sibling of doc_fingerprints, robust to payload
    padding/truncation the way exact content_hash dedup is not.

    STUB BOUNDARY (honest, as multimodal_features): with no codec in
    this environment the "pixels" are the raw blob bytes; a real
    deployment decodes + grayscales first and keeps every line below
    the grid sample unchanged. The grid/bit/fold plumbing — the part
    Spark owns — is real and oracle-verified bit-for-bit.

    Exactness: offsets are floor(i·n/64) (exact double division below
    2^53); byte values come from the hex face; the fold is the plain
    acc·2+bit integer scalar fold (the md5-slice fold shape, allowed
    registry-wide); 56 bits fit signed long.

    Scale shape: one scan, per-row bounded (64 substrings) work,
    one groupBy on the fingerprint — map-side combined. The output is
    the top-20 buckets by (n_docs DESC, dhash ASC) — a total order
    since dhash is the group key. Duplicate buckets sort ahead of
    singletons, but with more than 20 duplicate buckets the excess
    dup buckets are dropped too (a plain top-20, not an
    all-dups-plus-filler guarantee), so the driver row is informative
    even on corpora with no perceptual dups
    (VERDICT r10 "What's wrong" #1: the pure ≥2 filter went green on
    an empty-vs-empty compare at sf0.01, certifying nothing about the
    fingerprint fold).
    """
    docs = _docs_parallel(spark, sf_dir)
    from hrfco_data_pipeline_spark.operators.multimodal import to_multimodal

    mm = to_multimodal(docs)
    hexs = F.hex(F.col("content"))
    n = F.col("meta.n_bytes")
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.conv(
            hexs.substr(
                (F.floor(i * n / F.lit(64.0)) * 2 + 1).cast("int"),
                F.lit(2),
            ),
            16,
            10,
        ).cast("int"),
    )
    with_grid = mm.filter(n > 0).select(
        "doc_id", n.alias("n_bytes"), grid.alias("g")
    )
    # 56 bits row-major: rows r=0..7 over cols c=0..6; bit = g[r*8+c]
    # < g[r*8+c+1]; fold acc*2 + bit in that order
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(55)),
        lambda k: F.when(
            F.element_at(
                F.col("g"),
                (F.floor(k / F.lit(7.0)) * 8 + (k % 7) + 1).cast("int"),
            )
            < F.element_at(
                F.col("g"),
                (F.floor(k / F.lit(7.0)) * 8 + (k % 7) + 2).cast("int"),
            ),
            1,
        ).otherwise(0),
    )
    hashed = with_grid.select(
        "doc_id",
        "n_bytes",
        F.aggregate(
            bits,
            F.lit(0).cast("long"),
            lambda acc, b: acc * 2 + b,
        ).alias("dhash"),
    )
    return (
        hashed.groupBy("dhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .select(
            "dhash",
            F.col("n_docs").cast("long").alias("n_docs"),
            (F.col("n_docs") >= 2).alias("is_dup"),
            "keep_doc_id",
            F.col("total_bytes").cast("long").alias("total_bytes"),
        )
        .orderBy(F.desc("n_docs"), F.asc("dhash"))
        .limit(20)
    )


def docs_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution KL divergence against the whole
    corpus, KL(source ‖ corpus) = Σ_t p_t·ln(p_t/q_t) — the standard
    domain-shift weight behind mixture reweighting (the DSIR/DoReMi
    family): a source far from the corpus mean carries more novel
    signal per token and gets up/down-weighted accordingly. The
    per-source sibling of docs_source_tv_distance (TV sees bucketed
    mass, KL sees the full log-ratio geometry).

    Bit-determinism: each token's term is a FIXED-ORDER IEEE chain
    over exact integer counts (p = c_s/N_s, q = C/N, term =
    p·ln(p/q)); the per-source sum folds over the SORTED term list
    (the docs_token_entropy precedent — a plain double SUM over
    shuffled rows is summation-order-dependent), mirrored fold in the
    DuckDB twin, rounded to 4 at the boundary.

    Scale shape: one (source, token) count shuffle (map-side
    combined), corpus token totals by one more re-aggregate joined on
    token hash, per-source totals broadcast. The collected term list
    is bounded by the per-source VOCABULARY (Heaps-sublinear —
    millions, not corpus rows); the fold is one bounded array pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", _tokens().alias("toks"))
    st = (
        toks.select("source", F.explode("toks").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c_s"))
    )
    tot_t = st.groupBy("tok").agg(F.sum("c_s").alias("c_all"))
    tot_s = st.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    n_all = st.agg(F.sum("c_s").alias("n_all"))
    p = F.col("c_s").cast("double") / F.col("n_s").cast("double")
    q = F.col("c_all").cast("double") / F.col("n_all").cast("double")
    terms = (
        st.join(tot_t, "tok")
        .join(F.broadcast(tot_s), "source")
        .crossJoin(F.broadcast(n_all))
        .select(
            "source",
            "n_s",
            (p * F.log(p / q)).alias("term"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.aggregate(
                F.sort_array(F.collect_list("term")),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("kl"),
        )
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("vocab").cast("long").alias("vocab"),
            _r4("kl").alias("kl_nats"),
        )
    )


# ln-odds cutpoints ln(k/(10-k)), k=1..9, as shared DECIMAL LITERALS:
# bucketing the exact fold z against literals keeps the reliability
# diagram exp/ln-free (sigmoid is monotone, so prob-decile edges ARE
# these z edges) — the one libm call engines may round differently
# never executes (the docs_model_quality_score z>=0 lesson).
_LOGIT_CUTS = (
    -2.1972245773362196,
    -1.3862943611198906,
    -0.8472978603872034,
    -0.4054651081081645,
    0.0,
    0.4054651081081645,
    0.8472978603872034,
    1.3862943611198906,
    2.1972245773362196,
)


def docs_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the model-based quality classifier:
    bucket every document by the model's predicted keep-probability
    decile and report the empirical Gopher-rule keep rate per bucket
    — the calibration QA (Guo et al. 2017 style) a pipeline runs
    before trusting a learned filter's scores as sampling weights
    (a well-calibrated bucket p≈0.x should show ≈x·100% rule-keeps).

    Exactness: the probability-decile edges are applied in LOG-ODDS
    space against shared decimal literals (_LOGIT_CUTS) on the
    bit-exact fold z from _model_z — no exp/ln at bucketing time; the
    Gopher label reproduces docs_gopher_quality's keep (including its
    round-4 boundary comparisons); rates are one exact-integer double
    division.

    Scale shape: two doc-keyed aggregates (the model fold and the
    Gopher mode count — both map-side combined, second reuses the
    doc_id partitioning), one broadcast-size 10-row output group.
    """
    docs = load_table(spark, sf_dir, "documents")
    z = _model_z(docs)
    toks = docs.select("doc_id", _tokens().alias("toks"))
    n = F.size("toks")
    mean_wlen = _r4(
        F.aggregate(
            "toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / n
    )
    frac_short = _r4(
        F.size(F.filter("toks", lambda x: F.length(x) <= 2)).cast("double")
        / n
    )
    shape = toks.select(
        "doc_id",
        n.alias("n_toks_g"),
        mean_wlen.alias("mean_wlen"),
        frac_short.alias("frac_short"),
    )
    top = (
        docs.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"))
    )
    label = shape.join(top, "doc_id").select(
        "doc_id",
        (
            (F.col("n_toks_g") >= 30)
            & F.col("mean_wlen").between(2.5, 10.0)
            & (F.col("frac_short") <= 0.3)
            & (
                F.col("top_cnt").cast("double") / F.col("n_toks_g")
                <= 0.2
            )
        ).alias("gopher_keep"),
    )
    cuts = F.array(*[F.lit(c) for c in _LOGIT_CUTS])
    bucket = F.size(F.filter(cuts, lambda c: F.col("z") >= c))
    return (
        z.join(label, "doc_id")
        .select(bucket.alias("prob_decile"), "gopher_keep")
        .groupBy("prob_decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("gopher_keep").cast("long")).alias("n_gopher_keep"),
        )
        .select(
            F.col("prob_decile").cast("int").alias("prob_decile"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_gopher_keep").cast("long").alias("n_gopher_keep"),
            (
                F.col("n_gopher_keep").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("gopher_keep_rate"),
        )
    )


def simhash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint HEALTH audit: per bit position, the share
    of documents with the bit set. A healthy fingerprint has every
    bit near 0.5 (maximum discrimination); a bit stuck near 0/1
    contributes ~0 information, silently inflating the Hamming-ball
    false-negative rate of simhash_clusters' pigeonhole blocking —
    this is the QA a dedup operator checks before trusting a
    fingerprint family at 100 TB. Uses the identical portable 60-bit
    kernel as simhash_probe (operators/dedup.
    simhash_64_from_token_hashes over md5-60bit token hashes), so a
    green row certifies bit extraction over the certified kernel.

    Exactness: pure integer bit arithmetic (shift/mod) and one
    count aggregate; the share is one exact-integer double division.

    Scale shape: fingerprints are one zero-shuffle projection; the
    60-way explode is a bounded fan-out (60× doc count of 3-column
    rows) feeding a 60-group map-side-combined aggregate.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        simhash_64_from_token_hashes,
    )

    docs = _docs_parallel(spark, sf_dir)
    base = F.transform(
        _tokens(),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    sigs = docs.select(
        "doc_id",
        simhash_64_from_token_hashes(base).alias("sh"),
    )
    bits = sigs.select(
        F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit"),
        F.col("sh"),
    ).select(
        "bit",
        # pure-integer extraction: sh can exceed double's 53-bit
        # mantissa, so no float division may touch it (the oracle's
        # (h // (1<<j)) % 2 mirrored via shiftleft + DIV)
        F.expr(
            "(sh div shiftleft(CAST(1 AS BIGINT), bit)) % 2"
        ).alias("set"),
    )
    return (
        bits.groupBy("bit")
        .agg(F.count("*").alias("n_docs"), F.sum("set").alias("n_set"))
        .select(
            F.col("bit").cast("int").alias("bit"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_set").cast("long").alias("n_set"),
            (
                F.col("n_set").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("set_share"),
        )
    )


def ann_centroid_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list occupancy report: per cell, the vector count
    and corpus share, plus the global IMBALANCE FACTOR
    k·Σs²/(Σs)² (≥ 1; 1 = perfectly balanced) — the standard IVF
    health metric: expected probe cost scales with the imbalance
    factor, so a skewed cell map means the nprobe=1 latency story is
    fiction regardless of recall. Audits the exact centroids +
    argmax assignment the ivf_cosine_topk family serves from.

    Exactness: integer counts; share and imbalance are fixed chains
    over exact integers (k·Σs² and (Σs)² computed as longs).

    Scale shape: the E-step is a zero-shuffle projection against
    literal centroids; one 16-group aggregate; the imbalance join is
    a broadcast of a 1-row total.
    """
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        assign_cells,
        ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    cents = ivf_centroids(vecs, n_centroids=16, dim=64)
    cells = assign_cells(vecs, cents).select("vec_id", "cell")
    sizes = cells.groupBy("cell").agg(F.count("*").alias("s"))
    tot = sizes.agg(
        F.sum("s").alias("n_total"),
        F.sum(F.col("s") * F.col("s")).alias("ss"),
        F.count("*").alias("k_cells"),
    )
    return (
        sizes.crossJoin(F.broadcast(tot))
        .select(
            F.col("cell").cast("int").alias("cell"),
            F.col("s").cast("long").alias("n_vecs"),
            (
                F.col("s").cast("double") / F.col("n_total").cast("double")
            ).alias("share"),
            (
                (F.col("k_cells") * F.col("ss")).cast("double")
                / (F.col("n_total") * F.col("n_total")).cast("double")
            ).alias("imbalance_factor"),
        )
    )


def docs_packing_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing waste curve: for each candidate context
    length L, the padding a chunk-and-pad loader wastes (per doc:
    ceil(n/L) chunks, pad = chunks·L − n) — the capacity-planning
    readout behind choosing a training context length
    (docs_pack_sequences ships the packer itself; this prices the
    alternatives before committing a 100 TB tokenization run).

    Exactness: pure integer arithmetic per doc (token counts from
    the whitespace tokenizer), exact long sums, one double division
    per output row.

    Scale shape: ONE corpus scan computes all lengths (the L axis is
    a 4-element literal explode over per-doc counts, not 4 scans);
    the aggregate is 4 groups, map-side combined.
    """
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(F.size(_tokens()).alias("n")).filter(F.col("n") > 0)
    grid = lens.select(
        "n",
        F.explode(
            F.array(*[F.lit(x) for x in (256, 512, 1024, 2048)])
        ).alias("seq_len"),
    )
    chunks = F.ceil(F.col("n") / F.col("seq_len").cast("double")).cast(
        "long"
    )
    return (
        grid.select(
            "seq_len",
            "n",
            chunks.alias("chunks"),
            (chunks * F.col("seq_len") - F.col("n")).alias("pad"),
        )
        .groupBy("seq_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.sum("chunks").alias("total_chunks"),
            F.sum("pad").alias("total_pad"),
        )
        .select(
            F.col("seq_len").cast("int").alias("seq_len"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.col("total_chunks").cast("long").alias("total_chunks"),
            F.col("total_pad").cast("long").alias("total_pad"),
            (
                F.col("total_pad").cast("double")
                / (F.col("total_tokens") + F.col("total_pad")).cast(
                    "double"
                )
            ).alias("pad_share"),
        )
    )


def embedding_pca_explained_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explained-variance ratio of the dominant principal direction —
    the one-number answer to "is this embedding space effectively
    low-rank?" that gates whitening / dimensionality-reduction
    decisions before ANN indexing (the QA face of
    embedding_pca_power_iteration, which emits the direction itself;
    the Matryoshka recall probe answers the same question empirically,
    this answers it spectrally): ratio = (vᵀMv / vᵀv) / trace(M)
    over the uncentered second-moment matrix M = Σ x·xᵀ.

    Exactness: v comes from the SAME three integer-exact power
    iterations as the PCA query (floor-quantized DECIMAL sums,
    L∞ renormalization on exact integer operands — bounded 64-long
    collects, the Lloyd-iteration pattern); the Rayleigh numerator
    Σ⟨x,v⟩² and trace Σ‖x‖² accumulate as floor-quantized integer
    nanos in DECIMAL(38,0); vᵀv is a left fold from 0.0 over the
    identical v doubles on both faces. One final division chain.

    Scale shape: four full scans total (three iteration aggregates +
    the variance aggregate), each a map-side-combined 1-row result;
    driver state is 64 doubles per iteration.
    """
    from hrfco_data_pipeline_spark.operators.similarity import as_double_vec

    dim = 64
    q = 1000000000.0
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))

    def dot_with(v_lits: list[float]) -> Column:
        expr: Column = F.lit(0.0)
        for j in range(dim):
            expr = expr + F.element_at("v", j + 1) * F.lit(v_lits[j])
        return expr

    def w_aggs(dot: Column) -> list[Column]:
        return [
            F.sum(
                F.floor(
                    F.element_at("v", j + 1) * dot * F.lit(q)
                ).cast("decimal(38,0)")
            ).alias(f"s{j}")
            for j in range(dim)
        ]

    v = [1.0] * dim
    for _ in range(3):
        row = vecs.agg(*w_aggs(dot_with(v))).collect()[0]
        w = [int(row[f"s{j}"]) for j in range(dim)]
        wmax = max(abs(x) for x in w)
        v = [float(x) / float(wmax) for x in w]

    vtv = 0.0
    for x in v:
        vtv = vtv + x * x
    dominant = max(range(dim), key=lambda j: (abs(v[j]), -j))

    d = dot_with(v)
    norm2: Column = F.lit(0.0)
    for j in range(dim):
        norm2 = norm2 + F.element_at("v", j + 1) * F.element_at("v", j + 1)
    agg = vecs.agg(
        F.count("*").alias("n_vecs"),
        F.sum(F.floor(d * d * F.lit(q)).cast("decimal(38,0)")).alias("num"),
        F.sum(F.floor(norm2 * F.lit(q)).cast("decimal(38,0)")).alias("tr"),
    )
    return agg.select(
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.lit(dominant).cast("int").alias("dominant_dim"),
        (
            F.col("num").cast("double")
            / (F.lit(vtv) * F.col("tr").cast("double"))
        ).alias("ev_ratio"),
    )


def docs_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of corpus token
    OCCURRENCES covered by the top-k most frequent types, at k =
    100 / 1 000 / 10 000 — the vocab-size pricing readout a tokenizer
    design starts from (the Zipf/Heaps fits already shipped model the
    curve; this measures the three decision points exactly), and the
    packing_waste sibling on the vocabulary axis.

    Exactness: type frequencies are exact integers; the rank is the
    total order (freq desc, token asc); the coverage at rank k is an
    exact cumulative integer over that order; one double division per
    output row. When the corpus vocabulary is smaller than k the cut
    clamps to the vocabulary (k_effective), same clamp on both faces.

    Scale shape: one (token) count aggregate (map-side combined),
    then the rank + cumulative run through the DESCENDING
    range-bucketed two-pass (negated bucket key — never a global
    sort over the vocabulary, which grows with the corpus); the
    3-row cut frame joins broadcast.
    """
    from hrfco_data_pipeline_spark.operators.ranking import ranked_cumsum

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    totals = tf.agg(
        F.count("*").alias("vocab"), F.sum("freq").alias("total_toks")
    )
    ranked = ranked_cumsum(
        tf,
        -F.col("freq").cast("double"),
        [F.desc("freq"), F.asc("tok")],
        sample_key=F.xxhash64("tok"),
        sums={"cum_freq": F.col("freq")},
        rank_name="rnk",
    )
    ks = (
        totals.select(
            "vocab",
            "total_toks",
            F.explode(
                F.array(*[F.lit(k) for k in (100, 1000, 10000)])
            ).alias("k_requested"),
        )
        .select(
            "vocab",
            "total_toks",
            "k_requested",
            F.least(F.col("k_requested").cast("long"), F.col("vocab")).alias(
                "kk"
            ),
        )
    )
    return (
        ranked.join(F.broadcast(ks), F.col("rnk") == F.col("kk"))
        .select(
            F.col("k_requested").cast("int").alias("k_requested"),
            F.col("kk").cast("long").alias("k_effective"),
            F.col("vocab").cast("long").alias("vocab"),
            F.col("cum_freq").cast("long").alias("covered_tokens"),
            F.col("total_toks").cast("long").alias("total_tokens"),
            (
                F.col("cum_freq").cast("double")
                / F.col("total_toks").cast("double")
            ).alias("coverage"),
        )
    )


# --------------------------------------------------------------------------
# r12 additions
# --------------------------------------------------------------------------

def docs_crosssnap_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot NEAR-dup audit: every document the snapshot diff
    (docs_snapshot_diff) classifies as 'added' or 'changed' is probed
    by winnowing-fingerprint containment against the PREVIOUS
    snapshot's content — the re-crawl inflation check an exact-hash
    diff cannot do (a re-crawled page with one edited sentence is
    'added' by key/hash but near-identical in content, and silently
    re-inflates the corpus between training-set versions).

    Semantics: snapshots derive exactly as in docs_snapshot_diff
    (doc_id%97 missing from prev = added; %89 carries a stale-revision
    suffix in prev = changed); fingerprints are the certified MOSS
    winnowing selection (4-gram md5, window 5 — any shared run of
    ≥ 8 tokens yields a shared fingerprint); containment =
    |fps(probe) ∩ fps(prev doc)| / |fps(probe)|. A 'changed' doc
    matching its own prev revision near 1.0 is the expected re-crawl
    signal (is_self_recrawl); an 'added' doc scoring high against a
    DIFFERENT prev doc is the inflation finding.

    Output: deterministic top-20 pairs by (containment DESC, probe,
    prev) — never a bare threshold filter (the r10 dhash lesson), and
    the 'changed' self-matches guarantee a non-vacuous driver row on
    any corpus.

    Scale shape: the probe side is the diff's added/changed slice
    (~2% here; release-diff-sized in production) — fingerprints via
    the two-stage winnowing with the materialization barrier
    (doc_winnow_fingerprints precedent); one (probe, prev) aggregate;
    top-20 is TakeOrderedAndProject. Hot (boilerplate) fingerprints
    are CAPPED at df > 50 over the prev corpus and excluded from BOTH
    join sides (the docs_containment_pairs precedent, mirrored in the
    oracle): without the cap the fp equi-join fans out as Σ df_probe ×
    df_prev per fingerprint — measured 178 s at sf0.1 on this
    corpus's small synthetic vocabulary vs ~2 s capped, and unbounded
    at 100 TB. Containment therefore counts RARE shared fingerprints
    over the full probe set size — a documented underestimate on
    boilerplate-heavy pairs, identical on both faces.
    """
    docs = _docs_parallel(spark, sf_dir)
    is_added = F.col("doc_id") % 97 == 0
    probe = docs.filter(is_added | (F.col("doc_id") % 89 == 0)).select(
        "doc_id",
        F.when(is_added, F.lit("added")).otherwise(F.lit("changed")).alias(
            "status"
        ),
        _tokens().alias("toks"),
    )
    probe_h = probe.select(
        "doc_id", "status", gram_hashes_expr(F.col("toks")).alias("h")
    ).repartition(spark.sparkContext.defaultParallelism)
    # NB: size(fps) and explode(fps) in ONE projection trips a
    # pathological plan: the Generate + the duplicated window-min
    # expression ran 162 s for 108 probe docs at sf0.1 where either
    # alone runs in ~2 s. fps is DISTINCT by construction, so n_fps is
    # recovered exactly as the per-probe row count after the explode —
    # one tiny aggregate + broadcast join instead of the fused size().
    probe_ex = probe_h.select(
        F.col("doc_id").alias("probe_id"),
        "status",
        F.explode(window_min_fps_expr(F.col("h"))).alias("fp"),
    )
    n_fps_tbl = probe_ex.groupBy("probe_id").agg(
        F.count("*").cast("int").alias("n_fps")
    )
    prev = docs.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 89 == 0,
            F.concat(F.col("text"), F.lit(" [rev1]")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    prev_h = prev.select(
        "doc_id", gram_hashes_expr(_tokens()).alias("h")
    ).repartition(spark.sparkContext.defaultParallelism)
    prev_ex = prev_h.select(
        F.col("doc_id").alias("prev_id"),
        F.explode(window_min_fps_expr(F.col("h"))).alias("fp"),
    )
    hot = (
        prev_ex.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > 50)
        .select("fp")
    )
    prev_ex = prev_ex.join(F.broadcast(hot), "fp", "left_anti")
    probe_ex = probe_ex.join(F.broadcast(hot), "fp", "left_anti")
    pairs = (
        probe_ex.join(prev_ex, "fp")
        .groupBy("probe_id", "status", "prev_id")
        .agg(F.count("*").alias("n_shared"))
        .join(F.broadcast(n_fps_tbl), "probe_id")
    )
    cont = _r4(F.col("n_shared").cast("double") / F.col("n_fps").cast("double"))
    return (
        pairs.select(
            "probe_id",
            "status",
            "prev_id",
            (F.col("probe_id") == F.col("prev_id")).alias("is_self_recrawl"),
            "n_fps",
            "n_shared",
            cont.alias("containment"),
        )
        .orderBy(
            F.desc("containment"), F.asc("probe_id"), F.asc("prev_id")
        )
        .limit(20)
    )


def docs_contamination_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source × shard contamination heatmap: the Bloom-filter
    decontamination pass (docs_bloom_decontaminate — same filter,
    m=2^16 / k=3) re-cut as a QA surface showing WHERE eval-set
    overlap concentrates in the training corpus (a contaminated
    source/shard is usually one bad upstream dump, and the heatmap is
    how it gets found and quarantined rather than row-filtered).

    Every TRAIN (source, shard) cell is emitted with its doc count
    (left join from the corpus side), so the driver row is informative
    even on a contamination-free corpus — counts of zero are the
    finding. Shard = doc_id % 7 stands in for the physical shard id a
    real layout carries (7 is coprime with the synthetic source cycle,
    so every source spans every shard — % 4 aliased 1:1 with source on
    this testdata and degenerated the grid to one cell per source).

    Scale shape: inherits the decontamination plan (bounded Bloom
    broadcast, zero-shuffle probe chain); the heatmap adds one
    broadcast left join (flagged docs ≪ corpus) and one
    map-side-combined groupBy on (source, shard).
    """
    flagged = docs_bloom_decontaminate(spark, sf_dir)
    cells = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "source", (F.col("doc_id") % 7).alias("shard"))
    )
    j = cells.join(F.broadcast(flagged), "doc_id", "left")
    return j.groupBy("source", "shard").agg(
        F.count("*").alias("n_docs"),
        F.count("bloom_hits").alias("n_bloom_flagged"),
        F.sum(F.when(F.col("exact_hits") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_contaminated"),
        F.sum(
            F.when(
                F.col("bloom_hits").isNotNull() & (F.col("exact_hits") == 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
        F.round(
            F.count("bloom_hits").cast("double") / F.count("*").cast("double"),
            4,
        ).alias("flagged_pct"),
    )


def embedding_label_noise_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screen by kNN label agreement (the Confident
    Learning / deep-kNN heuristic): for a deterministic probe set
    (vec_id % 29 == 0), find each probe's 5 nearest neighbors by
    cosine and score the fraction that share the probe's label — a
    label whose probes systematically disagree with their neighborhood
    is a mislabeled or ill-defined class, the QA a labeled
    training-set pipeline runs before trusting its labels.

    Exactness: cosines rounded to 4 before ranking (the
    ann_cosine_topk convention — rounded bits match DuckDB, ties break
    on neighbor id); agreement counts are integers, so the per-label
    mean is one exact final division.

    Scale shape: the probe side broadcasts against one corpus scan
    (the brute-force-topk pattern — bounded query set, never
    corpus×corpus); per-probe top-5 is a window over the join output;
    the label rollup is a tiny aggregate. At unbounded probe counts
    the candidate join swaps to the IVF/LSH route unchanged.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vecd = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", F.sqrt(_dot("v", "v")))
    q = vecd.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    joined = vecd.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    cos = _r4(_dot("qv", "v") / (F.col("qn") * F.col("nrm")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    knn = (
        joined.select(
            "qid", "qlabel", "vec_id", F.col("label").alias("nlabel"), cos.alias("cos_sim")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    per_probe = knn.groupBy("qid", "qlabel").agg(
        F.sum((F.col("nlabel") == F.col("qlabel")).cast("long")).alias("n_agree")
    )
    return per_probe.groupBy(F.col("qlabel").alias("label")).agg(
        F.count("*").alias("n_probes"),
        F.sum("n_agree").alias("n_agree_total"),
        F.round(
            F.sum("n_agree").cast("double")
            / (F.count("*") * F.lit(5)).cast("double"),
            4,
        ).alias("mean_agreement"),
        F.sum((F.col("n_agree") <= 1).cast("long")).alias("n_suspect"),
    )


def embedding_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram over a deterministic probe sample
    (vec_id % 53 == 0, all probe pairs) — the embedding-space isotropy
    / collapse diagnostic: a healthy space piles mass near 0, a
    collapsed or anisotropic one (Ethayarajh '19) shifts the whole
    distribution toward +1, and SemDeDup-style near-dup mass shows as
    a spike in the top bins. Run before trusting any cosine-threshold
    dedup or ANN recall number.

    Exactness: cosines rounded to 4 (portable bits), binned on a fixed
    20-bucket grid over [-1, 1] by pure float-compare (bin edges are
    exact tenths; the clamp puts cos == 1.0 in bin 19).

    Scale shape: probe pairs are (corpus/53 choose 2) — a bounded
    quadratic documented as such; the pair join broadcasts the probe
    table against itself and the histogram is one tiny groupBy. Scale
    the modulus with corpus size to hold the pair budget.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    probes = (
        emb.filter(F.col("vec_id") % 53 == 0)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("nrm", F.sqrt(_dot("v", "v")))
    )
    a = probes.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = probes.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    cos = _r4(_dot("va", "vb") / (F.col("na") * F.col("nb")))
    binned = pairs.select(
        F.least(
            F.floor((cos + F.lit(1.0)) * F.lit(10.0)).cast("int"), F.lit(19)
        ).alias("bin")
    )
    return binned.groupBy("bin").agg(F.count("*").alias("n_pairs")).select(
        "bin",
        (F.col("bin").cast("double") / 10.0 - 1.0).alias("lo"),
        ((F.col("bin").cast("double") + 1.0) / 10.0 - 1.0).alias("hi"),
        "n_pairs",
    )


def docs_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksums per (source, shard) — the
    anti-entropy / replica-repair primitive: two copies of a corpus
    partition agree iff their checksum rows agree, with no row
    ordering or single-machine hashing anywhere (the Cassandra/Dynamo
    Merkle-leaf idea, flattened to one level).

    Exactness: per-row 60-bit hash from an md5 slice of
    "doc_id:text" (id-qualified so a swapped pair of texts changes the
    sum); the sum is EXACT in DECIMAL(38,0) — commutative and
    associative, so any partitioning/merge order yields identical
    checksums — folded to 60 bits at the end. A plain XOR would also
    work but cancels duplicate rows pairwise; the sum counts them.

    Scale shape: one scan, one map-side-combined groupBy on
    (source, shard); output is metadata-sized (|sources| × |shards|).
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("text"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return (
        docs.select(
            "source",
            (F.col("doc_id") % 7).alias("shard"),
            h.alias("h"),
            F.col("n_chars"),
        )
        .groupBy("source", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.pmod(F.sum("h"), F.lit(2**60).cast("decimal(38,0)"))
            .cast("long")
            .alias("checksum"),
        )
    )


def docs_length_quantiles_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact per-source token-length deciles (p10/p50/p90) — the
    per-slice length profile a curation pipeline publishes next to its
    global one (a source whose median collapses between crawls is a
    truncation bug upstream; approx_percentile cannot certify that,
    exact order statistics can).

    Exactness: cut ranks k = (n·i − 1) div 10 + 1 (pure-integer, the
    events_psi_by_type convention) under the per-source total order
    (n_tokens, doc_id); emitted quantiles are exact longs.

    Scale shape: the per-source rank runs through the PARTITIONED
    range-bucketed two-pass (ranked_cumsum partition_cols — local
    windows per (source, bucket), offset join of |sources|×buckets
    rows, never a per-source single-task sort); counts broadcast back;
    the final pivot is a tiny per-source aggregate.
    """
    from hrfco_data_pipeline_spark.operators.ranking import ranked_cumsum

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    ranked = ranked_cumsum(
        base,
        F.col("n_tokens").cast("double"),
        [F.asc("n_tokens"), F.asc("doc_id")],
        sample_key=F.col("doc_id"),
        rank_name="rnk",
        partition_cols=["source"],
    )
    counts = base.groupBy("source").agg(F.count("*").alias("n"))
    j = ranked.join(F.broadcast(counts), "source")
    cut = lambda i: F.expr(f"(n * {i} - 1) div 10 + 1")
    picked = j.filter(
        (F.col("rnk") == cut(1)) | (F.col("rnk") == cut(5)) | (F.col("rnk") == cut(9))
    )
    return picked.groupBy("source", "n").agg(
        F.min(F.when(F.col("rnk") == cut(1), F.col("n_tokens"))).alias("p10"),
        F.min(F.when(F.col("rnk") == cut(5), F.col("n_tokens"))).alias("p50"),
        F.min(F.when(F.col("rnk") == cut(9), F.col("n_tokens"))).alias("p90"),
    ).select(
        "source", F.col("n").alias("n_docs"), "p10", "p50", "p90"
    )


def multimodal_bytes_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Byte-level collision concentration per blob, rolled up per
    source — the codec-free multimodal QA that IS honest in this
    environment, migrated in r15 from the log2-emitting
    ``multimodal_bytes_entropy`` (SCALE.md watch list; the Rényi-2/
    collision family carries the same two failure signals over exact
    integers — the patch-profile precedent, VERDICT r14 'Next round'
    #4). collision = Σc²/n² — the probability two random payload
    bytes coincide: truncated/zero-padded payloads spike it (the
    entropy-collapse face); well-compressed or encrypted payloads sit
    near the uniform floor 1/256. A blob is flagged low-information
    when 16·Σc² > n² (collision above the 16-symbol-uniform line —
    the exact-INTEGER twin of the old 'entropy < 4 bits' gate, and
    strict > keeps an exactly-16-symbol-uniform blob unflagged just
    as strict < 4.0 did).

    Exactness: byte values via the hex face (the dhash idiom); Σc² and
    the flag are pure integer arithmetic; the per-blob collision is
    floor-quantized to integer nanos BY INTEGER FLOOR DIVISION
    (Σc²·10⁹ // n² — n ≤ blob bytes keeps every product far under
    2^63) and summed exactly; only the final mean divides. No
    transcendental, no double fold, anywhere.

    Scale shape: one explode to (blob, byte) rows — 1 row per payload
    byte, the same linear pass a decoder would make — then two
    map-side-combined groupBys ((doc, byte) then doc) and a
    metadata-sized source rollup; cheaper than the entropy form it
    replaces (plain SUM of c·c, no sorted-list collect).
    """
    from hrfco_data_pipeline_spark.operators.multimodal import to_multimodal

    mm = to_multimodal(_docs_parallel(spark, sf_dir)).filter(
        F.col("meta.n_bytes") > 0
    )
    hexs = F.hex(F.col("content"))
    n = F.col("meta.n_bytes")
    byte_arr = F.transform(
        F.sequence(F.lit(1), n.cast("int")),
        lambda i: F.conv(hexs.substr((i * 2 - 1).cast("int"), F.lit(2)), 16, 10).cast(
            "int"
        ),
    )
    ex = mm.select(
        "doc_id",
        F.col("meta.source").alias("source"),
        n.alias("n"),
        F.explode(byte_arr).alias("byte"),
    )
    counts = ex.groupBy("doc_id", "source", "n", "byte").agg(
        F.count("*").alias("c")
    )
    per_doc = counts.groupBy("doc_id", "source", "n").agg(
        F.sum(F.col("c").cast("long") * F.col("c")).alias("sum_c2")
    )
    n2 = F.col("n").cast("long") * F.col("n")
    q = per_doc.withColumn("n2", n2).select(
        "source",
        # exact integer floor division (SQL `div`), never a double
        F.expr(
            "(sum_c2 * CAST(1000000000 AS BIGINT)) div n2"
        ).alias("qc"),
        (F.col("sum_c2") * 16 > F.col("n2")).cast("long").alias("low_info"),
    )
    return q.groupBy("source").agg(
        F.count("*").alias("n_blobs"),
        F.round(
            F.sum("qc").cast("double") / F.lit(1e9) / F.count("*").cast("double"),
            4,
        ).alias("avg_collision"),
        F.sum("low_info").alias("n_low_info"),
    )


def docs_quality_dup_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate × prefix-dup contingency table: do duplicate-ish
    documents skew low-quality? — the measurement behind the
    'dedup before or after the quality filter' pipeline-ordering
    decision (if dups concentrate in the reject class, filtering
    first shrinks the dedup join; if not, dedup first preserves
    quality-score counterfactuals).

    Dup here is the cheap boilerplate screen: sharing the 8-token
    prefix fingerprint (doc_fingerprints' prefix_fp) with ≥1 other doc
    — the precursor tier of the near-dup ladder, and non-degenerate on
    corpora where full-text exact dup is rare. Quality is the
    certified quality_score_expr gate at 0.7.

    Scale shape: one groupBy on the 16-byte fingerprint for group
    sizes, one shuffle join back on the fingerprint, a 4-cell
    aggregate, and a broadcast scalar total for the shares.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    base = docs.select(
        "doc_id",
        (quality_score_expr(toks) >= 0.7).alias("quality_keep"),
        F.md5(F.concat_ws(" ", F.slice(toks, 1, 8))).alias("fp"),
    )
    fpc = base.groupBy("fp").agg(F.count("*").alias("n_fp"))
    j = base.join(fpc, "fp").select(
        "quality_keep", (F.col("n_fp") > 1).alias("is_prefix_dup")
    )
    tot = docs.agg(F.count("*").alias("total"))
    return (
        j.groupBy("quality_keep", "is_prefix_dup")
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "quality_keep",
            "is_prefix_dup",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("total").cast("double"), 4
            ).alias("pct_of_corpus"),
        )
    )


def docs_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold pricing curve: corpus survivors under the
    keep-first-occurrence rule at Jaccard thresholds 0.2–0.8 — the
    measurement behind choosing the near-dup threshold (every corpus
    paper picks 0.8 by convention; this shows what each step actually
    costs on YOUR corpus, from one pass over the certified pair
    table).

    Semantics: at threshold t a doc is dropped iff it has at least one
    MORE-SENIOR near-neighbor (a pair (a, b) with a < b and
    jaccard ≥ t drops b) — the pairwise-shadow rule, a documented
    lower bound on transitive-closure dedup (chains can only drop
    more). Thresholds are integer percent points; the comparison is
    jaccard ≥ t/100 on the exact rational jaccard bits.

    Scale shape: reuses docs_ngram_jaccard_pairs (banded/hot-capped
    candidate machinery, never all-pairs) ONCE; the 7-threshold sweep
    is a 7× explode of the tiny pair table, one distinct-doc_b count
    per threshold, and a broadcast scalar total — every threshold row
    always present (left join from the threshold grid).
    """
    pairs = docs_ngram_jaccard_pairs(spark, sf_dir)
    ths = F.array(*[F.lit(t) for t in (20, 30, 40, 50, 60, 70, 80)])
    dropped = (
        pairs.select("doc_b", "jaccard", F.explode(ths).alias("t_pct"))
        .filter(
            F.col("jaccard") >= F.col("t_pct").cast("double") / F.lit(100.0)
        )
        .groupBy("t_pct")
        .agg(F.countDistinct("doc_b").alias("n_dropped"))
    )
    tot = load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("total")
    )
    grid = tot.select("total", F.explode(ths).alias("t_pct"))
    return (
        grid.join(F.broadcast(dropped), "t_pct", "left")
        .select(
            "t_pct",
            F.coalesce("n_dropped", F.lit(0).cast("long")).alias("n_dropped"),
            (F.col("total") - F.coalesce("n_dropped", F.lit(0))).alias(
                "n_survivors"
            ),
            F.round(
                (F.col("total") - F.coalesce("n_dropped", F.lit(0))).cast(
                    "double"
                )
                / F.col("total").cast("double"),
                4,
            ).alias("survival_pct"),
        )
    )


def embedding_label_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per label (centroid form: a = distance to
    own label centroid, b = nearest other centroid, s = (b−a)/max(a,b))
    — the cluster-quality QA that says whether the LABELS define tight,
    separated regions of embedding space at all; a label with negative
    mean silhouette overlaps another class wholesale (systematic
    mislabeling or an ill-split taxonomy), the centroid-level
    complement of the per-point kNN screen
    (embedding_label_noise_screen).

    Exactness: centroid components are exact DECIMAL sums of
    nano-quantized coordinates divided once (deterministic at any
    partitioning — the double mean of raw doubles would be
    summation-order-dependent); distances fold over dims in index
    order (the dot-product convention, mirrored as an explicit
    list_reduce in the DuckDB twin); a/b are mins (order-free);
    the cross-label mean quantizes s to integer nanos and sums
    EXACTLY (the train_linear_gate convention).

    Scale shape: one dim-explode + (label, dim) aggregate builds the
    k×dim centroid table (bounded — the k-means collect bound); the
    10-row centroid table broadcasts against one corpus scan
    (|vectors| × k rows, k constant); everything after is a per-vector
    aggregate and a k-row rollup. No quadratic anywhere.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    dims = vecs.select(
        "label", F.posexplode("v").alias("j", "x")
    )
    cent_cols = dims.groupBy("label", "j").agg(
        F.sum(F.floor(F.col("x") * F.lit(1e9)).cast("decimal(38,0)")).alias("sq"),
        F.count("*").alias("n"),
    )
    centroids = (
        cent_cols.select(
            "label",
            "j",
            (
                F.col("sq").cast("double")
                / (F.col("n").cast("double") * F.lit(1e9))
            ).alias("c"),
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
        .select(F.col("label").alias("clabel"), "cv")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("v", "cv", lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    )
    scored = vecs.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "label",
        (F.col("label") == F.col("clabel")).alias("own"),
        dist.alias("d"),
    )
    ab = scored.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("own"), F.col("d"))).alias("a"),
        F.min(F.when(~F.col("own"), F.col("d"))).alias("b"),
    )
    s = F.when(
        F.greatest("a", "b") > 0,
        (F.col("b") - F.col("a")) / F.greatest("a", "b"),
    ).otherwise(F.lit(0.0))
    per_vec = ab.select(
        "label",
        F.floor(s * F.lit(1e9)).cast("long").alias("qs"),
        (s < 0).cast("long").alias("neg"),
    )
    return per_vec.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(
            F.sum("qs").cast("double") / F.lit(1e9) / F.count("*").cast("double"),
            4,
        ).alias("mean_silhouette"),
        F.sum("neg").alias("n_negative"),
    )


def docs_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source × source vocabulary Jaccard matrix — the set-overlap
    complement of the distributional drift family (docs_source_tv_distance
    measures token-FREQUENCY divergence; docs_source_kl_divergence the
    mixture weights; this one asks how much of each source's *distinct*
    vocabulary is shared). A pair whose Jaccard collapses between
    crawls signals a domain shift the frequency views smooth over; a
    pair near 1.0 marks redundant sources a mixture rebalance should
    treat as one.

    Determinism: every unordered source pair (source_a < source_b) is
    always present — the pair grid is built from the per-source vocab
    sizes and shared counts are left-joined onto it (zero-overlap
    pairs emit n_shared = 0, never a missing row — the
    contamination-heatmap every-cell-present convention). jaccard =
    n_shared / (|A| + |B| − n_shared) — ONE double division of
    exact integers, emitted RAW (the l_diversity convention: round(x, k)
    on a computed double is the known engine-split trap).

    Scale shape: one map-side-combined distinct on (source, token),
    then a groupBy(token) collect_set over a ≤|sources| set — the
    per-token source-set explode emits ≤ C(|sources|, 2) pair rows per
    token (4 sources → ≤6), never a token self-join whose fan-out is
    quadratic in per-token source multiplicity; vocab sizes and the
    pair grid are metadata-sized broadcasts. The documents scan routes
    through _docs_parallel like the sibling llm kernels so the
    tokenize+distinct stage parallelizes on single-split testdata
    layouts too (ADVICE r12).
    """
    docs = _docs_parallel(spark, sf_dir)
    toks = docs.select(
        "source", F.explode(_tokens()).alias("token")
    ).distinct()
    sizes = toks.groupBy("source").agg(F.count("*").alias("vocab"))
    tok_sources = toks.groupBy("token").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    shared = (
        tok_sources.select(
            F.explode("ss").alias("source_a"), F.col("ss")
        )
        .select(
            "source_a", F.explode("ss").alias("source_b")
        )
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    grid = (
        sizes.select(
            F.col("source").alias("source_a"), F.col("vocab").alias("vocab_a")
        )
        .crossJoin(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"),
                    F.col("vocab").alias("vocab_b"),
                )
            )
        )
        .filter(F.col("source_a") < F.col("source_b"))
    )
    out = grid.join(F.broadcast(shared), ["source_a", "source_b"], "left")
    ns = F.coalesce(F.col("n_shared"), F.lit(0)).cast("long")
    return out.select(
        "source_a",
        "source_b",
        F.col("vocab_a").cast("long").alias("vocab_a"),
        F.col("vocab_b").cast("long").alias("vocab_b"),
        ns.alias("n_shared"),
        (
            ns.cast("double")
            / (F.col("vocab_a") + F.col("vocab_b") - ns).cast("double")
        ).alias("jaccard"),
    )


# --------------------------------------------------------------------------
# r13: dedup certificates & survivor audits
# --------------------------------------------------------------------------

def dedup_survivor_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does keep-first exact dedup bias the surviving corpus? Per
    source: token-length stats of KEPT vs DROPPED rows under the
    keep-lowest-id policy (dedup_docs_kept's rule) — the standard
    post-dedup QA: a keep policy correlated with length (or source)
    silently reshapes the training mixture, and this is the
    measurement that would catch it before a 100 TB tokenization run.

    Exactness: token counts are integers, sums are exact longs; the
    two means are ONE double division each of exact integers (raw,
    unrounded — the l_diversity emission convention); sources with no
    dropped rows emit NULL means, never a 0/0.

    Scale shape: one scan computes hash + token count; the keep
    decision is a row_number window over the 16-byte hash key (group
    size = duplicate multiplicity — bounded by the corpus's dup depth,
    not its size); the rollup is a |sources|-group map-side-combined
    aggregate. No joins, no collects.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.trim("text"))).alias("th"),
        F.size(_tokens()).alias("n_toks"),
    )
    w = Window.partitionBy("th").orderBy(F.asc("doc_id"))
    flagged = h.withColumn("kept", F.row_number().over(w) == 1)
    kept_n = F.sum(F.when(F.col("kept"), 1).otherwise(0))
    kept_toks = F.sum(F.when(F.col("kept"), F.col("n_toks")).otherwise(0))
    drop_n = F.sum(F.when(F.col("kept"), 0).otherwise(1))
    drop_toks = F.sum(F.when(F.col("kept"), 0).otherwise(F.col("n_toks")))
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        kept_n.cast("long").alias("n_kept"),
        drop_n.cast("long").alias("n_dropped"),
        kept_toks.cast("long").alias("toks_kept"),
        drop_toks.cast("long").alias("toks_dropped"),
        # n_kept = 0 per source IS reachable (the keep policy is
        # GLOBAL: a source whose every text also appears under a lower
        # doc_id elsewhere keeps nothing) — guard both means, not just
        # the dropped one (ANSI division throws; r13 self-review)
        F.when(
            kept_n > 0, kept_toks.cast("double") / kept_n.cast("double")
        ).alias("mean_toks_kept"),
        F.when(
            drop_n > 0, drop_toks.cast("double") / drop_n.cast("double")
        ).alias("mean_toks_dropped"),
    )


def docs_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source × source DOCUMENT-level duplication matrix: for every
    unordered source pair, how many distinct content hashes appear in
    both — the doc-granularity complement of
    docs_source_vocab_overlap (token sets) and the per-source
    docs_dup_rate_by_source (which cannot see CROSS-source template
    reuse: two mirrors crawling the same upstream show up here as a
    hot cell long before vocabulary drift notices).

    Determinism: every pair (source_a < source_b) always present —
    shared counts left-join onto the vocab-overlap pair grid, zero
    overlaps emit n_shared = 0; jaccard = n_shared /
    (|A| + |B| − n_shared), one double division of exact integers,
    emitted raw.

    Scale shape: the docs_source_vocab_overlap plan verbatim with the
    16-byte content hash as the set element instead of the token: one
    map-side-combined distinct on (source, th), a groupBy(th)
    collect_set over a ≤|sources| set, per-hash pair explode
    ≤ C(|sources|, 2) rows — never a hash self-join; grids broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    ths = docs.select(
        "source", F.md5(F.lower(F.trim("text"))).alias("th")
    ).distinct()
    sizes = ths.groupBy("source").agg(F.count("*").alias("n_hashes"))
    th_sources = ths.groupBy("th").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    shared = (
        th_sources.select(F.explode("ss").alias("source_a"), F.col("ss"))
        .select("source_a", F.explode("ss").alias("source_b"))
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    grid = (
        sizes.select(
            F.col("source").alias("source_a"),
            F.col("n_hashes").alias("hashes_a"),
        )
        .crossJoin(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"),
                    F.col("n_hashes").alias("hashes_b"),
                )
            )
        )
        .filter(F.col("source_a") < F.col("source_b"))
    )
    out = grid.join(F.broadcast(shared), ["source_a", "source_b"], "left")
    ns = F.coalesce(F.col("n_shared"), F.lit(0)).cast("long")
    return out.select(
        "source_a",
        "source_b",
        F.col("hashes_a").cast("long").alias("hashes_a"),
        F.col("hashes_b").cast("long").alias("hashes_b"),
        ns.alias("n_shared"),
        (
            ns.cast("double")
            / (F.col("hashes_a") + F.col("hashes_b") - ns).cast("double")
        ).alias("jaccard"),
    )


def dedup_incremental_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-dedup correctness certificate: replay exact dedup
    over three arrival snapshots (step = doc_id % 3, arrival order
    (step, doc_id)) through the incremental path — each batch
    anti-joined against the accumulated hash index, then first-wins
    within the batch (operators/dedup.incremental_dedup) — and compare
    the union of per-step survivors against ONE-SHOT dedup of the full
    corpus under the same arrival order. The two must agree doc for
    doc; per step the row reports both counts and the agreement join.
    This is the replay-vs-batch contract an incremental 100 TB corpus
    build depends on (VERDICT r12 'Next round' #4c).

    Non-vacuous by construction: the two faces compute survivors by
    DIFFERENT plans (a 3-iteration anti-join loop vs one row_number
    window over (step, doc_id)); a bug in either — a leaked index
    entry, a wrong within-batch order — breaks n_agree and the driver
    hash.

    Scale shape: the loop is over SNAPSHOT COUNT (bounded, 3), not
    data; each iteration shuffles only 16-byte keys in the anti-join;
    the one-shot face is a single hash-key window; the agreement join
    keys on doc_id. At a real deployment the accumulated index is the
    narrow (hash) table incremental_dedup documents.
    """
    from hrfco_data_pipeline_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 3).alias("step"),
        F.md5(F.lower(F.trim("text"))).alias("text_hash"),
    )
    inc_parts = []
    for t in range(3):
        new = docs.filter(F.col("step") == t)
        seen = docs.filter(F.col("step") < t)
        inc_parts.append(
            incremental_dedup(new, seen).select("doc_id", "step")
        )
    inc = inc_parts[0].unionByName(inc_parts[1]).unionByName(inc_parts[2])

    w = Window.partitionBy("text_hash").orderBy(F.asc("step"), F.asc("doc_id"))
    oneshot = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "step")
    )
    arrived = docs.groupBy("step").agg(F.count("*").alias("n_arrived"))
    n_inc = inc.groupBy("step").agg(F.count("*").alias("n_incremental"))
    n_one = oneshot.groupBy("step").agg(F.count("*").alias("n_oneshot"))
    agree = (
        inc.join(oneshot, ["doc_id", "step"])
        .groupBy("step")
        .agg(F.count("*").alias("n_agree"))
    )
    out = (
        arrived.join(n_inc, "step", "left")
        .join(n_one, "step", "left")
        .join(agree, "step", "left")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")
    return out.select(
        F.col("step").cast("long").alias("step"),
        F.col("n_arrived").cast("long").alias("n_arrived"),
        z("n_incremental").alias("n_incremental"),
        z("n_oneshot").alias("n_oneshot"),
        z("n_agree").alias("n_agree"),
        (
            (z("n_agree") == z("n_incremental"))
            & (z("n_agree") == z("n_oneshot"))
        ).alias("replay_matches_oneshot"),
    )


def dedup_chaining_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive-chaining exposure audit at Jaccard ≥ 0.5: how much
    MORE does component-closure dedup drop than the pairwise-shadow
    rule on the same pair graph? Chains (A~B, B~C, A≁C) are the
    classic over-dedup failure mode of clustering near-dup pairs
    ("everything merges through boilerplate bridges"); this emits the
    one-row gap measurement — pairwise drops are a documented lower
    bound (docs_dedup_threshold_curve), the component closure the
    upper bound, and the delta is the chaining cost a threshold choice
    signs up for.

    Non-vacuous: the Spark face labels components ITERATIVELY
    (operators/dedup.connected_components, O(log d) pointer jumping);
    the DuckDB twin recomputes the same fixpoint as a recursive
    transitive closure (the dup_components oracle machinery at 0.5).

    Scale shape: reuses the banded/hot-capped pair machinery once;
    the closure runs on the pair graph (pairs, not docs); the final
    report is a handful of scalar aggregates over component labels.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    pairs = docs_ngram_jaccard_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= 0.5
    )
    comp = connected_components(pairs, "doc_a", "doc_b", distinct_pairs=True)
    comp_sizes = comp.groupBy("component").agg(F.count("*").alias("sz"))
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs")
    )
    pair_stats = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("doc_b").alias("n_dropped_pairwise"),
    )
    # dropped = Σ(sz - 1): the component label is the min member id and
    # appears exactly once per cluster, so "id != component" counts
    # every member but one — no need to join the labels back against
    # their own size table (r16 optimization: one exchange + one join
    # fewer, same longs)
    chain_stats = comp_sizes.agg(
        (F.sum("sz") - F.count("*")).alias("n_dropped_chained"),
        F.count("*").alias("n_components"),
        F.max("sz").alias("max_component_size"),
    )
    return (
        n_docs.crossJoin(F.broadcast(pair_stats))
        .crossJoin(F.broadcast(chain_stats))
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_dropped_pairwise").cast("long").alias(
                "n_dropped_pairwise"
            ),
            F.coalesce(F.col("n_dropped_chained"), F.lit(0))
            .cast("long")
            .alias("n_dropped_chained"),
            (
                F.coalesce(F.col("n_dropped_chained"), F.lit(0))
                - F.col("n_dropped_pairwise")
            ).cast("long").alias("n_chain_only"),
            F.coalesce(F.col("n_components"), F.lit(0))
            .cast("long")
            .alias("n_components"),
            F.coalesce(F.col("max_component_size"), F.lit(0))
            .cast("long")
            .alias("max_component_size"),
        )
    )


def dedup_rate_by_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-rate curve across the three arrival snapshots (step =
    doc_id % 3, the dedup_incremental_certificate fixture): per
    snapshot, how many arrivals the NEAR-dup keep policy drops because
    a cluster-mate arrived earlier — the curve a corpus build reads to
    see whether later crawls are mostly re-crawl (rate rising) or
    fresh content (rate flat), plus the exact-hash sub-count and the
    cumulative kept-corpus growth (VERDICT r14 'Next round' #2: the
    dup-trend measurement extended across the incremental fixture).
    Near-dup clusters are the certified Jaccard ≥ 0.5 component
    closure (dedup_chaining_audit's graph — exact dups alone are
    vacuous below sf0.1, the r14 vacuity rule); within a cluster the
    first (step, doc_id) arrival survives.

    Exactness: all counts exact longs; near_dup_rate is one double
    division; cum_kept an integer running sum over the 3-row step
    domain.

    Scale shape: reuses the banded/hot-capped pair machinery once;
    ONE pointer-jumping component closure on the pair graph (pairs,
    never docs); attribution joins are component- and hash-keyed; the
    curve aggregates to the 3-row step domain and the running sum
    windows over it.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 3).alias("step"),
        F.md5(F.lower(F.trim("text"))).alias("text_hash"),
    )
    pairs = docs_ngram_jaccard_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= 0.5
    )
    comp = connected_components(pairs, "doc_a", "doc_b", distinct_pairs=True)
    cstep = comp.join(docs, comp["id"] == docs["doc_id"]).select(
        "component", "doc_id", "step"
    )
    wc = Window.partitionBy("component").orderBy("step", "doc_id")
    dn = (
        cstep.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") > 1)
        .groupBy("step")
        .agg(F.count("*").alias("n_dropped_near"))
    )
    wh = Window.partitionBy("text_hash").orderBy("step", "doc_id")
    de = (
        docs.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") > 1)
        .groupBy("step")
        .agg(F.count("*").alias("n_dropped_exact"))
    )
    arrived = docs.groupBy("step").agg(F.count("*").alias("n_arrived"))
    out = arrived.join(dn, "step", "left").join(de, "step", "left")
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    kept = F.col("n_arrived").cast("long") - z("n_dropped_near")
    wcum = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return out.select(
        F.col("step").cast("long").alias("step"),
        F.col("n_arrived").cast("long").alias("n_arrived"),
        z("n_dropped_near").alias("n_dropped_near"),
        z("n_dropped_exact").alias("n_dropped_exact"),
        kept.alias("n_kept"),
        F.round(
            z("n_dropped_near").cast("double")
            / F.col("n_arrived").cast("double"),
            4,
        ).alias("near_dup_rate"),
        F.sum(kept).over(wcum).cast("long").alias("cum_kept"),
    )


def lsh_band_tradeoff_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH (bands × rows) parameter pricing over the CERTIFIED
    exact-Jaccard candidate pair table: for each 128-hash banding
    (b=32×r=4, b=16×r=8, b=8×r=16), the expected number of candidate
    pairs LSH would surface — Σ over pairs of the S-curve detection
    probability p(s) = 1 − (1 − s^r)^b — plus how many pairs sit past
    the curve's half-detection point. The measurement behind choosing
    (b, r) before a corpus-scale MinHash run (minhash_calibration
    prices ONE configuration against its own signatures; this prices
    the grid analytically from exact similarities, no signatures
    computed).

    Caveat (documented): the pair set is the banded/hot-capped
    candidate table (jaccard ≥ 0.2), so the curve is conditional on
    candidacy — exactly the regime (b, r) tuning cares about.

    Exactness: s is the certified exact rational-division double;
    s^r and (1−x)^b are REPEATED-SQUARING chains (r, b powers of two:
    4→2 squarings, 8→3, 16→4, 32→5) — only IEEE multiplications, no
    pow() (libm pow differs between engines in the last ulp);
    per-pair p floor-quantizes to integer nanos and sums EXACTLY
    (the train_linear_gate convention), so the expected-count column
    is order-invariant and bit-portable.

    Scale shape: one pass over the (tiny relative to corpus) pair
    table; the 3-config axis is a literal explode; aggregates are
    3-group map-side-combined sums.
    """
    pairs = docs_ngram_jaccard_pairs(spark, sf_dir).select("jaccard")

    def sq(c, times):
        for _ in range(times):
            c = c * c
        return c

    def p_detect(s, r_sq, b_sq):
        # s^r via r_sq squarings; (1 - s^r)^b via b_sq squarings
        return F.lit(1.0) - sq(F.lit(1.0) - sq(s, r_sq), b_sq)

    s = F.col("jaccard")
    cfg = F.array(
        F.struct(
            F.lit(32).alias("b"), F.lit(4).alias("r"),
            p_detect(s, 2, 5).alias("p"),
        ),
        F.struct(
            F.lit(16).alias("b"), F.lit(8).alias("r"),
            p_detect(s, 3, 4).alias("p"),
        ),
        F.struct(
            F.lit(8).alias("b"), F.lit(16).alias("r"),
            p_detect(s, 4, 3).alias("p"),
        ),
    )
    staged = pairs.select(F.explode(cfg).alias("c")).select(
        F.col("c.b").alias("bands"),
        F.col("c.r").alias("rows_per_band"),
        F.col("c.p").alias("p"),
    )
    return staged.groupBy("bands", "rows_per_band").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.floor(F.col("p") * F.lit(1000000000.0)).cast("long"))
        .cast("long")
        .alias("expected_detected_nanos"),
        F.sum(F.when(F.col("p") >= 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_past_half_detection"),
    )


def docs_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by source after ONE BPE merge: symbols per
    100 characters when the corpus's top pair (docs_bpe_pair_counts's
    winner under the same total order) is merged — the
    tokens-per-byte QA every tokenizer change is priced by (a source
    whose fertility barely drops is one the merge vocabulary doesn't
    serve; per-source fertility gaps flag domain mismatch long before
    training). Composes the certified BPE kernel surface
    (operators/bpe.py, docs_bpe_apply_merge) into the per-source
    report face.

    Exactness: symbol counts are integers
    (len(replace(w, pair, SEP)) — the docs_bpe_apply_merge chr(1)
    placeholder trick counts the merged pair as one symbol), sums are
    exact longs, fertility is ONE double division of exact integers
    × a literal 100, raw.

    Scale shape: one explode + (source, word) partial-aggregated
    groupBy (the vocab-collapse discipline: per-word symbol work runs
    once per DISTINCT (source, word)); the 1-row top-pair broadcasts;
    the rollup is |sources| groups.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(_tokens()).alias("w0")
    ).select("source", F.lower("w0").alias("w"))
    swc = words.groupBy("source", "w").agg(F.count("*").alias("wn"))
    pair_arr = F.when(
        F.length("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.col("w").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top1 = (
        swc.select("wn", F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("wn").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
        .select(F.col("pair").alias("mp"))
    )
    SEP = "\x01"
    staged = swc.crossJoin(F.broadcast(top1)).select(
        "source",
        "wn",
        F.length("w").alias("n_chars_w"),
        F.length(F.replace(F.col("w"), F.col("mp"), F.lit(SEP))).alias(
            "n_syms_w"
        ),
    )
    out = staged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_vocab"),
        F.sum("wn").cast("long").alias("n_words"),
        F.sum(F.col("wn") * F.col("n_chars_w")).cast("long").alias("n_chars"),
        F.sum(F.col("wn") * F.col("n_syms_w")).cast("long").alias("n_syms"),
    )
    return out.select(
        "source",
        "n_vocab",
        "n_words",
        "n_chars",
        "n_syms",
        # an all-whitespace source tokenizes to one empty word
        # (n_chars = 0) — guard the division (ANSI throws)
        F.when(
            F.col("n_chars") > 0,
            F.col("n_syms").cast("double")
            / F.col("n_chars").cast("double")
            * F.lit(100.0),
        ).alias("syms_per_100_chars"),
    )


def ann_recall_by_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-skew-aware ANN recall: IVF recall@5 broken down by the
    PROBED CELL, joined with that cell's occupancy — the measurement
    that answers "does IVF degrade on hot cells?" (VERDICT r12 'Next
    round' #4b). A skewed cell map can hide behind a healthy mean
    recall: hot cells answer many queries against many candidates
    (recall fine, latency terrible), cold cells the reverse — this
    emits the per-cell grid so both failure modes are visible next to
    ann_centroid_occupancy's imbalance factor.

    Composes three oracle-exact faces — the centroid/assignment
    kernel (ivf_centroids + assign_cells), the IVF and brute-force
    top-5 — so every emitted number is itself oracle-backed. Every
    populated cell is always present; cells with no queries emit
    n_queries = 0 and NULL recall.

    Scale shape: inherits the bounded shapes of its inputs (cell-
    routed candidates, WindowGroupLimit top-k, zero-shuffle E-step
    projection); the report joins key on vec_id/cell — query-bounded
    and ≤k_cells-bounded exchanges; the k×dim centroid collect is the
    documented Lloyd bound. The IVF kernels are INLINED rather than
    composed from the query faces so centroid training runs once
    (the composed form trained three times — measured 20.2 s vs
    ~12 s at sf0.1; the oracle stays the composed SQL, which computes
    identical values by construction). The BRUTE side composes the
    certified ann_cosine_topk face verbatim — it ranks on the
    4-decimal ROUNDED cosine exactly like its oracle, where
    operators/similarity.brute_force_topk ranks raw (a round-tie at
    the rank-5 boundary would silently split the hash; caught in the
    r13 self-review) — and trains nothing.
    """
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        assign_cells,
        ivf_centroids,
        ivf_topk,
    )
    from hrfco_data_pipeline_spark.sources.tables import (
        parallelize_small_scan,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # r17 (guide §2.5): spread the ~1 MB single-row-group vector frame
    # once so the Lloyd iterations and the IVF/brute scoring kernels
    # run at full parallelism instead of in the single scan task (REST
    # stage profile: serial 0.2–0.8 s stages); no-ops at real scale.
    vecs = parallelize_small_scan(
        emb.select("vec_id", as_double_vec("embedding", "v"))
    )
    cents = ivf_centroids(vecs, n_centroids=16, dim=64)
    cells = assign_cells(vecs, cents).select("vec_id", "cell")
    sizes = cells.groupBy("cell").agg(F.count("*").alias("n_vecs"))
    queries = vecs.filter(F.col("vec_id") % 50 == 0)
    ivf = ivf_topk(vecs, queries, cents, k=5).select("qid", "cid")
    brute = ann_cosine_topk(spark, sf_dir).select(
        F.col("query_id").alias("qid"), F.col("neighbor_id").alias("cid")
    )
    hits = (
        ivf.join(brute, ["qid", "cid"])
        .groupBy("qid")
        .agg(F.count("*").alias("n_hits"))
    )
    rec = (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(hits, F.col("query_id") == F.col("qid"), "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
    )
    qc = cells.join(rec, cells["vec_id"] == rec["query_id"])
    per_cell = qc.groupBy("cell").agg(
        F.count("*").alias("n_queries"),
        F.sum("n_hits").alias("sum_hits"),
    )
    out = sizes.join(per_cell, "cell", "left")
    nq = F.coalesce(F.col("n_queries"), F.lit(0)).cast("long")
    return out.select(
        F.col("cell").cast("int").alias("cell"),
        F.col("n_vecs").cast("long").alias("n_vecs"),
        nq.alias("n_queries"),
        F.coalesce(F.col("sum_hits"), F.lit(0)).cast("long").alias(
            "sum_hits"
        ),
        F.when(
            nq > 0,
            F.col("sum_hits").cast("double")
            / (F.lit(5.0) * nq.cast("double")),
        ).alias("recall_at_5"),
    )


def stream_batch_cms_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming↔batch parity CERTIFICATE for the CMS maintainer
    (VERDICT r12 'Next round' #4a): stream the documents table through
    streaming/curation.cms_stream in file micro-batches (availableNow),
    then serve the heavy-hitters probe FROM THE STREAMING STORE and
    emit it next to a matches-batch-face flag computed against the
    batch query. CMS counters merge by cell-wise addition, so the
    served rows must be row-identical to docs_cms_heavy_hitters in any
    arrival order — a maintainer bug (lost batch, double-applied
    batch, wrong cell arithmetic) breaks the values AND the flag, and
    the driver hash catches both (the oracle is the batch face + TRUE:
    the pytest twin pins the same identity in-suite, this pins it
    under the driver gate).

    EAGER query (the docs_train_linear_gate convention): the streaming
    run executes at call time into a session temp dir; 4 micro-batches
    of the fixed 3×1024 counter partials — constant state no matter
    the corpus size, the defining sketch property.
    """
    from hrfco_data_pipeline_spark.streaming.curation import (
        cms_stream,
        run_parity_stream,
    )

    # r17: stage only the tokenized column (guide §2.3 — the r16
    # projection pass missed this site); n_files=2 (verdict item 2):
    # CMS cells merge by cell-wise ADD — batch-boundary-invariant
    # report, half the availableNow floor.
    docs = load_table(spark, sf_dir, "documents").select("text")
    table = run_parity_stream(
        spark, docs, cms_stream, "hrfco_cms_parity_", n_files=2
    )
    return cms_parity_report(spark, sf_dir, table)


def cms_parity_report(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """The serve-vs-batch comparison tail of stream_batch_cms_parity,
    factored out so the negative-path test can point it at a TAMPERED
    store and watch the flag flip (tests/test_r13_operators.py)."""
    from hrfco_data_pipeline_spark.streaming.curation import (
        cms_heavy_hitters_from_store,
    )

    served = cms_heavy_hitters_from_store(spark, sf_dir, table)
    batch = docs_cms_heavy_hitters(spark, sf_dir).select(
        F.col("term").alias("b_term"),
        F.col("exact_cnt").alias("b_exact"),
        F.col("cms_est").alias("b_est"),
    )
    j = served.join(
        batch, served["term"] == batch["b_term"], "full_outer"
    )
    return j.select(
        F.coalesce(F.col("term"), F.col("b_term")).alias("term"),
        F.col("exact_cnt"),
        F.col("cms_est"),
        F.col("inflation"),
        (
            F.col("exact_cnt").eqNullSafe(F.col("b_exact"))
            & F.col("cms_est").eqNullSafe(F.col("b_est"))
        ).alias("matches_batch_face"),
    )


def stream_batch_bm25_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming↔batch parity CERTIFICATE for the BM25 index
    maintainer (VERDICT r13 'Next round' #3): stream the documents
    table through streaming/curation.bm25_index_stream in file
    micro-batches (availableNow) — each batch tokenized ONCE, its
    postings appended exactly-once — then serve the registered query
    set FROM THE STORED INDEX and emit it next to a
    matches-batch-face flag computed against docs_bm25_topk. Postings
    merge by plain append (a doc arrives once) and df/avgdl re-derive
    from the index itself, so the served top-k must be row-identical
    to the batch face in any arrival order — a maintainer bug (lost
    batch, double-applied batch, re-tokenized corpus) breaks the
    scores AND the flag, and the driver hash catches both (the oracle
    is the batch face's own SQL + TRUE; the pytest twin pins the same
    identity in-suite, this pins it under the driver gate — the r13
    cms_parity_report factoring).

    EAGER query (the docs_train_linear_gate convention): the streaming
    run executes at call time into a session temp dir; 4 micro-batches
    of postings-sized partials. At scale the certificate pattern runs
    against an existing index store, not a re-copy — the serve path
    is one index-sized scan, never a corpus rescan.
    """
    from hrfco_data_pipeline_spark.streaming.curation import (
        bm25_index_stream,
        run_parity_stream,
    )

    # r16 (guide §2.3 — project before the exchange): stage only the
    # columns the index maintainer reads.
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # n_files=2 (r17, verdict item 2): postings are per-doc rows and
    # docs are whole rows — the appended union is batching-invariant;
    # half the availableNow floor.
    table = run_parity_stream(
        spark, docs, bm25_index_stream, "hrfco_bm25_parity_", n_files=2
    )
    return bm25_parity_report(spark, sf_dir, table)


def bm25_parity_report(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """The serve-vs-batch comparison tail of stream_batch_bm25_parity,
    factored out so the negative-path test can point it at a TAMPERED
    index (double-appended postings inflate tf and df, shifting every
    score) and watch the flag flip (tests/test_r14_operators.py)."""
    from hrfco_data_pipeline_spark.streaming.curation import (
        bm25_topk_from_index,
    )

    served = bm25_topk_from_index(spark, table)
    batch = docs_bm25_topk(spark, sf_dir).select(
        F.col("query_id").alias("b_qid"),
        F.col("rank").alias("b_rank"),
        F.col("doc_id").alias("b_doc"),
        F.col("score").alias("b_score"),
        F.col("n_terms").alias("b_terms"),
    )
    j = served.join(
        batch,
        (served["query_id"] == batch["b_qid"])
        & (served["rank"] == batch["b_rank"]),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("query_id"), F.col("b_qid")).alias("query_id"),
        F.coalesce(F.col("rank"), F.col("b_rank")).alias("rank"),
        F.col("doc_id"),
        F.col("score"),
        F.col("n_terms"),
        (
            F.col("doc_id").eqNullSafe(F.col("b_doc"))
            & F.col("score").eqNullSafe(F.col("b_score"))
            & F.col("n_terms").eqNullSafe(F.col("b_terms"))
        ).alias("matches_batch_face"),
    )


def stream_batch_tv_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming↔batch parity CERTIFICATE for the TV source-drift
    maintainer (VERDICT r14 'Next round' #2): stream the documents
    table through streaming/curation.tv_drift_stream in file
    micro-batches (availableNow) — each batch appending its own
    (source, bucket, c) token-count partials exactly-once — then serve
    the pairwise total-variation distances FROM THE STORED PARTIALS
    and emit them next to a matches-batch-face flag computed against
    docs_source_tv_distance. Counts merge by plain addition, so the
    served rows must be row-identical to the batch face in any
    arrival order — a maintainer bug (lost batch, double-applied
    batch, dropped bucket) shifts a count and breaks the integer-exact
    TV numerator AND the flag (the oracle is the batch face's own SQL
    + TRUE — the r13 cms_parity_report factoring).

    EAGER query: the streaming run executes at call time into a
    session temp dir; stored state is per-batch |sources|·256 bucket
    partials — grid-bounded, never token-bounded. At scale the
    certificate runs against an existing partial store, not a re-copy.
    """
    from hrfco_data_pipeline_spark.streaming.curation import (
        run_parity_stream,
        tv_drift_stream,
    )

    # r16 (guide §2.3): stage only the maintainer's columns.
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    # n_files=2 (r17, verdict item 2): token-count partials merge by
    # plain addition — batch-boundary-invariant report, half the floor.
    table = run_parity_stream(
        spark, docs, tv_drift_stream, "hrfco_tv_parity_", n_files=2
    )
    return tv_parity_report(spark, sf_dir, table)


def tv_parity_report(
    spark: SparkSession, sf_dir: str, table: str
) -> DataFrame:
    """The serve-vs-batch comparison tail of stream_batch_tv_parity,
    factored out so the negative-path test can point it at a TAMPERED
    store (a re-appended partial double-counts a batch's buckets,
    shifting both marginals) and watch the flag flip
    (tests/test_r15_operators.py)."""
    from hrfco_data_pipeline_spark.streaming.curation import (
        tv_report_from_counts,
    )

    served = tv_report_from_counts(spark, table)
    batch = docs_source_tv_distance(spark, sf_dir).select(
        F.col("source_a").alias("b_a"),
        F.col("source_b").alias("b_b"),
        F.col("n_toks_a").alias("b_na"),
        F.col("n_toks_b").alias("b_nb"),
        F.col("tv_distance").alias("b_tv"),
    )
    j = served.join(
        batch,
        (served["source_a"] == batch["b_a"])
        & (served["source_b"] == batch["b_b"]),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("source_a"), F.col("b_a")).alias("source_a"),
        F.coalesce(F.col("source_b"), F.col("b_b")).alias("source_b"),
        F.col("n_toks_a"),
        F.col("n_toks_b"),
        F.col("tv_distance"),
        (
            F.col("n_toks_a").eqNullSafe(F.col("b_na"))
            & F.col("n_toks_b").eqNullSafe(F.col("b_nb"))
            & F.col("tv_distance").eqNullSafe(F.col("b_tv"))
        ).alias("matches_batch_face"),
    )


def stream_batch_lm_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming↔batch parity CERTIFICATE for the bigram-LM statistics
    maintainer (VERDICT r14 'Next round' #2): stream the documents
    table through streaming/curation.lm_stats_stream in file
    micro-batches (availableNow) — each batch's bigram counts merged
    into the stored table under the exactly-once staged swap — then
    serve the top-20 corpus bigrams plus the global count checksums
    FROM THE STORED TABLE and emit them next to a matches-batch-face
    flag computed against a one-pass batch count of the same corpus.
    Counts merge by plain addition, so the stored table must be
    row-identical to the batch counts in any arrival order — a
    maintainer bug (lost merge, double-applied batch, swap-crash data
    loss) shifts a count and breaks the ranks, the checksums, AND the
    flag. Emission is EXACT-INTEGER throughout (counts and ranks — no
    perplexity/log in the certified surface, per the Math.log house
    rule).

    EAGER query: the streaming run executes at call time into a
    session temp dir; stored state is the vocab-bounded (bg, c) table.
    At scale the certificate runs against the existing LM store the
    perplexity face already reads.
    """
    from hrfco_data_pipeline_spark.streaming.curation import (
        lm_stats_stream,
        run_parity_stream,
    )

    # r16 (guide §2.3): stage only the maintainer's columns.
    docs = load_table(spark, sf_dir, "documents").select("text")
    # n_files=2 (r17, verdict item 2): bigram counts merge by plain
    # addition — batch-boundary-invariant report, half the floor.
    table = run_parity_stream(
        spark, docs, lm_stats_stream, "hrfco_lm_parity_", n_files=2
    )
    return lm_parity_report(spark, sf_dir, table)


def lm_parity_report(
    spark: SparkSession, sf_dir: str, table: str
) -> DataFrame:
    """The serve-vs-batch comparison tail of stream_batch_lm_parity,
    factored out so the negative-path test can point it at a TAMPERED
    store (a perturbed count shifts a rank and both checksums) and
    watch the flag flip (tests/test_r15_operators.py).

    Scale shape: the top-20 is a TakeOrdered over the vocab-bounded
    count table (no full sort); the rank window then runs over ≤20
    rows; the checksums are two single-row aggregates cross-joined on."""
    from hrfco_data_pipeline_spark.streaming.curation import bigram_counts

    def _top20(counts: DataFrame, pre: str) -> DataFrame:
        top = counts.orderBy(F.desc("c"), F.asc("bg")).limit(20)
        w = Window.orderBy(F.desc("c"), F.asc("bg"))
        return top.select(
            F.row_number().over(w).alias(f"{pre}rank"),
            F.col("bg").alias(f"{pre}bg"),
            F.col("c").alias(f"{pre}c"),
        )

    def _totals(counts: DataFrame, pre: str) -> DataFrame:
        return counts.agg(
            F.count("*").alias(f"{pre}n_distinct_bg"),
            F.sum("c").cast("long").alias(f"{pre}total_c"),
        )

    stored = spark.read.parquet(table)
    docs = load_table(spark, sf_dir, "documents")
    batch = bigram_counts(docs)
    j = (
        _top20(stored, "")
        .join(_top20(batch, "b_"), F.col("rank") == F.col("b_rank"), "full_outer")
        .crossJoin(F.broadcast(_totals(stored, "g_")))
        .crossJoin(F.broadcast(_totals(batch, "gb_")))
    )
    return j.select(
        F.coalesce(F.col("rank"), F.col("b_rank")).alias("rank"),
        F.col("bg"),
        F.col("c"),
        F.col("g_n_distinct_bg").alias("n_distinct_bg"),
        F.col("g_total_c").alias("total_c"),
        (
            F.col("bg").eqNullSafe(F.col("b_bg"))
            & F.col("c").eqNullSafe(F.col("b_c"))
            & F.col("g_n_distinct_bg").eqNullSafe(F.col("gb_n_distinct_bg"))
            & F.col("g_total_c").eqNullSafe(F.col("gb_total_c"))
        ).alias("matches_batch_face"),
    )


def dedup_chaining_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chaining-exposure CURVE (VERDICT r13 'Next round' #3): the
    dedup_chaining_audit gap measurement swept over Jaccard thresholds
    {0.3, 0.5, 0.7} — how the pairwise-shadow lower bound, the
    component-closure upper bound, and the chaining cost between them
    move as the near-dup threshold tightens. This is the table a
    threshold choice is actually made from: the single-threshold audit
    says what 0.5 costs, the sweep says where the chaining cliff is.

    Scale shape: the expensive banded/hot-capped pair table builds
    ONCE (materialized by docs_ngram_jaccard_pairs); the pairwise arm
    is ONE explode pass over it (each pair emits the thresholds it
    clears — the docs_dedup_threshold_curve trick); only the closure
    arm runs per threshold (3 pointer-jumping CC runs on pair-sized,
    monotonically shrinking graphs — pairs, never docs).

    Non-vacuous like the parent audit: the Spark closure is iterative
    min-label propagation; the DuckDB twin recomputes each threshold's
    fixpoint as a recursive transitive closure.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    thresholds = [0.3, 0.5, 0.7]
    pairs = docs_ngram_jaccard_pairs(spark, sf_dir)
    # pairwise arm: one pass — explode the thresholds each pair clears
    cleared = pairs.select(
        "doc_b",
        F.explode(
            F.filter(
                F.array(*[F.lit(t) for t in thresholds]),
                lambda t: F.col("jaccard") >= t,
            )
        ).alias("threshold"),
    )
    pairwise = cleared.groupBy("threshold").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("doc_b").alias("n_dropped_pairwise"),
    )
    # closure arm: one CC per threshold on the shrinking pair graph
    def _closure_stats(t: float) -> DataFrame:
        p_t = pairs.filter(F.col("jaccard") >= t)
        comp = connected_components(p_t, "doc_a", "doc_b", distinct_pairs=True)
        comp_sizes = comp.groupBy("component").agg(F.count("*").alias("sz"))
        # dropped = Σ(sz - 1): the min-id label appears exactly once
        # per cluster (see dedup_chaining_audit) — aggregate the size
        # table directly instead of joining the labels back onto it
        # (r16 optimization)
        return comp_sizes.agg(
            F.lit(t).alias("threshold"),
            (F.sum("sz") - F.count("*")).alias("n_dropped_chained"),
            F.count("*").alias("n_components"),
            F.max("sz").alias("max_component_size"),
        )

    # the three closures are independent eager fixpoint loops — run
    # them from a small thread pool so one threshold's checkpoint/
    # convergence jobs back-fill the idle tail of another's stages
    # (guide §2.6 overlap-independent-jobs; results are deterministic
    # per threshold, the union order below is fixed by the list)
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=len(thresholds)) as pool:
        chained_rows = list(
            pool.map(inheritable_thread_target(_closure_stats), thresholds)
        )
    chained = chained_rows[0]
    for df in chained_rows[1:]:
        chained = chained.unionByName(df)
    out = pairwise.join(chained, "threshold", "full_outer")
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return out.select(
        F.col("threshold").cast("double").alias("threshold"),
        z("n_pairs").alias("n_pairs"),
        z("n_dropped_pairwise").alias("n_dropped_pairwise"),
        z("n_dropped_chained").alias("n_dropped_chained"),
        (z("n_dropped_chained") - z("n_dropped_pairwise")).alias(
            "n_chain_only"
        ),
        z("n_components").alias("n_components"),
        z("max_component_size").alias("max_component_size"),
    )


def docs_crosssnap_dup_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-rate per snapshot change class (VERDICT r13 'Next round'
    #3): the docs_snapshot_diff classification (added / changed /
    unchanged, per CURRENT doc — removed keys have no current text to
    dedup) crossed with the exact-dedup cluster structure: do freshly
    added or upstream-edited documents duplicate existing content more
    than the stable base? A rising dup-rate among 'added' docs is the
    mirror-crawl early-warning an incremental curation pipeline
    watches between releases.

    Composes the parent kernels verbatim: the shared
    prev_snapshot_hashes fixture (SNAPSHOT_GAP_MOD not-yet-ingested,
    SNAPSHOT_REV_MOD stale-revision) and dedup_exact_docs' groups
    (min-doc_id keep policy on the normalized-text hash).

    Scale shape: the diff arm is a doc_id-keyed self-join comparing
    16-byte hashes; the dedup arm joins the doc frame to its
    hash-keyed group table (same dedup_exact_docs shuffle); the
    report aggregates 3 classes map-side. Raw text is consumed only
    inside per-scan hash projections — the joins move 16-byte keys.
    """
    docs = load_table(spark, sf_dir, "documents")
    cur = docs.select(
        "doc_id",
        F.md5(F.lower(F.trim("text"))).alias("text_hash"),
        F.md5("text").alias("h_new"),
    )
    # shared fixture; the retired key it carries never matches a
    # current doc_id, so the left join below is unaffected
    prev = prev_snapshot_hashes(spark, docs)
    j = cur.join(prev, "doc_id", "left")
    status = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new") != F.col("h_old"), "changed")
        .otherwise("unchanged")
    )
    groups = dedup_exact_docs(spark, sf_dir)
    d = j.select("doc_id", "text_hash", status.alias("status")).join(
        groups, "text_hash"
    )
    agg = d.groupBy("status").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0)).alias(
            "n_dup_members"
        ),
        F.sum(
            F.when(F.col("doc_id") != F.col("keep_doc_id"), 1).otherwise(0)
        ).alias("n_dropped"),
    )
    return agg.select(
        "status",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_dup_members").cast("long").alias("n_dup_members"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        (
            F.col("n_dropped").cast("double") / F.col("n_docs").cast("double")
        ).alias("drop_rate"),
    )


def docs_simhash_hamming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash threshold-calibration curve: the Hamming-distance
    HISTOGRAM (with a cumulative arm) over the full pigeonhole
    candidate population — every deduped pair sharing one of the four
    16-bit fingerprint chunks, no Hamming filter. This is the table a
    max_hamming choice is read from: cum_pairs at h = 3 is exactly
    the pair volume simhash_clusters accepts, and the histogram's
    tail shows what each extra bit of tolerance would admit. Up to
    Hamming 3 the population is COMPLETE (any 3-bit difference leaves
    a chunk untouched — the pigeonhole guarantee); above 3 it is the
    candidate set the blocking happens to surface, by design — the
    curve prices the filter, not the full metric space.

    Portable like simhash_pairs_probe: fingerprints fold the md5-60bit
    token hashes (pure integer votes), the oracle recomputes the SAME
    blocked population (chunk-join + pair-dedup, never naive
    all-pairs — above Hamming 3 the two populations differ).

    Scale shape: one fingerprint projection, the 16-bit-bucket
    self-join (bounded by bucket occupancy, the production simhash
    shape), then a ≤ 61-row histogram; the cumulative window runs on
    that bounded grid.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        simhash_64_from_token_hashes,
        simhash_pairs_from,
    )

    docs = _docs_parallel(spark, sf_dir)
    base = F.transform(
        _tokens(),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    hashed = docs.select(
        F.col("doc_id").alias("id"),
        simhash_64_from_token_hashes(base).alias("sh"),
    )
    pairs = simhash_pairs_from(hashed, max_hamming=None)
    hist = pairs.groupBy("hamming").agg(F.count("*").alias("n_pairs"))
    w = Window.orderBy("hamming").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        F.col("hamming").cast("int").alias("hamming"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.sum("n_pairs").over(w).cast("long").alias("cum_pairs"),
    )


def dedup_survivor_source_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who wins dedup against whom: for every exact-dup cluster the
    min-doc_id keep policy resolves, the (winner_source, loser_source)
    flow counts — the directional face of docs_cross_source_dup_matrix
    (that one says which source PAIRS share content; this one says
    which source's copy actually survives the keep policy). A source
    that loses mostly to one other source is a mirror lagging its
    origin; a source that wins everywhere is the canonical feed.

    The groups table is dedup_exact_docs' aggregate (same
    normalized-text hash, same min-doc_id policy), derived from the
    materialized hash projection below so the policy and the flow read
    the same bytes. loss_share = n_losses / total losses of the losing
    source — one double division of exact counts, NULL when the
    source loses nothing.

    Determinism (the docs_cross_source_dup_matrix convention): every
    ORDERED source pair — diagonal included, a source can out-rank its
    own later copies — is always present, zero-filled; exact dups only
    exist at sf0.1 in the synthetic corpus, so without the grid the
    gate-SF row would be empty (the r14 vacuity rule).

    Scale shape: the (doc_id, source, hash) projection MATERIALIZES
    once — it is consumed by FIVE branches (winner arm, loser arm,
    the groups aggregate, and the two grid sides), and a first draft
    let Catalyst re-embed the text-reading scan into each (6 corpus
    scans; the r9 branch-re-embedding lesson, caught by the r14 plan
    spot-check). Both join arms move (hash, source) pairs only; the
    flow aggregates on the |sources|² grid (broadcast) and the share
    window runs over it.
    """
    from hrfco_data_pipeline_spark.operators.dedup import _materialized

    docs = load_table(spark, sf_dir, "documents")
    hashed = _materialized(
        docs.select(
            "doc_id",
            "source",
            F.md5(F.lower(F.trim("text"))).alias("text_hash"),
        )
    )
    groups = (
        hashed.groupBy("text_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )
    winners = hashed.join(groups, "text_hash").filter(
        F.col("doc_id") == F.col("keep_doc_id")
    ).select("text_hash", F.col("source").alias("winner_source"))
    losers = (
        hashed.join(groups, "text_hash")
        .filter(F.col("doc_id") != F.col("keep_doc_id"))
        .select("text_hash", F.col("source").alias("loser_source"))
    )
    flow = (
        losers.join(winners, "text_hash")
        .groupBy("winner_source", "loser_source")
        .agg(F.count("*").alias("n"))
    )
    srcs = hashed.select("source").distinct()
    grid = srcs.select(F.col("source").alias("winner_source")).crossJoin(
        F.broadcast(srcs.select(F.col("source").alias("loser_source")))
    )
    filled = grid.join(
        flow, ["winner_source", "loser_source"], "left"
    ).withColumn("n_losses", F.coalesce(F.col("n"), F.lit(0)))
    wl = Window.partitionBy("loser_source")
    tot = F.sum("n_losses").over(wl)
    return filled.select(
        "winner_source",
        "loser_source",
        F.col("n_losses").cast("long").alias("n_losses"),
        F.when(
            tot > 0,
            F.col("n_losses").cast("double") / tot.cast("double"),
        ).alias("loss_share"),
    )


def embedding_shard_cell_drift(
    spark: SparkSession, sf_dir: str, n_shards: int = 4
) -> DataFrame:
    """IVF cell-occupancy drift across shards (VERDICT r13 'Next
    round' #3): per shard, the total-variation distance between that
    shard's cell-occupancy distribution and the whole-corpus one —
    the cell-level face of embedding_shard_centroid_drift (centroids
    say where a shard's MASS CENTER moved; this says whether its
    vectors ROUTE to the same inverted lists). A drifting shard means
    per-shard IVF indexes probe differently than a global one would —
    the audit to run before trusting shard-local ANN.

    Composes the certified IVF kernels with ONE centroid training
    (the ann_recall_by_occupancy single-training lesson): assign
    cells once, then everything is counting.

    Exactness: shares are one double division of exact longs each;
    |p − q| quantizes to nanos and sums exactly as longs, one final
    division by 2·10⁹ (the supplier_share_drift TV convention).

    Scale shape: the E-step is a zero-shuffle projection against
    literal centroids; counts partial-aggregate onto the
    |shards|·|cells| grid, which MATERIALIZES (≤ 64 rows) before the
    four derived aggregates — a first draft derived gl/ns/ntot/grid
    lazily and Catalyst re-embedded the embeddings scan into every
    branch (4 corpus scans; the r9 double_mass branch-re-embedding
    lesson, caught by the r14 plan spot-check); the global/per-shard
    totals broadcast.
    """
    from hrfco_data_pipeline_spark.operators.dedup import _materialized
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        assign_cells,
        ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    cents = ivf_centroids(vecs, n_centroids=16, dim=64)
    cells = assign_cells(vecs, cents).select(
        F.pmod(F.col("vec_id"), F.lit(n_shards)).alias("shard"), "cell"
    )
    cs = _materialized(
        cells.groupBy("shard", "cell").agg(F.count("*").alias("s"))
    )
    gl = cs.groupBy("cell").agg(F.sum("s").alias("g"))
    ns = cs.groupBy("shard").agg(F.sum("s").alias("n_s"))
    ntot = cs.agg(F.sum("s").alias("n"))
    grid = (
        ns.crossJoin(F.broadcast(gl))
        .join(cs, ["shard", "cell"], "left")
        .withColumn("s", F.coalesce(F.col("s"), F.lit(0)))
        .crossJoin(F.broadcast(ntot))
    )
    q = F.floor(
        F.abs(
            F.col("s").cast("double") / F.col("n_s").cast("double")
            - F.col("g").cast("double") / F.col("n").cast("double")
        )
        * F.lit(1e9)
    ).cast("long")
    return (
        grid.select("shard", "n_s", q.alias("q"))
        .groupBy("shard")
        .agg(
            F.max("n_s").cast("long").alias("n_vecs"),
            (F.sum("q").cast("double") / F.lit(2e9)).alias("tv_vs_global"),
        )
        .select(
            F.col("shard").cast("int").alias("shard"),
            "n_vecs",
            "tv_vs_global",
        )
    )


def embedding_norm_quality_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Pearson correlation between embedding energy
    (squared L2 norm) and the document quality score — the cross-table
    QA joining the dense and heuristic views of the same corpus: a
    strong correlation means the encoder's magnitude leaks the quality
    signal (useful as a cheap pre-filter; dangerous if the ANN index
    then under-represents low-quality strata). vec_id joins doc_id
    1:1 in the synthetic corpus (a real pipeline carries the doc key
    on the embedding row).

    Exactness: x = Σ_i floor(v_i²·10⁹) — per-component nano floors sum
    exactly as longs (order-free integer adds); y = round(quality·10)
    — the score is a sum of {0.4, 0.3, 0.3} steps, so rounding the
    tenths is exact where floor would straddle 0.6's representation.
    Sufficient statistics accumulate as DECIMAL(38,0) (Σx² reaches
    ~8e23 — far past 2^53), convert to double via Spark's
    correctly-rounded Decimal cast (the DuckDB twin uses the hi/lo
    2^40 split — SCALE.md §r14), and the Pearson algebra runs in
    double space on both faces (the bot-screen convention).
    Zero-variance sources emit NULL r, never a division error.

    Scale shape: one embeddings projection (codegen'd fold per row),
    one documents projection, a key-colocated 1:1 join, and a
    |sources|-group map-side-combined aggregate of six sums.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.aggregate(
            F.transform(
                "embedding",
                lambda v: F.floor(
                    v.cast("double") * v.cast("double") * F.lit(1e9)
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        ).alias("x"),
    )
    docs = load_table(spark, sf_dir, "documents")
    y = docs.select(
        "doc_id",
        "source",
        F.round(quality_score_expr(_tokens()) * 10).cast("long").alias("y"),
    )
    j = x.join(y, "doc_id")
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    agg = j.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    r = F.when(
        (varx > 0) & (vary > 0),
        (n * sxy - sx * sy) / F.sqrt(varx * vary),
    )
    return agg.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        r.alias("norm_quality_r"),
    )


def ann_pq_code_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook-usage balance audit for the PQ index: per sub-space,
    how evenly the ksub=16 codes are used — n_codes_used, the
    imbalance factor ksub·Σs²/(Σs)² (≥ 1; 1 = uniform usage — the
    ann_centroid_occupancy convention with the code-slot count fixed
    at ksub, unused codes contributing zero mass), and the hottest
    code's share. A sub-space that collapses onto a few codes wastes
    its bits and inflates ADC distortion — this is the audit that
    says WHICH sub-space to retrain, where pq_distortion_report says
    by how much reconstruction suffers.

    Codebook training is the shared integer-exact pq_subcentroids;
    code assignment COMPOSES operators/similarity.pq_codes — the same
    encoder column the ADC scan and distortion report read, so the
    "same codebooks, same codes" cross-check holds by construction
    (r14 self-review: a first draft re-implemented the argmin loop).
    Counts are exact longs; Σs² ≤ n² = 4e6 at sf0.1 (the audited
    int→double ceiling); share and imbalance are single fixed double
    chains.

    Scale shape: encoding is a zero-shuffle projection against
    literal codebooks; one |m|·|ksub|-group aggregate; per-subspace
    rollup on the 8-row grid.
    """
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        pq_codes,
        pq_subcentroids,
    )

    m, ksub, dim = 8, 16, 64
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_vec("embedding", "v"))
    cents = pq_subcentroids(vecs, m=m, ksub=ksub, dim=dim)
    stacked = vecs.select(
        F.posexplode(pq_codes(cents)).alias("subspace", "code")
    )
    sizes = stacked.groupBy("subspace", "code").agg(F.count("*").alias("s"))
    return (
        sizes.groupBy("subspace")
        .agg(
            F.count("*").alias("n_codes_used"),
            F.sum("s").alias("n_total"),
            F.sum(F.col("s") * F.col("s")).alias("ss"),
            F.max("s").alias("s_max"),
        )
        .select(
            F.col("subspace").cast("int").alias("subspace"),
            F.col("n_codes_used").cast("long").alias("n_codes_used"),
            (
                (F.lit(ksub) * F.col("ss")).cast("double")
                / (F.col("n_total") * F.col("n_total")).cast("double")
            ).alias("imbalance_factor"),
            (
                F.col("s_max").cast("double") / F.col("n_total").cast("double")
            ).alias("max_code_share"),
        )
    )


def ann_ivf_pq_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the two quantizers of the IVF-PQ index agree on
    neighborhood structure? — the IVF cell (coarse routing) ×
    sub-space-0 PQ code (fine residual-free codebook) contingency,
    summarized per cell and by Goodman-Kruskal λ (VERDICT r14 'Next
    round' #2: the mutual-information variant re-expressed
    TRANSCENDENTAL-FREE per the Math.log house rule — λ is the
    proportional reduction in error predicting the PQ code from the
    IVF cell: λ = (Σ_cell max_code(O) − max_code_marginal) /
    (N − max_code_marginal), pure integer numerator and denominator,
    ONE division). λ = 0 means the codebooks quantize independent
    directions (bits well spent); λ → 1 means the first PQ sub-space
    re-encodes the coarse cell (wasted bits — retrain or re-slice).

    Per-cell rows: occupancy, distinct codes used, the modal code and
    its count (ties break to the smallest code, matching the SQL
    min-among-max). Composes the SHARED encoders — assign_cells over
    ivf_centroids and operators/similarity.pq_codes over
    pq_subcentroids — so the contingency reads the exact same cell
    and code columns the ADC scan, distortion report, and code
    balance audit read (the r14 'same codebooks, same codes'
    discipline).

    Scale shape: both encodings are zero-shuffle projections against
    literal codebooks (centroid training collects k·dim bounded
    rows), stacked in ONE projection over ONE corpus scan —
    assign_cells keeps the raw vector, so the sub-space-0 code
    computes on its output instead of a second embeddings branch (a
    first draft joined two branches and let Catalyst re-embed the
    scan 6×; the r14 plan-census lesson). The 16×16 grid MATERIALIZES
    (≤ 256 rows) so its three consumers (per-cell rollup, column
    marginal, λ scalars) never re-run the encoding.
    """
    from hrfco_data_pipeline_spark.operators.dedup import _materialized
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        assign_cells,
        ivf_centroids,
        pq_codes,
        pq_subcentroids,
    )
    from hrfco_data_pipeline_spark.sources.tables import (
        parallelize_small_scan,
    )

    n_cells, m, ksub, dim = 16, 8, 16, 64
    emb = load_table(spark, sf_dir, "embeddings")
    # r17 (guide §2.5): the single-row-group embeddings file scans as
    # ONE task, so every Lloyd/PQ iteration's per-vector distance pass
    # ran serially (REST stage profile: 0.4–1.2 s single-task stages,
    # ~4 s total). The vector frame is ~1 MB — spread it once and every
    # downstream per-row kernel runs at full parallelism; no-ops at
    # real scale.
    vecs = parallelize_small_scan(
        emb.select("vec_id", as_double_vec("embedding", "v"))
    )
    cents = ivf_centroids(vecs, n_centroids=n_cells, dim=dim)
    pq_cents = pq_subcentroids(vecs, m=m, ksub=ksub, dim=dim)
    enc = assign_cells(vecs, cents).select(
        "vec_id",
        "cell",
        F.element_at(pq_codes(pq_cents), 1).alias("code"),
    )
    grid = _materialized(
        enc.groupBy("cell", "code").agg(F.count("*").alias("o"))
    )
    per_cell = grid.groupBy("cell").agg(
        F.sum("o").alias("n_vecs"),
        F.count("*").alias("n_codes_used"),
        F.max(F.struct(F.col("o"), (-F.col("code")).alias("nc"))).alias(
            "top"
        ),
    )
    col_marg = grid.groupBy("code").agg(F.sum("o").alias("cn"))
    glob = per_cell.agg(
        F.sum("n_vecs").alias("n_total"),
        F.sum(F.col("top")["o"]).alias("sum_modal"),
    ).crossJoin(F.broadcast(col_marg.agg(F.max("cn").alias("max_col"))))
    lam = F.when(
        F.col("n_total") > F.col("max_col"),
        (F.col("sum_modal") - F.col("max_col")).cast("double")
        / (F.col("n_total") - F.col("max_col")).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        per_cell.crossJoin(F.broadcast(glob))
        .select(
            F.col("cell").cast("int").alias("cell"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("n_codes_used").cast("long").alias("n_codes_used"),
            (-F.col("top")["nc"]).cast("int").alias("top_code"),
            F.col("top")["o"].cast("long").alias("top_code_n"),
            F.col("n_total").cast("long").alias("n_total"),
            F.round(lam, 4).alias("lambda_cell_to_code"),
        )
    )


def multimodal_patch_energy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch-energy concentration profile per image-like blob: the
    Rényi-2 (collision) concentration of the energy distribution
    across the 8×8 patch grid — imbalance = n·Σe²/(Σe)² (≥ 1;
    1 = perfectly even placement, the IVF-occupancy convention) plus
    the hottest patch's share. A blank or vignetted payload
    concentrates energy (high imbalance), sensor noise spreads it.
    The 2-D sibling of multimodal_bytes_entropy: that one profiles
    BYTE VALUES within a blob, this one profiles ENERGY PLACEMENT
    across the patch grid — the QA pair a ViT-style ingest runs
    before spending decode/embed compute. Composes the certified
    image_patches fan-out (Arrow mapInPandas; 32-byte rows, 8×8
    patches).

    Exactness: TRANSCENDENTAL-FREE by design. A Shannon-entropy first
    draft split the driver hash by one ulp: JVM Math.log(x) is NOT
    correctly rounded for all arguments (measured: x = 6194/24170
    differs from glibc/DuckDB ln by 1 ulp — SCALE.md §r14), so the
    concentration statistic is the Rényi-2 collision form instead —
    patch energies are exact integer byte sums, n·Σe² and (Σe)² are
    exact longs (≤ ~1e10 per doc at any text size that fits the blob
    fixture), and the imbalance/share are one double division each.

    Scale shape: the patch fan-out happens inside the Arrow batch (no
    shuffle); one doc-keyed map-side-combined aggregate of three
    integer sums. No collected arrays, no driver actions.
    """
    from hrfco_data_pipeline_spark.operators.multimodal import (
        image_patches,
        to_multimodal,
    )

    docs = load_table(spark, sf_dir, "documents")
    pat = image_patches(
        to_multimodal(docs, modality="image-blob"), width=32, patch=8
    )
    agg = pat.groupBy("doc_id").agg(
        F.count("*").alias("n_patches"),
        F.sum("energy").alias("e_tot"),
        F.sum(F.col("energy") * F.col("energy")).alias("ss"),
        F.max("energy").alias("e_max"),
    )
    return agg.select(
        "doc_id",
        F.col("n_patches").cast("long").alias("n_patches"),
        F.col("e_tot").cast("long").alias("total_energy"),
        F.when(
            F.col("e_tot") > 0,
            (F.col("n_patches") * F.col("ss")).cast("double")
            / (F.col("e_tot") * F.col("e_tot")).cast("double"),
        ).alias("energy_imbalance"),
        F.when(
            F.col("e_tot") > 0,
            F.col("e_max").cast("double") / F.col("e_tot").cast("double"),
        ).alias("max_patch_share"),
    )


def dedup_token_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAGED for the r16 head (docs/ROUND15.md candidate list; not
    yet registered): the dedup threshold decision priced in KEPT
    TRAINING TOKENS rather than document counts — per Jaccard rung
    {0.3, 0.5, 0.7}, the component-closure keep policy's surviving
    corpus size in exact whitespace tokens, next to the doc counts.
    Two thresholds that drop similar doc counts can retire very
    different token volumes (near-dup clusters skew long); this is
    the capacity-planning face the budget decision actually needs.

    Composition: the certified banded/hot-capped pair table builds
    ONCE (docs_ngram_jaccard_pairs materializes); one (doc_id, n_tok)
    projection MATERIALIZES for its four consumers (corpus totals +
    three per-rung dropped-set joins); per rung, ONE pointer-jumping
    CC on the monotonically shrinking pair graph (pairs, never docs)
    and a doc_id-keyed join of the dropped set back to token counts.
    All counts exact longs; kept_token_share is one IEEE division.

    Non-vacuous by construction at every SF: the 0.3 rung's pair
    graph is non-empty wherever the certified chaining sweep's is.
    """
    from hrfco_data_pipeline_spark.operators.dedup import (
        _materialized,
        connected_components,
    )

    thresholds = [0.3, 0.5, 0.7]
    docs = _materialized(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.size(_tokens()).cast("long").alias("n_tok")
        )
    )
    totals = docs.agg(
        F.count("*").cast("long").alias("n_docs_total"),
        F.sum("n_tok").cast("long").alias("tokens_total"),
    )
    pairs = docs_ngram_jaccard_pairs(spark, sf_dir)
    per_rung = []
    for t in thresholds:
        comp = connected_components(
            pairs.filter(F.col("jaccard") >= t),
            "doc_a",
            "doc_b",
            distinct_pairs=True,
        )
        dropped = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        per_rung.append(
            dropped.join(docs, "doc_id").agg(
                F.lit(t).alias("threshold"),
                F.count("*").cast("long").alias("n_docs_dropped"),
                F.coalesce(F.sum("n_tok"), F.lit(0))
                .cast("long")
                .alias("tokens_dropped"),
            )
        )
    curve = per_rung[0]
    for df in per_rung[1:]:
        curve = curve.unionByName(df)
    out = curve.crossJoin(F.broadcast(totals))
    kept_docs = F.col("n_docs_total") - F.col("n_docs_dropped")
    kept_toks = F.col("tokens_total") - F.col("tokens_dropped")
    return out.select(
        F.col("threshold").cast("double").alias("threshold"),
        "n_docs_total",
        "n_docs_dropped",
        kept_docs.cast("long").alias("n_docs_kept"),
        "tokens_total",
        "tokens_dropped",
        kept_toks.cast("long").alias("tokens_kept"),
        F.round(
            kept_toks.cast("double") / F.col("tokens_total").cast("double"),
            6,
        ).alias("kept_token_share"),
    )


def embedding_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAGED for the r16 head (docs/ROUND15.md candidate list; not
    yet registered): Johnson-Lindenstrauss distortion audit of the
    certified Achlioptas projection — does the 8-component sketch
    preserve pairwise geometry well enough for the dedup/ANN indexes
    built on it? Over the deterministic consecutive-pair sample
    (vec 2k with vec 2k+1 — no sampling RNG, no pair explosion), the
    normalized squared-distance ratio r = ||p(a)−p(b)||² /
    (8·||a−b||²) — expectation 1 under the JL lemma — nano-quantized
    and rolled into 0.25-wide histogram bands with exact min/max/sum
    per band. A projection bug (wrong sign hash, dropped component,
    broken scale) moves the whole histogram; heavy tails mean the
    8-dim sketch is too coarse for the corpus.

    Exactness: both distance folds are index-ordered IEEE chains
    mirrored op-for-op in DuckDB (the projection's own oracle
    convention); the ratio is the two-division left chain on
    identical operands; floor(r·1e9) is exact; band arithmetic is
    integer. sum_ratio_nano ≤ n_pairs·O(5e9) ≈ 2.5e13 at sf0.1 —
    three orders under 2^53 (audited ceiling class). Zero-distance
    originals (exact duplicate vectors) are excluded — r is
    undefined there and the dedup family owns that case.

    Scale shape: the projected-plus-raw frame MATERIALIZES once (at
    100 TB this is the projection table you persist anyway); the
    pair join is vec_id-adjacent (equi-join on vec_id+1, no
    fan-out); the rollup is a bounded 13-band grid.
    """
    from hrfco_data_pipeline_spark.operators.dedup import _materialized
    from hrfco_data_pipeline_spark.operators.similarity import (
        as_double_vec,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", as_double_vec("embedding", "v"))
    proj = _materialized(
        v.select(
            "vec_id",
            "v",
            *[
                _achlioptas_component("v", j).alias(f"p{j}")
                for j in range(8)
            ],
        )
    )
    a, b = proj.alias("a"), proj.alias("b")
    pairs = a.join(
        b,
        (F.col("a.vec_id") % 2 == 0)
        & (F.col("b.vec_id") == F.col("a.vec_id") + 1),
    )
    d = F.size(F.col("a.v"))
    ea = lambda i: F.element_at(F.col("a.v"), (i + 1).cast("int"))  # noqa: E731
    eb = lambda i: F.element_at(F.col("b.v"), (i + 1).cast("int"))  # noqa: E731
    d2o = F.aggregate(
        F.sequence(F.lit(0), d - 1),
        F.lit(0.0),
        lambda acc, i: acc + (ea(i) - eb(i)) * (ea(i) - eb(i)),
    )
    d2p = None
    for j in range(8):
        term = (F.col(f"a.p{j}") - F.col(f"b.p{j}")) * (
            F.col(f"a.p{j}") - F.col(f"b.p{j}")
        )
        d2p = term if d2p is None else d2p + term
    staged = pairs.select(
        d2o.alias("d2o"), d2p.alias("d2p")
    ).filter(F.col("d2o") > 0.0)
    ratio_nano = F.floor(
        F.col("d2p") / F.col("d2o") / F.lit(8.0) * F.lit(1e9)
    ).cast("long")
    banded = staged.select(
        ratio_nano.alias("rn"),
        # explicit floor in BOTH engines: Spark's double->long cast
        # truncates while DuckDB's ROUNDS — floor() is the one form
        # they share (positives only here)
        F.least(
            F.floor(ratio_nano / F.lit(250_000_000.0)), F.lit(12)
        ).cast("int").alias("band"),
    )
    return banded.groupBy("band").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("rn").alias("min_ratio_nano"),
        F.max("rn").alias("max_ratio_nano"),
        F.sum("rn").alias("sum_ratio_nano"),
    )
