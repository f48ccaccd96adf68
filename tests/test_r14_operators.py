"""Round-14 operators: streaming↔batch parity certificates for the
BM25 index, KMV sketch, and hash-sample quantile maintainers.

Each certificate serves its report FROM THE STREAMING STORE next to a
matches-batch-face flag; these tests pin (a) the positive path — a
correctly-built store reads all-true — and (b) NON-VACUOUSNESS: a
tampered store (double-applied batch / shifted hashes) flips the flag,
so the green driver row certifies real parity, not a constant TRUE
(the r13 cms/psi tampered-store convention).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"


def test_bm25_parity_flag_flips_on_tampered_index(spark, tmp_path):
    """Double-appended postings double tf AND df — every score and the
    flag must break; the exactly-once store reads all-true."""
    from hrfco_data_pipeline_spark.plans.llm import (
        bm25_parity_report,
        bm25_postings,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import _append_merge

    docs = load_table(spark, SF, "documents")
    table = str(tmp_path / "store")
    _append_merge(spark, table, bm25_postings(docs), 0)
    ok = bm25_parity_report(spark, SF, table).collect()
    assert ok and all(r.matches_batch_face for r in ok)

    _append_merge(spark, table, bm25_postings(docs), 1)  # double-apply
    bad = bm25_parity_report(spark, SF, table).collect()
    assert not all(r.matches_batch_face for r in bad)


def test_kmv_parity_flag_flips_on_shifted_hashes(spark, tmp_path):
    """Bottom-k union dedups identical hashes, so a replayed partial is
    a no-op BY DESIGN — the tamper that must flip the flag is a
    corrupted partial (shifted hashes change the kth statistic)."""
    from hrfco_data_pipeline_spark.plans.relational import (
        kmv_parity_report,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import (
        _append_merge,
        kmv_batch_partials,
    )

    ev = load_table(spark, SF, "events")
    table = str(tmp_path / "store")
    _append_merge(spark, table, kmv_batch_partials(ev, 0), 0)
    ok = kmv_parity_report(spark, SF, table).collect()
    assert ok and all(r.matches_batch_face for r in ok)

    # replayed identical partial: lossless merge means still all-true
    _append_merge(spark, table, kmv_batch_partials(ev, 1), 1)
    still = kmv_parity_report(spark, SF, table).collect()
    assert still and all(r.matches_batch_face for r in still)

    # corrupted partial: every hash shifted down by 1 — new minima
    corrupt = kmv_batch_partials(ev, 2).withColumn(
        "h", F.greatest(F.col("h") - 1, F.lit(0))
    )
    _append_merge(spark, table, corrupt, 2)
    bad = kmv_parity_report(spark, SF, table).collect()
    assert not all(r.matches_batch_face for r in bad)


def test_qsample_parity_flag_flips_on_double_applied_batch(spark, tmp_path):
    """A double-appended sample duplicates rows: n_sample doubles and
    every discrete rank shifts — the flag must flip."""
    from hrfco_data_pipeline_spark.plans.relational import (
        qsample_parity_report,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table
    from hrfco_data_pipeline_spark.streaming.curation import (
        _append_merge,
        quantile_sample_batch,
    )

    ev = load_table(spark, SF, "events")
    table = str(tmp_path / "store")
    _append_merge(spark, table, quantile_sample_batch(ev, 0), 0)
    ok = qsample_parity_report(spark, SF, table).collect()
    assert ok and all(r.matches_batch_face for r in ok)

    _append_merge(spark, table, quantile_sample_batch(ev, 1), 1)
    bad = qsample_parity_report(spark, SF, table).collect()
    assert not all(r.matches_batch_face for r in bad)


def test_bm25_streaming_certificate_end_to_end(spark):
    """The full availableNow certificate run at sf0.001: real file
    micro-batches through bm25_index_stream, served from the store —
    every row true (the driver-shaped positive path)."""
    from hrfco_data_pipeline_spark.plans.llm import stream_batch_bm25_parity

    rows = stream_batch_bm25_parity(spark, SF).collect()
    assert rows and all(r.matches_batch_face for r in rows)
