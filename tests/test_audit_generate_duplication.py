"""The size(gen)+explode(gen) fused-projection detector
(tools/audit_antipatterns.generate_duplication_flags).

Regression harness for the r12 docs_crosssnap_containment incident
(SCALE.md §r12): projecting size(E) next to explode(E) for an
expensive array expression E fuses into one projection that evaluates
E per output row on BOTH faces of the Generate boundary — 162 s at
sf0.1 for 108 probe docs, either face alone ~2 s. The audit must flag
the pathological plan and stay silent on the materialized-child fix.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from tools.audit_antipatterns import generate_duplication_flags  # noqa: E402


def _expensive_array(col):
    """A winnowing-style nested array expression, large enough to clear
    the detector's cheap-expression floor when printed in a plan."""
    toks = F.split(F.trim(col), r"\s+")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 4, F.lit(1))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, F.lit(5)))),
    )
    # window-min over gram hashes — the crosssnap fingerprint shape
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(grams) - 3, F.lit(1))),
            lambda i: F.array_min(F.slice(grams, i, F.lit(4))),
        )
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flags_crosssnap_first_draft_shape(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "k l m n o p q r s t")],
        "doc_id long, text string",
    )
    fps = _expensive_array(F.col("text"))
    bad = docs.select(
        "doc_id", F.size(fps).alias("n_fps"), F.explode(fps).alias("fp")
    )
    flags = generate_duplication_flags(_plan(bad))
    assert flags, "fused size(E)+explode(E) plan must be flagged"
    assert all(f.startswith("generate-duplicated-expression") for f in flags)


def test_silent_on_materialized_child(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "k l m n o p q r s t")],
        "doc_id long, text string",
    )
    fps = _expensive_array(F.col("text"))
    staged = docs.select("doc_id", fps.alias("fps"))
    # n_fps derived from the exploded rows (the shipped fix) — the
    # Generate consumes an attribute reference, nothing re-evaluates E
    good = staged.select(
        "doc_id", F.size("fps").alias("n_fps"), F.explode("fps").alias("fp")
    )
    assert generate_duplication_flags(_plan(good)) == []


def test_silent_on_plain_cheap_explode(spark):
    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    out = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    assert generate_duplication_flags(_plan(out)) == []
