"""Fragility pins for the r3-era log2 queries (VERDICT r8 item 4).

Spark's ``LOG2`` evaluates ``ln(x)/ln(2)`` and lands 1 ulp off the
correctly-rounded true log2 (DuckDB/Python) for ~31% of arguments
(measured r8, ``docs/ROUND8.md``). ``docs_token_entropy`` and
``docs_bigram_perplexity`` stay hash-green only because their outputs
pass through 4-decimal rounding, and ``docs_nb_lang_classifier``
because its per-document argmax has slack between language scores. A
future data regeneration could land a value within 1 ulp of a rounding
edge (or two language scores within 1 ulp of each other) and flip a
driver hash bit without any code change.

These tests make that luck measurable: at the certification scale
(sf0.01) every pre-rounded double must sit FAR (>= 64 ulp — the edge
grid spacing is 5e-5, so a failure means a genuinely adversarial
value, while 64 ulp comfortably covers the fold's accumulated 1-ulp
drift) from the nearest 0.00005 rounding edge, and every NB argmax
must win by a wide relative margin. DuckDB alone suffices: the driver
compares Spark to DuckDB, and Spark's value lies within a few ulp of
DuckDB's, so a DuckDB value 64 ulp clear of an edge cannot round
differently on the Spark side.

If a regeneration ever trips these pins, the fix is to migrate the
score forms to rational/integer-exact arithmetic (the docs_bm25_topk
pattern), not to widen the margins.
"""

from __future__ import annotations

import math
import os
from fractions import Fraction

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"
MARGIN_ULPS = 64


@pytest.fixture(scope="module")
def con():
    from hrfco_data_pipeline_spark.sources.tables import TABLES

    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return c


def strip_round4(sql: str) -> str:
    """Remove every ``round(X, 4)`` wrapper (paren-matching on the
    nested expression) so the oracle emits the pre-rounded doubles."""
    out = sql
    while True:
        i = out.find("round(")
        if i < 0:
            return out
        depth, j = 1, i + len("round(")
        while depth:
            if out[j] == "(":
                depth += 1
            elif out[j] == ")":
                depth -= 1
            j += 1
        inner = out[i + len("round(") : j - 1]
        body, sep, digits = inner.rpartition(",")
        assert sep and digits.strip() == "4", (
            "strip_round4 only handles 4-decimal output rounding; "
            f"found round({inner[:60]}...)"
        )
        out = out[:i] + "(" + body + ")" + out[j:]


def edge_distance_ulps(v: float) -> float:
    """Distance (in ulps of v) from v to the nearest 0.00005 rounding
    edge — the points where round(v, 4) changes value. Exact rational
    arithmetic so the measurement itself cannot alias."""
    fv = Fraction(v)
    grid = Fraction(1, 10_000)
    k = (fv / grid).__floor__()
    best = min(
        abs(fv - (Fraction(kk) + Fraction(1, 2)) * grid)
        for kk in (k - 1, k, k + 1)
    )
    return float(best / Fraction(math.ulp(v))) if v else float("inf")


@pytest.mark.parametrize(
    "query,cols",
    [
        # docs_token_entropy was migrated to the log-free
        # docs_token_concentration in r15 (SCALE.md watch list) and no
        # longer belongs here
        ("docs_bigram_perplexity", ["xent_bits"]),
    ],
)
def test_rounded_log2_outputs_clear_of_edges(con, query, cols):
    sql = strip_round4(entry.oracle_sql()[query])
    rows = con.execute(sql).fetchdf()
    checked = 0
    for col in cols:
        for v in rows[col]:
            v = float(v)
            if v == 0.0 or math.isnan(v):
                continue
            d = edge_distance_ulps(v)
            assert d >= MARGIN_ULPS, (
                f"{query}.{col}: value {v!r} sits {d:.1f} ulp from a "
                "0.00005 rounding edge — 1-ulp Spark/DuckDB log2 drift "
                "could flip the 4-decimal rounding; migrate this score "
                "to a rational form (docs_bm25_topk pattern)"
            )
            checked += 1
    assert checked > 0


def test_nb_classifier_argmax_margins(con):
    """The NB confusion matrix is stable only while each document's
    winning language score beats the runner-up by far more than the
    fold's accumulated log2 drift. Assert a wide relative margin on
    the top-2 gap for every document."""
    sql = entry.oracle_sql()["docs_nb_lang_classifier"]
    head, sep, _ = sql.partition("    pred AS (")
    assert sep, "docs_nb_lang_classifier oracle shape changed"
    gap_sql = head + """
    pred AS (
      SELECT doc_id, score, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, m_lang) AS rn
      FROM wp
    )
    SELECT a.doc_id, a.score AS s1, b.score AS s2
    FROM pred a JOIN pred b ON a.doc_id = b.doc_id
    WHERE a.rn = 1 AND b.rn = 2
    """
    rows = con.execute(gap_sql).fetchdf()
    assert len(rows) > 0
    for _, r in rows.iterrows():
        s1, s2 = float(r["s1"]), float(r["s2"])
        gap = abs(s1 - s2)
        scale = max(abs(s1), abs(s2), 1.0)
        assert gap / scale > 1e-9, (
            f"doc {int(r['doc_id'])}: NB top-2 scores {s1!r} vs {s2!r} "
            "are within accumulated log2 drift of each other — the "
            "argmax could flip between engines"
        )
