"""Property-based parity: java_double == Java Double.parseDouble rules.

The reference pins a handful of examples (WaterLevelDataTest); this
fuzzes the whole input grammar — signs, dots, exponents, [fFdD]
suffixes, hex floats, NaN/Infinity, blank padding, garbage — against a
Python reference implementation of Java's parse rules.
"""

from __future__ import annotations

import math
import re

from hypothesis import given, settings, strategies as st

from hrfco_data_pipeline_spark.functions import java_double

_DEC = r"(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?"
_HEX = r"0[xX]([0-9a-fA-F]+\.?[0-9a-fA-F]*|\.[0-9a-fA-F]+)[pP][+-]?\d+"
_PAT = re.compile(rf"^[+-]?({_DEC}|{_HEX})[fFdD]?$")


def java_parse(s: str | None) -> float | None:
    """Python twin of the reference's coercion (trim → blank→null →
    Double.parseDouble → failure→null). Java-specific: exact-case
    NaN/Infinity, no underscores, [fFdD] suffixes, hex-float p-notation."""
    if s is None:
        return None
    t = s.strip(" ")
    if t == "":
        return None
    body, sign = t, 1.0
    if body[:1] in "+-":
        sign, body = (-1.0 if body[0] == "-" else 1.0), body[1:]
    if body == "NaN":
        return math.nan
    if body == "Infinity":
        return sign * math.inf
    if not _PAT.match(t):
        return None
    core = t[:-1] if t[-1] in "fFdD" else t
    if "x" in core.lower():
        try:
            return float.fromhex(core)
        except OverflowError:
            # Java parseDouble rounds oversized hex exponents to ±Infinity;
            # float.fromhex raises instead
            return sign * math.inf
    return float(core)


_pieces = st.sampled_from(
    ["", "+", "-", "0", "1", "9", "12", "007", ".", "e", "E", "e5", "e-3",
     "E+10", "d", "f", "D", "F", "NaN", "Infinity", "inf", "nan", "0x1p3",
     "0x", "p3", " ", "  ", "abc", "_", "1_0", ",", "1.5", ".5", "5.",
     "e999", "1e999", "1e-999", "0x1p3007", "-0x1p3007", "0x1p-3007"]
)
_numeric_strings = st.lists(_pieces, min_size=0, max_size=4).map("".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(_numeric_strings, min_size=64, max_size=64))
def test_java_double_grammar_parity(spark, batch):
    df = spark.createDataFrame([(v,) for v in batch], "v string")
    got = [r.d for r in df.select(java_double("v").alias("d")).collect()]
    for inp, g in zip(batch, got):
        want = java_parse(inp)
        if want is None or g is None:
            assert g is None and want is None, (inp, g, want)
        elif math.isnan(want):
            assert math.isnan(g), (inp, g)
        else:
            assert g == want, (inp, g, want)
