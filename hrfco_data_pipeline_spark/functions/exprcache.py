"""Build-once cache for CONSTANT unresolved Column expression trees.

Every ``F.col``/``F.when``/``F.lit`` call is one py4j round trip; the
hydrology classify chain alone is ~4,000 of them (~0.8 s measured per
DataFrame build on the r16 profile box), re-paid by EVERY query that
composes the chain, on every run. The trees are pure functions of
column NAMES and literals — no data, no DataFrame, no session state —
so they are built once per JVM and reused; Spark Columns are immutable
unresolved expressions designed for exactly this reuse.

This caches EXPRESSIONS ONLY — never DataFrames, plans over data, or
results. Every query still builds its own plan and recomputes from the
parquet inputs on every action.

Entries are keyed by a monotonically assigned per-SparkContext token
(NOT ``id(sc)``, which CPython can reuse after a stopped context is
garbage-collected — r16 verdict item 8) so a restarted JVM (stale java
object refs) can never serve a previous gateway's objects; old entries
leak harmlessly (a handful of Column wrappers).
"""

from __future__ import annotations

import itertools
from typing import Any, Callable

from pyspark import SparkContext

_CACHE: dict = {}
_TOKENS = itertools.count()


def _context_token(sc: Any) -> Any:
    """A token unique to this SparkContext *instance*: stored as an
    attribute on the Python wrapper object, so it dies with the object
    and a recycled ``id()`` can never alias a dead context's entries.
    No py4j round trip."""
    if sc is None:
        return None
    tok = sc.__dict__.get("_exprcache_token")
    if tok is None:
        tok = next(_TOKENS)
        sc._exprcache_token = tok
    return tok


def cached_exprs(key: Any, builder: Callable[[], Any]) -> Any:
    """Return ``builder()``, built at most once per (SparkContext, key).

    ``builder`` must construct only unresolved Column expressions (or
    containers of them) from literals and column names."""
    sc = SparkContext._active_spark_context
    full = (_context_token(sc), key)
    val = _CACHE.get(full)
    if val is None:
        # benign double-build under a race; the dict write is atomic
        val = builder()
        _CACHE[full] = val
    return val
