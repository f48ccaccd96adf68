"""Optimizer barriers for pathological plan rewrites.

``no_pushdown`` wraps a column in a nondeterministic IDENTITY
(``element_at(shuffle(array(c)), 1)`` — a one-element array shuffle is
the identity, but ``shuffle`` is flagged nondeterministic), so a filter
built on it cannot be pushed down or used for constraint inference,
while its VALUE — and therefore the query result — stays fully
deterministic.

Why this exists: PushDownPredicates substitutes project aliases into
predicates with no cost model. When a filter references a column whose
definition is an expensive derived expression (a timestamp parse, a
regex coercion, a formatter), pushing it below the projection — and
below any Repartition — re-inlines the whole derivation tree into the
scan-stage filter, where it is re-evaluated per scan row in addition
to the projection's own evaluation. On hydro.resample_10min at sf0.1
this doubled the per-row parse work inside the single-split scan task
and was worth ~2 s of the ~4 s warm time (measured r6); at cluster
scale the same rewrite costs ×2 CPU on the whole parse chain.

Use it ONLY for filters whose predicate is expensive-derived AND whose
selectivity at the scan would not save meaningful I/O (the rows are
kept in memory either way). For filters on stored columns, pushdown
is what you want — never shield those.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def no_pushdown(col: Column) -> Column:
    """Identity on ``col`` that predicate pushdown cannot move or
    duplicate (see module docstring)."""
    return F.element_at(F.shuffle(F.array(col)), 1)
