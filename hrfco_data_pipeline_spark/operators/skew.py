"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join handling covers sort-merge joins at runtime; these
helpers cover the cases it doesn't — skewed groupBy keys (one reducer
drowning) and broadcast-averse skewed equi-joins — with the classic
salting rewrite. Used explicitly when a key's share of rows is known to
be pathological (e.g. a null-bucket or a celebrity key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], buckets: int, seed: int = 7) -> Column:
    """Deterministic row salt in [0, buckets).

    ``F.rand`` is only deterministic per partition-id, so AQE re-plans,
    task retries, or a different input split re-deal the salts;
    ``pmod(xxhash64(cols…, seed), buckets)`` depends on row *content*
    only — fully reproducible. Hashing non-key attribute columns (or
    a unique id) still spreads a hot key's rows across buckets.
    """
    return F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(buckets)).cast("int")


def salted_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 16
) -> DataFrame:
    """groupBy count resilient to skewed keys.

    Phase 1 groups on (keys, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 sums the partials per key. Same
    result as a plain count, bounded per-task input. The salt hashes
    ALL columns, so rows of a hot key scatter by their attributes.
    """
    salted = df.withColumn("__salt", _salt(df.columns, salt_buckets))
    partial = salted.groupBy(*keys, "__salt").agg(F.count("*").alias("__n"))
    return partial.groupBy(*keys).agg(F.sum("__n").alias("n"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where `big` has skewed keys and `small` is too large to
    broadcast: salt the big side, explode the small side across all
    salt values, join on (key, salt). Row multiplicity is preserved —
    each big row joins exactly one replica of its small-side match.
    """
    big_s = big.withColumn("__salt", _salt(big.columns, salt_buckets))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")
