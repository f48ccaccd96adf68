"""Skew-resistant join: explicit key salting.

At 100 TB a handful of hot keys (one viral order, one mega-customer,
one empty-string default) can put >10 GB behind a single shuffle key —
one straggler task owns the join. AQE's skew-join split handles the
SORT-merge case after the fact; explicit salting is the planable,
engine-portable fix that also works for hash joins, works under
``spark.sql.adaptive.enabled=false``, and keeps the partition count
honest in the shuffle-write stage (AQE only splits on the read side).

Mechanics: the big (skewed) side scatters each key across ``salt``
sub-keys by hashing a high-cardinality column; the small side is
replicated ``salt`` times (one copy per sub-key) so every scattered
row still finds its match. The join result is row-for-row identical
to the unsalted join — salting only changes WHERE rows meet, never
WHICH rows meet. Replication multiplies the small side by ``salt``,
so this is for moderate dims (too big or too risky to broadcast, small
enough that salt× copies beat one straggler); for tiny dims just
``F.broadcast``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    scatter_on: Column,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``big_key == small_key``,
    scattering the big side over ``salt`` sub-keys.

    ``scatter_on`` must be a high-cardinality DETERMINISTIC column of
    ``big`` (a row id, not ``rand()``): re-executed tasks must land
    every row in the same sub-key or an exchange retry double-counts.
    Output columns = join output minus the internal salt columns.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    allowed = {
        "inner",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "left_anti",
        "leftanti",
    }
    if how.lower() not in allowed:
        # right/full joins would emit every UNMATCHED small-side row
        # once per replica (salt× duplicates) — no way to dedup them
        # without a second shuffle, so refuse instead of corrupting
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got {how!r}"
        )
    b = big.withColumn("_salt", F.pmod(F.xxhash64(scatter_on), F.lit(salt)))
    s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>")),
    )
    joined = b.join(
        s.hint("shuffle_hash"),
        (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]),
        how,
    )
    return joined.drop("_salt")
