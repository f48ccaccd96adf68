"""Property tests for the ranked_cumsum / int_ntile MATH (pure Python
mirrors of the column expressions — no Spark session, so hypothesis can
hammer the edge cases; engine equivalence itself is pinned by
tests/test_ranking.py against F.row_number/F.ntile)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st


def _int_ntile(rank: int, n: int, k: int) -> int:
    # mirror of operators/ranking.int_ntile
    q, r = n // k, n % k
    big = q + 1
    cut = r * big
    if rank <= cut:
        return math.ceil(rank / big)
    return r + math.ceil((rank - cut) / max(q, 1))


def _reference_ntile(n: int, k: int) -> list[int]:
    # the standard: first n % k tiles get ceil(n/k) rows, rest floor
    q, r = n // k, n % k
    tiles = []
    for t in range(1, k + 1):
        tiles.extend([t] * ((q + 1) if t <= r else q))
    return tiles


@given(st.integers(1, 2000), st.integers(1, 64))
@settings(max_examples=300, deadline=None)
def test_int_ntile_matches_standard_definition(n, k):
    want = _reference_ntile(n, k)
    got = [_int_ntile(rank, n, k) for rank in range(1, n + 1)]
    assert got == want


@given(
    st.lists(st.integers(-50, 50), min_size=1, max_size=300),
    st.lists(st.integers(-50, 50), max_size=10),
)
@settings(max_examples=200, deadline=None)
def test_bucketed_rank_is_boundary_invariant(values, raw_bounds):
    """Any monotone bucketing (count of boundaries strictly below the
    key) + per-bucket rank + prior-bucket offsets must reconstruct the
    exact global rank — the invariant that makes ranked_cumsum's
    sampled boundaries correctness-neutral."""
    bounds = sorted(set(raw_bounds))
    rows = sorted(
        [(v, i) for i, v in enumerate(values)]
    )  # total order: (value, uid)
    global_rank = {row: r + 1 for r, row in enumerate(rows)}

    def pid(v):
        return sum(1 for b in bounds if b < v)

    buckets: dict[int, list] = {}
    for row in rows:
        buckets.setdefault(pid(row[0]), []).append(row)
    # ties never straddle buckets
    for row in rows:
        assert all(
            pid(other[0]) == pid(row[0])
            for other in rows
            if other[0] == row[0]
        )
    offset = 0
    for p in sorted(buckets):
        for local_rank, row in enumerate(sorted(buckets[p]), start=1):
            assert offset + local_rank == global_rank[row]
        offset += len(buckets[p])
