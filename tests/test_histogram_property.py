"""Property tests for the mergeable-histogram quantile estimator.

The DuckDB oracle pins exact engine parity; these pin the MATH of the
estimator itself on adversarial inputs: the estimate's error is
bounded by one bin width, and the partials are truly mergeable
(hist(A ∪ B) computed from per-shard partials equals the single-pass
histogram) — the property that makes it a safe stored rollup.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st


def _hist(values, n_bins=512):
    h = {}
    for v in values:
        b = min(int(math.floor(v)), n_bins - 1)
        h[b] = h.get(b, 0) + 1
    return h


def _quantile_est(h, q):
    total = sum(h.values())
    t = q * total
    cum = 0
    for b in sorted(h):
        prev = cum
        cum += h[b]
        if cum >= t:
            return b + (t - prev) / h[b]
    raise AssertionError("quantile beyond histogram")


_values = st.lists(
    st.floats(min_value=0.0, max_value=511.999, allow_nan=False),
    min_size=1,
    max_size=400,
)


@settings(max_examples=50, deadline=None)
@given(_values)
def test_estimate_within_one_bin_of_exact(vals):
    for q in (0.5, 0.9, 0.99):
        est = _quantile_est(_hist(vals), q)
        s = sorted(vals)
        # exact lower/upper interpolated quantile bracket
        idx = q * len(s)
        lo = s[max(0, min(len(s) - 1, math.ceil(idx) - 1))]
        # unit-width bins: estimator stays within one bin of the exact
        # order statistic it brackets
        assert abs(est - lo) <= 1.0 + 1e-9


@settings(max_examples=50, deadline=None)
@given(_values, _values)
def test_partials_merge_exactly(a, b):
    merged = _hist(a + b)
    ha, hb = _hist(a), _hist(b)
    summed = dict(ha)
    for k, v in hb.items():
        summed[k] = summed.get(k, 0) + v
    assert summed == merged
    # and the quantile read off merged partials equals the single-pass
    for q in (0.5, 0.9, 0.99):
        assert _quantile_est(summed, q) == _quantile_est(merged, q)
