"""r10 operators: exact KS against a hand-computed two-sample case,
Mann-Whitney identities (tie-free closed form + U-sum), recession
constant on a crafted decay, prefix-dim recall bounds, OOV-rate
conservation, Bloom runtime-filter guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _write_events(spark, tmp_path, rows):
    """(event_id, event_type, value) rows -> a parquet dir shaped like
    the events table (extra cols null)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    full = [(i, None, None, t, v, None) for i, t, v in rows]
    out = str(tmp_path / "events_tbl")
    spark.createDataFrame(full, schema).write.parquet(f"{out}/events.parquet")
    return out


def test_ks_hand_computed_two_sample(spark, tmp_path):
    """a = {1,2,3,4}, b = {3,4,5,6}: D = max|F_a - F_b| = 2/4 = 0.5,
    attained first at value 2 (F_a=0.5, F_b=0). Exact rational."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_ks_two_sample,
    )

    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4])] + [
        (10 + i, "b", float(v)) for i, v in enumerate([3, 4, 5, 6])
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_ks_two_sample(spark, sf).collect()}
    assert got["a"].n_t == 4 and got["a"].n_rest == 4
    assert got["a"].d_stat == 0.5
    assert got["a"].d_at_value == 2.0
    # symmetric for b (same |F| curve)
    assert got["b"].d_stat == 0.5


def test_ks_corpus_invariants(spark):
    from hrfco_data_pipeline_spark.plans.relational import (
        events_ks_two_sample,
    )

    rows = events_ks_two_sample(spark, SF001).collect()
    assert rows
    n_all = {r.n_t + r.n_rest for r in rows}
    assert len(n_all) == 1  # every type sees the same corpus
    for r in rows:
        assert 0.0 <= r.d_stat <= 1.0


def test_mann_whitney_tie_free_closed_form(spark, tmp_path):
    """a = {1,2,3}, b = {4,5,6} (no ties, total separation):
    U_a = 0, U_b = 9 = n_a*n_b, and z_b = -z_a = sqrt(3) under the
    tie-free variance n_a*n_b*(N+1)/12 = 5.25."""
    import math

    from hrfco_data_pipeline_spark.plans.relational import (
        events_mann_whitney,
    )

    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3])] + [
        (10 + i, "b", float(v)) for i, v in enumerate([4, 5, 6])
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in events_mann_whitney(spark, sf).collect()}
    assert got["a"].u_stat == 0.0
    assert got["b"].u_stat == 9.0
    want_z = (9.0 - 4.5) / math.sqrt(3.0 * 3.0 * 7.0 / 12.0)
    assert abs(got["b"].z_score - want_z) < 1e-12
    assert abs(got["a"].z_score + want_z) < 1e-12


def test_mann_whitney_corpus_u_bounds(spark):
    from hrfco_data_pipeline_spark.plans.relational import (
        events_mann_whitney,
    )

    rows = events_mann_whitney(spark, SF001).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.u_stat <= float(r.n_t * r.n_rest)
        assert abs(r.z_score) < 50.0  # finite, sane scale


def test_recession_constant_on_crafted_decay(spark):
    """Invariants at sf0.001: every k strictly in (0, 1) (ratios of a
    strictly falling positive series), steepest <= median, and every
    station with >= 1 recession day appears."""
    from hrfco_data_pipeline_spark.plans.hydro import recession_constant

    rows = recession_constant(spark, SF001).collect()
    assert rows
    for r in rows:
        assert r.n_recessions >= 1
        assert 0.0 < r.k_steepest <= r.k_median < 1.0


def test_prefix_dim_recall_bounds(spark):
    from hrfco_data_pipeline_spark.plans.llm import ann_prefix_dim_recall

    rows = ann_prefix_dim_recall(spark, SF001).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overlap <= 10
        assert r.recall_at_10 == r.n_overlap / 10.0
    # truncation must preserve a meaningful share of neighbours on
    # this corpus (the metric's reason to exist)
    assert sum(r.n_overlap for r in rows) > 0


def test_oov_rate_conservation(spark):
    """Per-segment token counts must sum to the corpus total, and a
    top-1000 vocab over a small corpus covers most occurrences."""
    from hrfco_data_pipeline_spark.plans.llm import _tokens, docs_oov_rate
    from hrfco_data_pipeline_spark.sources.tables import load_table

    rows = docs_oov_rate(spark, SF001).collect()
    assert rows
    total = (
        load_table(spark, SF001, "documents")
        .select(F.explode(_tokens()).alias("t"))
        .count()
    )
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_rate == r.n_oov / r.n_tokens


def test_bloom_prune_no_false_negatives_and_sizing(spark):
    """Bloom guarantees: every exact match passes the filter
    (n_bloom_pass >= n_exact, n_false_pos = pass - exact), and the
    m=2^16/k=3 sizing keeps the FP rate tiny at this key count."""
    from hrfco_data_pipeline_spark.plans.relational import (
        lineitem_bloom_semijoin_prune,
    )

    r = lineitem_bloom_semijoin_prune(spark, SF001).collect()[0]
    assert r.n_dim_keys > 0 and r.n_exact > 0
    assert r.n_bloom_pass >= r.n_exact
    assert r.n_false_pos == r.n_bloom_pass - r.n_exact
    assert r.fp_rate < 0.05


def _py_rank2(vals):
    """Doubled midranks (2R = 2*minrank + ties - 1) for a list."""
    from collections import Counter

    cnt = Counter(vals)
    below = {}
    run = 0
    for v in sorted(cnt):
        below[v] = run
        run += cnt[v]
    return [2 * (below[v] + 1) + cnt[v] - 1 for v in vals]


def test_pettitt_matches_direct_sign_pair_sum(spark):
    """The doubled-midrank identity U_t = W_t - t(n+1) must equal the
    O(n^2) textbook sign-pair sum, station by station, at sf0.001."""
    from hrfco_data_pipeline_spark.plans.hydro import (
        _daily_cents,
        pettitt_changepoint,
    )

    daily = _daily_cents(spark, SF001).collect()
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.station, []).append((r.day, r.s_cents))
    want = {}
    for st, rows in series.items():
        rows.sort()
        xs = [v for _, v in rows]
        n = len(xs)
        if n < 2:
            continue
        best = None
        for t in range(1, n):
            u = sum(
                (xs[i] > xs[j]) - (xs[i] < xs[j])
                for i in range(t)
                for j in range(t, n)
            )
            key = (-abs(u), rows[t - 1][0])
            if best is None or key < best[0]:
                best = (key, (n, abs(u), u, rows[t - 1][0]))
        want[st] = best[1]
    got = {
        r.station: (r.n_days, r.k_stat, r.u_at_k, r.cp_day)
        for r in pettitt_changepoint(spark, SF001).collect()
    }
    assert got == want


def test_crosscorr_matches_python_pearson(spark):
    """Exact sufficient statistics + the fixed num/sqrt(dx*dy) chain
    must reproduce pure-Python integer Pearson bit-for-bit."""
    import math

    from hrfco_data_pipeline_spark.plans.hydro import (
        _daily_cents,
        station_crosscorr,
    )

    daily = _daily_cents(spark, SF001).collect()
    by_st: dict[str, dict] = {}
    for r in daily:
        by_st.setdefault(r.station, {})[r.day] = r.s_cents

    import datetime

    def shift(day: str, lag: int) -> str:
        d = datetime.date(int(day[:4]), int(day[4:6]), int(day[6:8]))
        return (d + datetime.timedelta(days=lag)).strftime("%Y%m%d")

    want = {}
    sts = sorted(by_st)
    for ia, sa in enumerate(sts):
        for sb in sts[ia + 1 :]:
            for lag in (-1, 0, 1):
                pairs = [
                    (v, by_st[sb][shift(d, lag)])
                    for d, v in by_st[sa].items()
                    if shift(d, lag) in by_st[sb]
                ]
                n = len(pairs)
                if n < 25:
                    continue
                sx = sum(x for x, _ in pairs)
                sy = sum(y for _, y in pairs)
                num = n * sum(x * y for x, y in pairs) - sx * sy
                dx = n * sum(x * x for x, _ in pairs) - sx * sx
                dy = n * sum(y * y for _, y in pairs) - sy * sy
                r = (
                    float(num) / math.sqrt(float(dx) * float(dy))
                    if dx > 0 and dy > 0
                    else None
                )
                want[(sa, sb, lag)] = (n, r)
    got = {
        (r.station_a, r.station_b, r.lag): (r.n_days, r.r)
        for r in station_crosscorr(spark, SF001).collect()
    }
    assert got == want
    for (_, _, _), (_, r) in got.items():
        if r is not None:
            assert -1.0 <= r <= 1.0


def test_mann_kendall_matches_direct_pairs(spark):
    """S, tau, and the tie-corrected var18 against a direct pure-Python
    recomputation from the monthly frame at sf0.001."""
    from collections import Counter

    from hrfco_data_pipeline_spark.plans.relational import (
        orders_mann_kendall,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, SF001, "orders")
    monthly = (
        o.groupBy(
            "o_orderpriority",
            (
                (F.year("o_orderdate") - F.lit(1992)) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("m"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("v")
        )
        .collect()
    )
    per_p: dict[str, list] = {}
    for r in monthly:
        per_p.setdefault(r.o_orderpriority, []).append((r.m, r.v))
    want = {}
    for p, rows in per_p.items():
        rows.sort()
        vs = [v for _, v in rows]
        n = len(vs)
        s = sum(
            (vs[j] > vs[i]) - (vs[j] < vs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie18 = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(vs).values()
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie18
        tau = float(s) / (n * (n - 1) / 2)
        want[p] = (n, s, tau, var18)
    got = {
        r.o_orderpriority: (r.n_months, r.s_stat, r.tau, r.var18)
        for r in orders_mann_kendall(spark, SF001).collect()
    }
    assert got == want


def test_spearman_matches_python_rank_pearson(spark):
    """rho per nation against pure-Python doubled-midrank Pearson —
    exact integers until the one final float chain."""
    import math

    from hrfco_data_pipeline_spark.plans.relational import (
        customer_spearman_balance_value,
    )
    from hrfco_data_pipeline_spark.sources.tables import load_table

    cust = load_table(spark, SF001, "customer")
    orders = load_table(spark, SF001, "orders")
    nation = load_table(spark, SF001, "nation")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "y"
        )
    )
    base = (
        cust.join(spend, cust["c_custkey"] == spend["o_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
            "y",
        )
        .collect()
    )
    per_n: dict[str, list] = {}
    for r in base:
        per_n.setdefault(r.nation, []).append((r.x, r.y))
    want = {}
    for nat, pts in per_n.items():
        u = _py_rank2([x for x, _ in pts])
        w = _py_rank2([y for _, y in pts])
        n = len(pts)
        su, sw = sum(u), sum(w)
        num = n * sum(a * b for a, b in zip(u, w)) - su * sw
        dx = n * sum(a * a for a in u) - su * su
        dy = n * sum(b * b for b in w) - sw * sw
        rho = (
            float(num) / math.sqrt(float(dx) * float(dy))
            if dx > 0 and dy > 0
            else None
        )
        want[nat] = (n, rho)
    got = {
        r.nation: (r.n_customers, r.rho)
        for r in customer_spearman_balance_value(spark, SF001).collect()
    }
    assert got == want


def test_l_diversity_consistent_with_k_anonymity(spark):
    """Same QI cells as events_k_anonymity: per-type row totals must
    agree, cell counts must agree, and l bounds hold (1 <= l <= cell
    rows)."""
    from hrfco_data_pipeline_spark.plans.relational import (
        events_k_anonymity,
        events_l_diversity,
    )

    ld = {
        r.event_type: r for r in events_l_diversity(spark, SF001).collect()
    }
    ka = {
        r.event_type: r for r in events_k_anonymity(spark, SF001).collect()
    }
    assert set(ld) == set(ka)
    for t, r in ld.items():
        assert r.n_rows == ka[t].n_rows
        assert r.n_cells == ka[t].n_groups
        assert 1 <= r.min_l
        assert 0 <= r.rows_below_3 <= r.n_rows
        assert r.at_risk_share == r.rows_below_3 / r.n_rows


def test_sqrt_mix_exact_budget_and_monotone(spark):
    """Largest-remainder apportionment: allocations are integers that
    sum EXACTLY to the budget, and a heavier language never gets less
    than a lighter one."""
    from hrfco_data_pipeline_spark.plans.llm import (
        docs_sqrt_temperature_mix,
    )

    rows = docs_sqrt_temperature_mix(spark, SF001).collect()
    assert rows
    assert sum(r.alloc_tokens for r in rows) == 100_000
    by_w = sorted(rows, key=lambda r: r.weight)
    for a, b in zip(by_w, by_w[1:]):
        assert a.alloc_tokens <= b.alloc_tokens
    for r in rows:
        assert r.weight == float(r.n_tokens) ** 0.5
        assert r.sampling_rate == r.alloc_tokens / r.n_tokens


def test_centroid_drift_bounds_and_degenerate_shard(spark):
    """|cos| <= 1 everywhere; with a single shard the shard centroid
    IS the label centroid, so cos collapses to ~1 (sqrt(x)*sqrt(x)
    rounding only)."""
    from hrfco_data_pipeline_spark.plans.llm import (
        embedding_shard_centroid_drift,
    )

    rows = embedding_shard_centroid_drift(spark, SF001).collect()
    assert rows
    for r in rows:
        assert r.cos_drift is None or -1.0 <= r.cos_drift <= 1.0 + 1e-12
    one = embedding_shard_centroid_drift(spark, SF001, n_shards=1).collect()
    assert one
    for r in one:
        assert abs(r.cos_drift - 1.0) < 1e-12
