"""Salted aggregation / join helpers produce identical results to the
plain versions while bounding per-task key volume."""

from __future__ import annotations

import pyspark.sql.functions as F

from hrfco_data_pipeline_spark.operators.skew import salted_count, salted_join


def _skewed(spark):
    # one celebrity key with 10k rows, 50 normal keys with ~20 each
    hot = spark.range(10_000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(1_000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r.k: r.n for r in salted_count(df, ["k"], salt_buckets=16).collect()}
    assert salted == plain
    assert salted["HOT"] == 10_000


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame(
        [("HOT", "celebrity")] + [(f"k{i}", f"dim{i}") for i in range(50)],
        "k string, label string",
    )
    plain = big.join(dim, "k").groupBy("k", "label").agg(F.count("*").alias("n"))
    salted = salted_join(big, dim, on="k").groupBy("k", "label").agg(
        F.count("*").alias("n")
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
