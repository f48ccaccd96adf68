"""UDF / pandas-UDF / UDTF registration — the extension surface SURVEY
§2.9 lists as Spark-native. The engine's hot paths use none of these
(codegen'd built-ins throughout); this pins that the registration
machinery works for user extensions, with the Arrow path as the
recommended form."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType


def test_scalar_and_pandas_udf_registration(spark):
    # row-at-a-time Python UDF: registered for completeness; documented
    # slow path (per-row interpreter hop)
    spark.udf.register("py_double_it", lambda x: x * 2 if x is not None else None, LongType())

    # Arrow-vectorized pandas UDF: the recommended extension form
    @F.pandas_udf(DoubleType())
    def v_norm(x: pd.Series) -> pd.Series:
        return x.abs() + 1.0

    spark.udf.register("v_norm", v_norm)

    df = spark.range(-3, 4).selectExpr(
        "id", "py_double_it(id) AS doubled", "v_norm(CAST(id AS DOUBLE)) AS nrm"
    )
    rows = {r["id"]: (r["doubled"], r["nrm"]) for r in df.collect()}
    assert rows[-3] == (-6, 4.0) and rows[3] == (6, 4.0) and rows[0] == (0, 1.0)


def test_grouped_agg_pandas_udaf(spark):
    @F.pandas_udf(DoubleType())
    def p90(v: pd.Series) -> float:
        return float(v.quantile(0.9))

    spark.udf.register("p90", p90)
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(11)] + [("b", 5.0)], ["k", "v"]
    )
    got = {r["k"]: r["p"] for r in df.groupBy("k").agg(F.expr("p90(v) AS p")).collect()}
    assert got["a"] == 9.0 and got["b"] == 5.0


def test_python_udtf_lateral_join(spark):
    """Spark 4 Python UDTF surface: a table function registered in SQL
    and applied per input row via LATERAL — the extension point for
    row-expanding custom ops the HOF/explode forms can't express."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, lo bigint, hi bigint")
    class RangeChunks:
        def eval(self, n: int, size: int):
            i = 0
            lo = 0
            while lo < n:
                yield i, lo, min(lo + size, n)
                i += 1
                lo += size

    spark.udtf.register("range_chunks", RangeChunks)
    rows = spark.sql(
        """
        SELECT t.id, c.chunk_idx, c.lo, c.hi
        FROM (SELECT id FROM range(2)) t,
        LATERAL range_chunks(5, CAST(2 AS INT)) c
        """
    ).collect()
    got = sorted((r.id, r.chunk_idx, r.lo, r.hi) for r in rows)
    per_row = [(c, lo, hi) for (_, c, lo, hi) in got if _ == 0]
    assert per_row == [(0, 0, 2), (1, 2, 4), (2, 4, 5)]
    assert len(got) == 6  # both outer rows expanded


def test_arrow_optimized_scalar_udf(spark):
    """The Spark 3.5+ Arrow-optimized scalar UDF flavor (useArrow=True):
    row-at-a-time author experience, Arrow-batched transfer — the
    middle ground between legacy pickled UDFs and pandas_udf."""
    from pyspark.sql.functions import udf, col

    @udf("long", useArrow=True)
    def squared(x: int) -> int:
        return x * x

    out = {
        r.i: r.sq
        for r in spark.range(5)
        .select(col("id").alias("i"), squared("id").alias("sq"))
        .collect()
    }
    assert out == {i: i * i for i in range(5)}
