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
