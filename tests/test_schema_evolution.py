"""Schema evolution on the partitioned fact sink: a long-lived table
accretes columns across deployments; readers must see the union schema
with nulls for pre-evolution rows, and partition pruning must survive."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_fact_table_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "fact")

    v1 = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("d"),
        (F.col("id") * 1.5).alias("water_level"),
    )
    v1.write.partitionBy("d").mode("append").parquet(path)

    # deployment 2 adds a column (the reference's dynamic-field tail
    # evolving into the fact schema)
    v2 = spark.range(100, 200).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("d"),
        (F.col("id") * 1.5).alias("water_level"),
        F.lit("src-a").alias("provenance"),
    )
    v2.write.partitionBy("d").mode("append").parquet(path)

    got = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(got.columns) == {"id", "d", "water_level", "provenance"}
    assert got.count() == 200
    # old rows surface the new column as null
    assert got.filter(F.col("provenance").isNull()).count() == 100
    assert got.filter(F.col("provenance") == "src-a").count() == 100
    # partition pruning still applies across both schema generations
    pruned = got.filter(F.col("d") == "1")
    assert pruned.count() == 66 or pruned.count() == 67
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "d=1" in plan or "PartitionFilters" in plan
