"""hrfco_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
repo Korigin99/hrfco-data-pipeline (a NiFi + Kafka-Streams + Spring-Boot
hydrology pipeline) as an idiomatic Spark engine:

- ``functions``  — scalar expression library (string→double coercion with
  Java parse parity, KST time handling, alert message formatting).
- ``operators``  — relational/dataflow operators: validation filters,
  threshold-join classification (the reference's hot path), analytics
  aggregations, dedup, similarity search, text analysis.
- ``sources``    — batch/streaming readers for the observation wire format
  and the generic parquet star schema.
- ``sinks``      — partitioned archive writer, fact-table append, DLQ.
- ``plans``      — composed end-to-end pipelines (batch + streaming twins).
- ``streaming``  — Structured Streaming bindings of the same transforms.

Everything on the hot path stays inside Spark SQL expressions (whole-stage
codegen); Python UDFs are reserved for genuinely non-relational work and
are Arrow-vectorized (pandas_udf) when used at all.
"""

__version__ = "0.1.0"
