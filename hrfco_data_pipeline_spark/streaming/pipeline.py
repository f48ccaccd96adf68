"""Streaming twin of the hydrology pipeline.

The batch transforms (operators/classify.py) are pure
DataFrame→DataFrame functions, so binding them to ``readStream`` is the
whole job — write once, run both (SURVEY §7 design stance).

Topology (mirrors §3.1 of the survey):

    kafka/file JSON source
      → from_json (T3, corrupt-record capture)
      → process_observations (F1, F2, J1 stream-static broadcast join,
        C1-C4)                                  [stateless → no watermark]
      → foreachBatch:  persist → archive (W3) + fact (W4) + DLQ (W8)
        → unpersist    [replaces the 3-thread storage executor, W6]
      alerts (C5) → kafka/memory sink keyed by wlobscd (W7)

Delivery: checkpointed at-least-once into idempotent appends — the same
guarantee the reference achieves with acks=all + DLQ (SURVEY §4 note).
The stations dim is re-read every micro-batch by the stream-static
join, which subsumes the reference's threshold cache refresh (J1).

Kafka options mirror S4 (subscribe hrfco-waterlevel, startingOffsets
earliest); tests use the file source for hermeticity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hrfco_data_pipeline_spark.operators.classify import (
    build_alerts,
    process_observations,
)
from hrfco_data_pipeline_spark.sinks.writers import (
    write_archive,
    write_dlq,
    write_fact,
)

OBS_WIRE_SCHEMA = (
    "wlobscd string, ymdhm string, wl string, fw string, _corrupt string"
)


def observations_file_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """JSON-lines file source (test stand-in for the Kafka source S4).

    Returns raw (value, parsed struct, _corrupt) — same shape the Kafka
    binding produces from the topic value bytes.
    """
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 4)
        .load(source_dir)
    )
    rec = F.from_json(
        "value",
        OBS_WIRE_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    return raw.select("value", rec.alias("rec")).select(
        "value",
        F.col("rec.wlobscd").alias("wlobscd"),
        F.col("rec.ymdhm").alias("ymdhm"),
        F.col("rec.wl").alias("wl"),
        F.col("rec.fw").alias("fw"),
        F.col("rec._corrupt").alias("_corrupt"),
    )


def observations_kafka_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str = "hrfco-waterlevel",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka binding of the same wire parse (S4; untested here — no
    broker in this container, the file source above is the test twin)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    rec = F.from_json(
        F.col("value").cast("string"),
        OBS_WIRE_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    return raw.select(F.col("value").cast("string").alias("value"), rec.alias("rec")).select(
        "value",
        F.col("rec.wlobscd").alias("wlobscd"),
        F.col("rec.ymdhm").alias("ymdhm"),
        F.col("rec.wl").alias("wl"),
        F.col("rec.fw").alias("fw"),
        F.col("rec._corrupt").alias("_corrupt"),
    )


def run_stream(
    spark: SparkSession,
    stream: DataFrame,
    stations: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    dedup: bool = False,
    breakers: dict | None = None,
) -> StreamingQuery:
    """Bind the full pipeline to a streaming source.

    ``dedup=True`` adds the idiomatic-Spark upgrade the reference lacks:
    per-(station, minute) duplicate drop with a 1-hour watermark (off by
    default for parity — SURVEY §7 Phase 3).

    ``breakers`` (R2) optionally maps sink name ("archive" / "fact" /
    "alerts") to a ``sinks.reliability.SinkCircuitBreaker``. A guarded
    sink that fails — or whose breaker is open — no longer kills the
    trigger: the failure lands in the DLQ as a storage-failure envelope
    (W8's isPartialFailure path, WaterLevelProcessor.java:70-75) and the
    stream carries on, exactly the reference's degrade-and-continue
    contract. Without breakers, sink errors propagate and fail the
    query (fail-stop default).
    """

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            good = batch.filter(F.col("_corrupt").isNull())
            dlq = batch.filter(F.col("_corrupt").isNotNull()).select(
                F.lit(None).cast("string").alias("original_key"),
                F.col("value").alias("original_value"),
                F.lit("Processing failed: JsonParseException").alias("error_reason"),
            )
            classified = process_observations(
                good.drop("value", "_corrupt"), stations
            ).persist()

            def write_alerts() -> None:
                build_alerts(classified).withColumn(
                    "timestamp", F.unix_millis(F.current_timestamp())
                ).write.mode("append").parquet(f"{out_dir}/alerts")

            sinks = (
                ("archive", lambda: write_archive(classified, f"{out_dir}/archive", fmt="json")),
                ("fact", lambda: write_fact(classified, f"{out_dir}/fact")),
                ("alerts", write_alerts),
            )
            # W6 fan-out: independent writes over one cached batch
            storage_failures: list[tuple[str, str]] = []
            for name, fn in sinks:
                breaker = (breakers or {}).get(name)
                if breaker is None and breakers is not None:
                    fn()
                    continue
                if breakers is None:
                    fn()  # fail-stop default: no breaker layer at all
                    continue
                try:
                    breaker.call(fn)
                except Exception as exc:  # noqa: BLE001 — degrade, DLQ, continue
                    storage_failures.append((name, type(exc).__name__))

            if storage_failures:
                env = spark.createDataFrame(
                    [
                        (None, f"batch {batch_id}", f"Storage failed: {n}: {e}")
                        for n, e in storage_failures
                    ],
                    "original_key string, original_value string, error_reason string",
                )
                dlq = dlq.unionByName(env)
            write_dlq(dlq, f"{out_dir}/dlq")
            classified.unpersist()
        finally:
            batch.unpersist()

    src = stream
    if dedup:
        # dropDuplicatesWithinWatermark, NOT dropDuplicates: with plain
        # dropDuplicates the dedup state only evicts when the watermark
        # column is itself part of the key subset — (wlobscd, ymdhm)
        # isn't, so state would grow without bound on a real stream.
        # The WithinWatermark variant expires keys once they fall behind
        # the watermark, bounding state to one hour of traffic.
        src = (
            src.withColumn(
                "event_ts",
                F.coalesce(
                    F.try_to_timestamp(F.col("ymdhm"), F.lit("yyyyMMddHHmm")),
                    F.current_timestamp(),
                ),
            )
            .withWatermark("event_ts", "1 hour")
            .dropDuplicatesWithinWatermark(["wlobscd", "ymdhm"])
        )

    writer = (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
