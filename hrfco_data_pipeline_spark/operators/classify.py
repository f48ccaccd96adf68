"""The reference's hot path as declarative DataFrame transforms.

Pipeline (WaterLevelProcessor.java:40-95, AnomalyDetector.java:46-105,
WaterLevelValidator.java:125-163):

    parse (T3-T6) → F1 drop → F2 flag → J1 threshold join → C1-C5

Scale notes (100 TB posture):
- J1 is a stream/fact ⋈ dimension lookup. The stations dim is tiny
  (thousands of rows) → ``broadcast()`` hint; no shuffle of the fact
  side, the join runs map-side inside the same whole-stage-codegen span
  as the classification expressions.
- Every C1-C5 rule is a Column expression (when/otherwise chains) —
  no UDFs, so Catalyst constant-folds the bounds and the whole
  classify step is one codegen'd projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hrfco_data_pipeline_spark.functions.coercion import (
    blank_to_null,
    java_double,
    reformat_ymdhm,
)
from hrfco_data_pipeline_spark.functions.exprcache import cached_exprs
from hrfco_data_pipeline_spark.functions.alerts import alert_message
from hrfco_data_pipeline_spark.operators.validate import (
    range_valid_predicate,
    required_fields_filter,
)

THRESHOLD_COLS = ("attwl", "wrnwl", "almwl", "srswl")


def parse_observations(df: DataFrame) -> DataFrame:
    """T3-T6: wire-format strings → typed columns.

    Input columns (all strings): wlobscd, ymdhm, wl, fw. Output adds
    ``water_level``/``flow_rate`` (nullable double, Java parse parity),
    ``obs_time_str`` (``yyyy-MM-dd HH:mm`` reformat, T5).
    Unknown extra columns pass through untouched (POJO ignore-unknown).
    """
    # one withColumns round: sequential withColumn calls each pay a
    # full plan-analysis pass (r16 build-time profile: the classify
    # chain cost ~0.8 s of pure plan construction per query, paid by
    # every hydro query on every run)
    return df.withColumns(
        cached_exprs(
            "parse_observations",
            lambda: {
                "water_level": java_double("wl"),
                "flow_rate": java_double("fw"),
                "obs_time_str": reformat_ymdhm("ymdhm"),
            },
        )
    )


def join_thresholds(obs: DataFrame, stations: DataFrame) -> DataFrame:
    """J1: left-join per-station thresholds onto observations.

    The reference does cache-then-MongoDB point lookups per record
    (AnomalyDetector.java:46-61); Spark-natively this is a broadcast
    stream-static left join — the dim re-read per micro-batch subsumes
    cache refresh. ``station_found`` distinguishes "no station row"
    (→ NO_THRESHOLD) from "station with null thresholds".
    """
    dim = stations.select(
        *cached_exprs(
            "join_thresholds.dim",
            lambda: [
                F.col("wlobscd").alias("__station_code"),
                *[java_double(c).alias(f"__{c}") for c in THRESHOLD_COLS],
                F.lit(True).alias("station_found"),
            ],
        )
    )
    joined = obs.join(
        F.broadcast(dim), obs["wlobscd"] == dim["__station_code"], "left"
    )
    # single select instead of withColumn + 4 withColumnRenamed: five
    # analysis rounds -> one (r16 plan-construction profile)
    return joined.select(
        *[obs[c] for c in obs.columns],
        *[F.col(f"__{c}").alias(c) for c in THRESHOLD_COLS],
        F.coalesce("station_found", F.lit(False)).alias("station_found"),
    )


def valid_threshold_count(
    attwl: Column, wrnwl: Column, almwl: Column, srswl: Column
) -> Column:
    """C2: number of thresholds that are non-null AND > 0
    (AnomalyDetector.java:98-105)."""
    one_if = lambda t: F.when(t.isNotNull() & (t > 0), 1).otherwise(0)  # noqa: E731
    return one_if(attwl) + one_if(wrnwl) + one_if(almwl) + one_if(srswl)


def flood_warning_level(
    wl: Column, attwl: Column, wrnwl: Column, almwl: Column, srswl: Column
) -> Column:
    """C3: tiered CASE ladder (WaterLevelValidator.java:125-163).

    null wl → null; all-null thresholds → null; else first ``>=`` match
    CRITICAL > WARNING > CAUTION > ATTENTION (null tiers skipped),
    else NORMAL. Boundaries inclusive. Every tier is null-guarded so
    three-valued logic can never promote a null comparison.
    """
    all_null = attwl.isNull() & wrnwl.isNull() & almwl.isNull() & srswl.isNull()
    ladder = (
        F.when(srswl.isNotNull() & (wl >= srswl), "CRITICAL")
        .when(almwl.isNotNull() & (wl >= almwl), "WARNING")
        .when(wrnwl.isNotNull() & (wl >= wrnwl), "CAUTION")
        .when(attwl.isNotNull() & (wl >= attwl), "ATTENTION")
        .otherwise("NORMAL")
    )
    return F.when(wl.isNull() | all_null, F.lit(None).cast("string")).otherwise(ladder)


def classify(df: DataFrame, **bounds: float) -> DataFrame:
    """C1-C4 over a parsed+joined frame.

    Adds: ``range_valid`` (F2), ``is_anomaly`` (C1), ``anomaly_reason``,
    ``valid_threshold_cnt`` (C2), ``flood_warning_level`` — the
    *internal* level where NO_THRESHOLD / PARTIAL_THRESHOLD are still
    visible (normalization to alert level is C5 in ``build_alerts``).

    Decision order mirrors AnomalyDetector.detect exactly:
    anomaly short-circuits everything; a missing station row or
    (wl non-null ∧ validCount==0) → NO_THRESHOLD; (wl non-null ∧
    validCount==1) → PARTIAL_THRESHOLD; else the C3 ladder with
    null → NORMAL fallback (C4).
    """
    # one withColumns round, new columns expressed from the shared
    # EXPRESSIONS rather than each other (five analysis passes -> one;
    # Catalyst dedups the repeated subtrees at codegen), and the whole
    # constant tree built once per JVM (r16 plan-construction profile:
    # ~4,000 py4j round trips ~ 0.8 s per query build)
    bounds = {k: float(v) for k, v in bounds.items()}  # type-canonical build

    def _build():
        wl = F.col("water_level")
        t = {c: F.col(c) for c in THRESHOLD_COLS}
        vcnt = valid_threshold_count(*[t[c] for c in THRESHOLD_COLS])
        c3 = flood_warning_level(wl, *[t[c] for c in THRESHOLD_COLS])
        range_valid = range_valid_predicate(
            wl, F.col("flow_rate"), **bounds
        )
        is_anomaly = ~range_valid
        level = (
            F.when(is_anomaly, F.lit(None).cast("string"))
            .when(~F.col("station_found"), "NO_THRESHOLD")
            .when(wl.isNotNull() & (vcnt == 0), "NO_THRESHOLD")
            .when(
                wl.isNotNull() & (vcnt == 1), "PARTIAL_THRESHOLD"
            )
            .otherwise(F.coalesce(c3, F.lit("NORMAL")))
        )
        return {
            "range_valid": range_valid,
            "is_anomaly": is_anomaly,
            "anomaly_reason": F.when(
                is_anomaly, "Data out of physical range"
            ),
            "valid_threshold_cnt": vcnt,
            "flood_warning_level": level,
        }

    # bounds normalized to float in the key: 50 == 50.0 hash identically,
    # so an int-bounds caller must not be served the float-literal tree
    # (or vice versa) — type-canonical key, type-canonical build (ADVICE r16)
    return df.withColumns(
        cached_exprs(
            ("classify", tuple(sorted((k, float(v)) for k, v in bounds.items()))),
            _build,
        )
    )


def build_alerts(df: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """C5 + T8/T9: publish-side normalization and alert projection.

    NO_THRESHOLD / PARTIAL_THRESHOLD → NORMAL; anomaly → literal level
    ANOMALY with isAnomaly=true (WaterLevelProcessor.java:78-86). The
    ``timestamp`` epoch-millis publish time is added by the sink, not
    here, to keep this transform deterministic.
    """
    # single select, the level as a shared expression (two analysis
    # rounds -> one), constant tail built once per JVM (r16
    # plan-construction profile)
    def _build():
        alert_level = F.when(F.col("is_anomaly"), "ANOMALY").otherwise(
            F.when(
                F.col("flood_warning_level").isin(
                    "NO_THRESHOLD", "PARTIAL_THRESHOLD"
                ),
                "NORMAL",
            ).otherwise(F.col("flood_warning_level"))
        )
        return [
            F.col("wlobscd").alias("observation_code"),
            F.col("obs_time_str").alias("observation_time"),
            F.col("water_level").alias("water_level"),
            F.col("flow_rate").alias("flow_rate"),
            alert_level.alias("warning_level"),
            F.col("is_anomaly"),
            alert_message(
                F.col("wlobscd"),
                alert_level,
                F.col("water_level"),
                F.col("is_anomaly"),
            ).alias("message"),
        ]

    return df.select(
        *[F.col(c) for c in extra_cols],
        *cached_exprs("build_alerts.tail", _build),
    )


def process_observations(
    raw: DataFrame, stations: DataFrame, **bounds: float
) -> DataFrame:
    """Full hot path: parse → F1 → F2/J1/C1-C4. Returns the classified
    frame (pre-C5); feed to ``build_alerts`` for the publish view."""
    parsed = parse_observations(raw)
    kept = required_fields_filter(parsed)
    joined = join_thresholds(kept, stations)
    return classify(joined, **bounds)


def alerts_kafka_frame(alerts: DataFrame) -> DataFrame:
    """W7: the keyed Kafka publish frame — key = station code (preserves
    per-station partition ordering, AlertPublisher.java:66-67), value =
    the alert JSON envelope. Feed to ``.write.format("kafka")`` /
    ``writeStream`` with a topic option.
    """
    return alerts.select(
        F.col("observation_code").alias("key"),
        F.to_json(
            F.struct(
                F.col("observation_code").alias("observationCode"),
                F.col("observation_time").alias("observationTime"),
                F.col("water_level").alias("waterLevel"),
                F.col("flow_rate").alias("flowRate"),
                F.col("warning_level").alias("warningLevel"),
                F.col("is_anomaly").alias("isAnomaly"),
                F.col("message").alias("message"),
            )
        ).alias("value"),
    )
