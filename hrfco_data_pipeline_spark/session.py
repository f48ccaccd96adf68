"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the configs below are chosen so the
same code scales to a large cluster: AQE handles runtime re-planning and
skew joins, shuffle partitions default small locally but should be sized
to ~128 MB per partition at cluster scale, and Arrow is enabled so any
pandas-UDF path is batch-vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hrfco-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults are safe for a 1000-executor cluster as well as local[N]:
    AQE on (coalesces small shuffle partitions, rewrites skew joins),
    broadcast threshold generous enough to broadcast dimension tables,
    Arrow on for any pandas interop.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # sources/wire_datasource.py pushes station filters into the reader
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Floor on scan splits: small inputs (single sub-128MB parquet
        # file) would otherwise scan in ONE task, idling every other
        # core. At cluster scale files outnumber cores and this floor is
        # inert; locally it saturates local[N] on the driver testdata.
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
