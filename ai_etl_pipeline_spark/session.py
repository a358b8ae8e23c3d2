"""SparkSession construction tuned for the engine.

The reference runs eagerly in a single pandas process
(``/root/reference/preprocess.py:22`` — ``low_memory=False`` whole-file
load). Here every pipeline is a lazy DataFrame plan executed by
Catalyst/Tungsten; the session config below is the scale story:

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting,
  so the same plan works at sf0.001 and at 100 TB.
- Arrow on: every pandas_udf / toPandas boundary is vectorized.
- ``spark.sql.shuffle.partitions`` defaults to a local-friendly number but
  is explicitly overridable for cluster deployments (set it to ~2-3x the
  executor-core count; AQE coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_session(
    app_name: str = "ai-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster, pass ``master=None`` and let spark-submit decide;
    locally we default to ``local[N]`` with N from $SPARK_GRAFT_CPUS.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
