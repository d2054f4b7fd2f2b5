"""SparkSession bootstrap tuned for both local testing and cluster scale.

Local mode (local[N]) is a single JVM; the same settings scale out unchanged:
AQE re-plans shuffles at runtime (partition coalescing, skew-join splitting),
shuffle partitions default to a CPU-derived value locally and should be set
to ~2-3x total cores on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# 100TB-scale notes: these configs are safe cluster-side defaults. On a real
# 1000-executor deployment the only values to revisit are shuffle.partitions
# (set to ~2x total executor cores or rely on AQE initialPartitionNum) and
# maxPartitionBytes (128-256MB keeps scan tasks balanced).
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.driver.host": "127.0.0.1",
}


def get_spark(app_name: str = "data_pipeline_spark", cpus: int | None = None) -> SparkSession:
    """Return (creating if needed) the engine's SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle partitions
    are pinned to the core count locally — 200 default would over-parallelize
    the small scale factors and under-parallelize a cluster anyway.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in _BASE_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
