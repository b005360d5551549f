"""SparkSession factory.

Defaults are chosen for correctness-parity with the DuckDB oracle (UTC
session timezone, Arrow enabled) and for scale (AQE on, skew-join handling,
partition coalescing).  On a real cluster the same builder is used — only
``master`` and the shuffle-partition count change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Adaptive execution: runtime re-planning, partition coalescing, skew splits.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Timestamp parity with the DuckDB oracle (naive timestamps, UTC).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any Pandas-UDF path (extension operators only).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dimension tables (region/nation/supplier/part) broadcast freely.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Keep scan partitions sized for executor memory at large SF.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "etl-drone-sense-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in this container;
    on a cluster pass ``None`` and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
