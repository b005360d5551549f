"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship reference-parity pipeline;
``queries()`` / ``oracle_sql()`` expose the full operator registry
(etl_drone_sense_spark.plans) for the DuckDB differential gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_drone_sense_spark.plans import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference drone→Feature
    transform (SURVEY §2 Part A) over synthesized telemetry."""
    from etl_drone_sense_spark.plans.drone import drone_features_flat

    return drone_features_flat(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return all_oracles()
