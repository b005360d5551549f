"""Partition pruning on Hive-partitioned layouts — static and dynamic.

At 100 TB the output layout IS the index: a filter on the partition column
must become a PartitionFilter (list only matching directories), and a join
against a filtered dimension must trigger dynamic partition pruning (DPP)
so the fact scan never reads non-qualifying partitions.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from etl_drone_sense_spark.sources.readers import read_table
from etl_drone_sense_spark.sources.sinks import partitioned_parquet


@pytest.fixture(scope="module")
def events_partitioned(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_part"))
    partitioned_parquet(read_table(spark, sf_dir, "events"), path, ["event_type"])
    return path


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_static_partition_pruning(spark, events_partitioned):
    df = spark.read.parquet(events_partitioned).filter(
        F.col("event_type") == "click"
    )
    plan = _plan(df)
    # the filter must land in PartitionFilters (directory-level pruning),
    # NOT in PushedFilters/data filters (row-level after reading everything)
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines and any("event_type" in l for l in pf_lines)


def test_dynamic_partition_pruning(spark, events_partitioned):
    """Join on the partition column with a selective dim filter → the fact
    scan's PartitionFilters must contain a dynamicpruning subquery."""
    fact = spark.read.parquet(events_partitioned)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5)],
        "event_type string, type_id int",
    ).filter(F.col("type_id") == 1)
    joined = fact.join(dim, "event_type").select("event_id", "type_id")
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower()
