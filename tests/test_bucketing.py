"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the orders⨝customer equi-join shuffles both fact tables every
run; bucketing both by the join key at write time (`bucketBy`) makes the
join a zero-exchange merge of co-located buckets. This test locks in that
plan shape: same bucket count on both sides → SortMergeJoin with NO
Exchange, and identical results to the shuffled join.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from etl_drone_sense_spark.sources.readers import read_table


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}'")
    yield "bdb"
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_avoids_shuffle(spark, sf_dir, bucket_db):
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable(f"{bucket_db}.orders_b")
    )
    (
        customer.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable(f"{bucket_db}.customer_b")
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table(f"{bucket_db}.orders_b")
        cb = spark.table(f"{bucket_db}.customer_b")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey).select(
            "o_orderkey", "o_custkey", "c_name"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # buckets are co-located — no shuffle

        # identical results to the shuffled plain join
        plain = orders.join(customer, orders.o_custkey == customer.c_custkey)
        assert joined.count() == plain.count()

        # the un-bucketed join DOES shuffle under the same conf — the
        # bucketing, not the data size, is what removed the exchanges
        assert "Exchange" in _plan(
            orders.join(customer, orders.o_custkey == customer.c_custkey)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
