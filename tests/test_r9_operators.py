"""Round-9 operator units: exact Gram partials, KMV merge associativity,
and the weighted-median equivalence — ground truths independent of the
DuckDB oracles (which tests/test_oracle_parity.py already runs)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest


def test_gram_matrix_fixed_matches_numpy(spark):
    from etl_drone_sense_spark.operators.similarity import gram_matrix_fixed

    rng = np.random.RandomState(11)
    vecs = rng.uniform(-1, 1, size=(40, 6)).round(4)
    df = spark.createDataFrame(
        [(v.tolist(),) for v in vecs], "embedding array<double>"
    ).repartition(5)  # force multi-partition partials
    got = {
        (r["i"], r["j"]): r["g"]
        for r in gram_matrix_fixed(df).collect()
    }
    q = np.floor(vecs * 1e6 + 0.5).astype(np.int64)
    want = q.T @ q
    assert len(got) == 36
    for i in range(6):
        for j in range(6):
            assert got[(i, j)] == int(want[i, j])


def test_kmv_merge_is_exactly_associative(spark):
    """k-min of the union == k-min of merged per-chunk k-mins — the
    property stream_sketch_kmv's oracle identity rests on."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_drone_sense_spark.plans.extensions import _kmv_sketch

    rows = [
        (i, "2024-01-0%d 00:00:00" % (1 + i % 7), i * 37 % 211, "click")
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    k = 16
    whole = {
        r["h"] for r in _kmv_sketch(df, k).collect()
    }
    # chunk by event_id mod 3, sketch each, merge, re-rank
    merged_pool = []
    for m in range(3):
        part = df.filter(F.col("event_id") % 3 == m)
        merged_pool.append(_kmv_sketch(part, k).select("event_type", "h"))
    pool = merged_pool[0].unionByName(merged_pool[1]).unionByName(
        merged_pool[2]
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    remerged = {
        r["h"]
        for r in pool.select(
            "h", F.row_number().over(w).alias("rn")
        ).filter(F.col("rn") <= k).collect()
    }
    assert remerged == whole and len(whole) == k


def test_kmv_estimate_tracks_exact_distinct(spark):
    """(k-1)/theta lands within the published ~1/sqrt(k-1) error bar on
    the fixture (sanity that the estimator arithmetic is an estimator,
    not just hash-stable)."""
    from etl_drone_sense_spark.plans.registry import get, all_queries

    all_queries()
    sdf = get("sketch_theta_kmv").fn(spark, "/root/testdata/sf0.01").toPandas()
    import duckdb

    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        "parquet_scan('/root/testdata/sf0.01/events.parquet')"
    )
    exact = dict(
        con.execute(
            "select event_type, count(distinct cast(user_id as varchar) "
            "|| '|' || cast(cast(ts as date) as varchar)) from events group by 1"
        ).fetchall()
    )
    for r in sdf.itertuples():
        if r.set_name in exact and r.est_distinct == r.est_distinct:
            rel = abs(r.est_distinct - exact[r.set_name]) / exact[r.set_name]
            assert rel < 4 / (63 ** 0.5), (r.set_name, rel)


def test_split_coin_matches_python_md5(spark):
    """The md5 coin the leakage-safe split and its sf1 harness both use:
    engine arithmetic == hashlib replay."""
    from pyspark.sql import functions as F

    df = spark.range(0, 500).select(F.col("id").cast("long").alias("k"))
    got = {
        r["k"]: r["c"]
        for r in df.select(
            "k",
            (
                F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10)
                .cast("long")
                % 10
                < 8
            ).alias("c"),
        ).collect()
    }
    for k in range(500):
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        assert got[k] == (h % 10 < 8)


def test_binned_quantiles_equal_sorted_on_adversarial_distributions(
    spark, tmp_path
):
    """The selection twin must equal the sort twin on shapes the fixture
    never shows: a CONSTANT group (bin width 0 → the 1e-12 guard), heavy
    ties straddling bin edges, negative values, and a 1-row group."""
    import random

    from etl_drone_sense_spark.plans.registry import get, all_queries

    all_queries()
    rnd = random.Random(23)
    rows = []
    # group A: all identical (hi == lo)
    rows += [("A", 42.5)] * 37
    # group B: three distinct values, massive ties
    rows += [("B", v) for v in ([1.0] * 40 + [2.0] * 40 + [3.0] * 40)]
    # group C: negatives + spread
    rows += [("C", round(rnd.uniform(-500, 500), 2)) for _ in range(123)]
    # group D: single row
    rows += [("D", -7.25)]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double"
    )
    d = str(tmp_path / "advq")
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    a = (
        get("agg_exact_quantiles").fn(spark, d).toPandas()
        .sort_values("l_returnflag").reset_index(drop=True)
    )
    b = (
        get("agg_exact_quantiles_binned").fn(spark, d).toPandas()
        .sort_values("l_returnflag").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert a.loc[a.l_returnflag == "A", "q99"].iloc[0] == 42.5
    assert a.loc[a.l_returnflag == "D", "q25"].iloc[0] == -7.25
