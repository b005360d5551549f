"""Bloom-prefiltered join (operators/bloomjoin.py): the prefilter must
actually skip fact rows, never change the join result, and refuse shapes
where dropping non-matches would be wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_drone_sense_spark.operators import bloomjoin as BJ
from etl_drone_sense_spark.plans.registry import t


def test_prefilter_skips_rows_and_preserves_result(spark, sf_dir):
    fact = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    dim = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    bloom = BJ.build_key_bloom(dim, "o_orderkey", m_bits=1 << 20)
    pre = fact.filter(
        BJ.bloom_might_contain(spark, bloom, "l_orderkey", 1 << 20)
    )
    n_fact, n_pre = fact.count(), pre.count()
    # the skip is real: the urgent slice is ~1/5 of orders, so with ~1%
    # bloom FP the prefilter must drop well over half the fact side
    assert n_pre < n_fact * 0.5, (n_pre, n_fact)

    got = sorted(
        map(
            tuple,
            BJ.bloom_prefilter_join(
                fact, dim, "l_orderkey", "o_orderkey", m_bits=1 << 20
            )
            .select("l_orderkey", "l_quantity")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            fact.join(dim, fact.l_orderkey == dim.o_orderkey)
            .select("l_orderkey", "l_quantity")
            .collect(),
        )
    )
    assert got == want  # FPs die in the exact join; no FN ever


def test_bloom_has_no_false_negatives(spark):
    """Every key present in the dim MUST pass the probe — a false
    negative silently drops matching rows (the correctness contract)."""
    keys = [(k,) for k in [0, 1, -1, 2**62, -(2**62), 42, 10**12]]
    dim = spark.createDataFrame(keys, "k long")
    bloom = BJ.build_key_bloom(dim, "k", m_bits=1 << 13)
    probe = spark.createDataFrame(keys, "k long")
    passed = probe.filter(
        BJ.bloom_might_contain(spark, bloom, "k", 1 << 13)
    ).count()
    assert passed == len(keys)


def test_null_keys_never_pass(spark):
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    bloom = BJ.build_key_bloom(dim, "k", m_bits=1 << 13)
    probe = spark.createDataFrame(
        [(1,), (None,), (2,), (None,)], "k long"
    )
    got = sorted(
        r.k
        for r in probe.filter(
            BJ.bloom_might_contain(spark, bloom, "k", 1 << 13)
        ).collect()
    )
    assert got == [1, 2]  # NULL can never equi-join → filtered


def test_outer_join_shape_refused(spark, sf_dir):
    fact = t(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = t(spark, sf_dir, "orders").select("o_orderkey")
    with pytest.raises(ValueError, match="inner/semi"):
        BJ.bloom_prefilter_join(fact, dim, "l_orderkey", "o_orderkey", how="left")
    with pytest.raises(ValueError, match="power of two"):
        BJ.build_key_bloom(dim, "o_orderkey", m_bits=1000)


def test_semi_join_variant(spark, sf_dir):
    fact = t(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 11 == 0)
        .select("o_orderkey")
    )
    got = (
        BJ.bloom_prefilter_join(
            fact, dim, "l_orderkey", "o_orderkey", how="semi", m_bits=1 << 16
        )
        .count()
    )
    want = fact.join(
        dim, fact.l_orderkey == dim.o_orderkey, "semi"
    ).count()
    assert got == want


def test_empty_and_all_null_dim(spark):
    """An empty (or all-NULL-key) dim yields an all-zero bitset: every
    fact row is definitively excluded and the join is empty — the same
    answer the exact join gives, reached without scanning fact twice."""
    fact = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    empty = spark.createDataFrame([], "k long")
    nulls = spark.createDataFrame([(None,), (None,)], "k long")
    for dim in (empty, nulls):
        bloom = BJ.build_key_bloom(dim, "k", m_bits=1 << 13)
        n = fact.filter(
            BJ.bloom_might_contain(spark, bloom, "k", 1 << 13)
        ).count()
        assert n == 0
