"""GROUPED_AGG pandas UDAF (operators/udafs.py): exact fixed-point
weighted mean on hand-computed values, including the bucket pre-shrink."""

from __future__ import annotations

from etl_drone_sense_spark.operators import udafs
from pyspark.sql import functions as F


def test_weighted_avg_price_exact(spark):
    rows = [
        # group A: (10.00*2 + 20.00*6) / 8 = 17.50
        ("A", 10.00, 2, 1),
        ("A", 20.00, 6, 2),
        # group B: one row -> its own price
        ("B", 99.99, 5, 3),
        # group C: prices with 4 decimals, exact under the e4 fixed point
        ("C", 0.1234, 1, 4),
        ("C", 0.1236, 1, 5),
    ]
    df = spark.createDataFrame(rows, "g string, price double, qty long, oid long")
    out = {
        r.g: r
        for r in udafs.weighted_avg_price(
            df, "g", "price", "qty", bucket=F.col("oid"), buckets=4
        ).collect()
    }
    assert out["A"].weighted_avg_price == 17.5 and out["A"].n_units == 8
    assert out["B"].weighted_avg_price == 99.99 and out["B"].n_units == 5
    assert out["C"].weighted_avg_price == 0.1235 and out["C"].n_units == 2


def test_weighted_avg_partials_bounded_by_buckets(spark):
    """The UDAF's input relation has at most `buckets` rows per group no
    matter how many fact rows feed it — the scale invariant."""
    df = spark.range(10_000).select(
        F.lit("g").alias("g"),
        (F.col("id") % 7).cast("double").alias("price"),
        F.lit(1).alias("qty"),
        F.col("id").alias("oid"),
    )
    partial = df.groupBy(
        F.col("g"), F.pmod(F.col("oid"), F.lit(16)).alias("_b")
    ).agg(F.count(F.lit(1)).alias("n"))
    assert partial.count() <= 16
    out = udafs.weighted_avg_price(
        df, "g", "price", "qty", bucket=F.col("oid"), buckets=16
    ).collect()
    assert out[0].n_units == 10_000


def test_weighted_avg_no_int64_wrap(spark):
    """ADVICE r5 regression: partial sums near/above 2^63 must stay exact.
    Each row contributes round(price*1e4)*qty ≈ 9.2e17 fixed-point units
    (half of int64 max); ten rows in ONE bucket force both the Spark-side
    partial sum and the UDAF's final sum far past 2^63 — a numpy int64
    reduction (or a sum(long) partial) would wrap silently."""
    big_price = 92_233_720_368_547.0  # *1e4 -> ~9.2e17 per unit qty
    rows = [("g", big_price, 1, 0) for _ in range(10)]
    df = spark.createDataFrame(rows, "g string, price double, qty long, oid long")
    out = udafs.weighted_avg_price(
        df, "g", "price", "qty", bucket=F.col("oid"), buckets=4
    ).collect()
    assert out[0].n_units == 10
    # weighted mean of identical prices is the price itself; any wrap
    # would produce a wildly different (likely negative) value.
    assert out[0].weighted_avg_price == big_price


def test_weighted_avg_row_term_exceeds_int64(spark):
    """The ROW-LEVEL product round(price*1e4)*qty must not wrap either:
    each row here contributes ~9.2e20 fixed-point units (100× int64 max)
    — only a decimal product survives. An int64 wrap corrupts the mean
    by orders of magnitude (usually negative); what remains at this
    magnitude is only the final double division's last-ULP rounding,
    which the oracle's double path shares by contract — so assert
    relative error at double precision, not bit equality."""
    big_price = 92_233_720_368_547.0
    rows = [("g", big_price, 1000, 0) for _ in range(3)]
    df = spark.createDataFrame(rows, "g string, price double, qty long, oid long")
    out = udafs.weighted_avg_price(
        df, "g", "price", "qty", bucket=F.col("oid"), buckets=4
    ).collect()
    assert out[0].n_units == 3000
    got = out[0].weighted_avg_price
    assert got > 0 and abs(got - big_price) / big_price < 1e-12


def test_weighted_avg_all_null_price_group(spark):
    """Review catch r6: a group whose every price is NULL produces NULL
    _wsum partials; the UDAF must neither throw int(None) nor fabricate
    0.0 — SQL's SUM(price*qty)/SUM(qty) is NULL when every weighted term
    is NULL, and "no price data" must stay distinguishable from "average
    price is zero"."""
    rows = [("g", None, 2, 0), ("g", None, 3, 1)]
    df = spark.createDataFrame(rows, "g string, price double, qty long, oid long")
    out = udafs.weighted_avg_price(
        df, "g", "price", "qty", bucket=F.col("oid"), buckets=4
    ).collect()
    assert out[0].weighted_avg_price is None
    assert out[0].n_units == 5


def test_sum_long_all_null_group_is_null(spark):
    """r6 ADVICE: the same all-NULL group must get CONSISTENT semantics
    from both UDAFs — a group whose every qty is NULL yields NULL _qsum
    partials, and sum_long must return NULL like SQL SUM (not 0) just as
    weighted_avg_e4 returns NULL (not 0.0)."""
    rows = [("g", 1.5, None, 0), ("g", 2.5, None, 1)]
    df = spark.createDataFrame(rows, "g string, price double, qty long, oid long")
    out = udafs.weighted_avg_price(
        df, "g", "price", "qty", bucket=F.col("oid"), buckets=4
    ).collect()
    assert out[0].weighted_avg_price is None
    assert out[0].n_units is None
