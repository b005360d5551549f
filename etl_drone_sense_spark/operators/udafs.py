"""Pandas GROUPED_AGG UDAF surface (SURVEY §2 Part B, UDF matrix).

The reference has no aggregate surface at all (its dataflow is one narrow
map, reference task.ts:123-214); this module exists because a complete
engine must let users register custom aggregates, and the scalable way to
do that in PySpark is the Arrow-batched GROUPED_AGG pandas UDF — never a
row-at-a-time Python UDAF.

Scale rule encoded here: a GROUPED_AGG UDF materializes each group as one
in-memory pandas Series on one executor, so it must NEVER see raw fact
rows (an unbounded group OOMs). The shape below pre-shrinks with a
BUILT-IN fixed-point partial aggregate keyed by (group, bucket) — map-side
combinable, shuffles only (group × buckets) rows — and lets the UDAF do
the final, non-distributive math over at most ``buckets`` partials per
group. This is the same partial/final split Spark applies to its own
aggregates, made explicit because custom Python aggregates don't get it
for free.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PRICE_E4 = 10_000  # fixed-point scale: 4 decimal digits of price


def _make_udafs():
    """Build the pandas UDAFs lazily — @pandas_udf resolves its return
    type against the ACTIVE session, so decorating at import time would
    make importing this module require Spark to be up."""

    @F.pandas_udf("double")
    def weighted_avg_e4(wsum: pd.Series, qsum: pd.Series) -> float:
        # Final-stage weighted mean over fixed-point partials. Partials
        # arrive as arbitrary-precision Decimals (see the decimal(38,0)
        # cast in ``weighted_avg_price``) and are summed as PYTHON ints —
        # pandas' .sum() is a numpy int64 reduction that WRAPS silently
        # on overflow, which is exactly the 100 TB regime where per-bucket
        # partials of round(price*1e4)*qty approach 2^63 (ADVICE r5). The
        # single double division + half-up round happen once per group,
        # matching the oracle's round(x, 6) bit-for-bit.
        # skip NULL partials (an all-NULL-price bucket yields a NULL
        # _wsum) the way SQL's sum does — int(None) would throw; a group
        # with NO non-null weighted terms is NULL, exactly like
        # SUM(price*qty)/SUM(qty) (0.0 would conflate "no price data"
        # with "average price is zero" — review catch r6)
        num_vals = [int(x) for x in wsum if x is not None]
        den = sum(int(x) for x in qsum if x is not None)
        if not num_vals or den == 0:
            return None
        num = sum(num_vals)
        x = float(num) / PRICE_E4 / float(den)
        return math.floor(x * 1_000_000 + 0.5) / 1_000_000

    @F.pandas_udf("long")
    def sum_long(qsum: pd.Series) -> int:
        # Exact arbitrary-precision sum of partials (Spark disallows
        # mixing GROUPED_AGG pandas UDFs with built-in aggregates in one
        # agg, so the companion count rides the same Arrow batch as a
        # second UDAF). Python-int summation for the same no-wrap reason
        # as above. All-NULL partials → NULL, mirroring SQL SUM and the
        # r6 weighted_avg_e4 fix — the same all-NULL group must not get
        # NULL from one UDAF and 0 from its companion (r6 ADVICE).
        vals = [int(x) for x in qsum if x is not None]
        if not vals:
            return None
        return int(sum(vals))

    return weighted_avg_e4, sum_long


def weighted_avg_price(
    df: DataFrame,
    group_col: str,
    price_col: str,
    qty_col: str,
    bucket: Column,
    buckets: int = 256,
) -> DataFrame:
    """Quantity-weighted average price per group via a GROUPED_AGG pandas
    UDAF over built-in fixed-point partials.

    Returns (group_col, weighted_avg_price, n_units). ``bucket`` is any
    deterministic int expression over the row (e.g. ``pmod(l_orderkey,
    256)``) used only to bound the partial relation's size per group.
    """
    # Fixed-point arithmetic stays in DECIMAL end to end: the row term
    # multiplies two decimal(19,0) operands (product type decimal(38,0)
    # — exact for any int64-ranged inputs; a long×long product would
    # wrap at 2^63 BEFORE any widening cast) and the PARTIAL SUM is a
    # decimal sum — a sum(long) would itself wrap silently once a bucket
    # accumulates ~2^63 of fixed-point units (ADVICE r5). Spark's
    # decimal aggregation is exact to 38 digits and nulls/raises rather
    # than wrapping beyond that.
    partial = (
        df.groupBy(F.col(group_col), F.pmod(bucket, F.lit(buckets)).alias("_b"))
        .agg(
            F.sum(
                F.round(F.col(price_col) * PRICE_E4)
                .cast("long")
                .cast("decimal(19,0)")
                * F.col(qty_col).cast("decimal(19,0)")
            ).alias("_wsum"),
            F.sum(F.col(qty_col).cast("decimal(38,0)")).alias("_qsum"),
        )
    )
    weighted_avg_e4, sum_long = _make_udafs()
    return partial.groupBy(group_col).agg(
        weighted_avg_e4("_wsum", "_qsum").alias("weighted_avg_price"),
        sum_long("_qsum").alias("n_units"),
    )
