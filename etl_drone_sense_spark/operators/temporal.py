"""Temporal joins (as-of) — a custom operator Spark lacks natively.

``asof_join`` attaches, to each left row, the most recent right row with
``right_ts <= left_ts`` for the same key (the standard market-data /
telemetry enrichment join; DuckDB/Pandas call it ASOF JOIN).

Scale shape — the union+window formulation, NOT a range join:
* tag both inputs and ``unionByName`` them (narrow);
* one shuffle on the join key; within each key, sort by (ts, side) and
  carry the right payload forward with ``last(..., ignorenulls=True)``;
* keep left rows.

Cost is one shuffle + one sort — identical to a SortMergeJoin — and is
independent of time-gap width. The naive alternative (non-equi range join
then max-per-left-row) explodes to O(|L|·|R|) per key and is exactly the
plan AQE can't save; this form never materializes candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward (inclusive) as-of join: latest right row at-or-before each
    left row's timestamp, per ``on`` key. Right payload columns come back
    suffixed; unmatched left rows keep them null.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]

    l_tag = left.select(
        F.col(on),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (on,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{right_ts}{suffix}"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on,)],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )

    # Right rows sort before left rows at equal timestamps → inclusive <=.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_carry_{c}")
            for c in payload
        ],
    )
    out_cols = [on] + [c for c in left.columns if c not in (on,)] + [
        F.col(f"_carry_{c}").alias(c) for c in payload
    ]
    return carried.filter(F.col("_is_left") == 1).select(*out_cols)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Scalable point-in-interval join: bin to a grid, equi-join, verify.

    A non-equi range condition alone forces a nested-loop join — broadcast
    if one side is small, O(n·m) disaster if neither is. Binning makes it
    an EQUI-join: each point lands in one bin; each interval explodes to
    the bins it spans (``(hi-lo)/bin_width + 1`` rows — pick bin_width on
    the order of the typical interval width); the exact predicate then
    filters the co-binned candidates. One shuffle on the bin key, pair
    work proportional to true matches, AQE handles hot bins.
    """
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, "_bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bin")
    )


def scd2_history(
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    suppress_unchanged: bool = True,
) -> DataFrame:
    """Kimball type-2 slowly-changing-dimension build: turn a change
    stream (key, ts, attrs...) into versioned validity intervals
    ``(key, attrs..., valid_from, valid_to, version)`` — ``valid_to`` is
    NULL on each key's current row, ``version`` counts from 1 in time
    order.

    With ``suppress_unchanged`` (the usual warehouse semantics), a change
    row whose attributes all equal the previous row's is dropped BEFORE
    interval construction, so consecutive identical states collapse into
    one longer-lived version instead of splitting it.

    Caller contract: ``changes`` must be unique per (key, ts) — pre-
    aggregate duplicates (e.g. max per key+ts) so "the state at ts" is
    well-defined; otherwise lead() ordering ties are nondeterministic.

    Scale: both windows and the suppression lag shuffle ONCE on key (the
    three window functions share the same (key, ts) sort under one
    exchange); per-key history is dimension-scale, never fact-scale."""
    w = Window.partitionBy(key).orderBy(ts)
    if suppress_unchanged:
        marked = changes.select(
            "*",
            *[
                F.lag(a).over(w).alias(f"_prev_{a}")
                for a in attrs
            ],
        )
        changed = F.lit(False)
        for a in attrs:
            changed = changed | F.col(f"_prev_{a}").isNull() | (
                F.col(a) != F.col(f"_prev_{a}")
            )
        changes = marked.filter(changed).drop(
            *[f"_prev_{a}" for a in attrs]
        )
    return changes.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
    )
