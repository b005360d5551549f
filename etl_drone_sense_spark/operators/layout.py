"""Z-order write layout for managed tables — the PRODUCTION path that
``plans/curation.layout_zorder`` demonstrates with ntile at test scale.

``commit_zordered`` is Delta ``OPTIMIZE ZORDER BY`` / Iceberg sort-order
as a write: normalize the layout columns to a shared bit budget
(integer-exact min/max scaling — unequal-width columns otherwise
degenerate the interleave into a plain sort on the wider column's high
bits), bit-interleave them into a Morton z-value (pure unrolled integer
expression, codegen, no UDF), ``repartitionByRange`` on it (one
range-partitioner SAMPLE pass — not a global sort), sort within each
partition, and commit with per-file min/max stats on the layout columns.
Files then cover small rectangles of the (c1, c2) plane, so
``read_table_pruned`` on EITHER column skips most of them.

Scale shape: one tiny extent agg (broadcast back), one narrow z-value
projection, one range shuffle sized by ``n_files`` — the same cost as any
clustered write; the win is every later scan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 8  # per-dimension bit budget after normalization


def morton_col(x, y, bits: int = Z_BITS):
    """Bit-interleave two ≤``bits``-bit non-negative ints (Morton/Z-value)
    as a pure integer expression — unrolled, codegen-friendly, no UDF."""
    total = F.lit(0).cast("long")
    for i in range(bits):
        total = (
            total
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return total


def with_zvalue(
    df: DataFrame, c1: str, c2: str, bits: int = Z_BITS, zcol: str = "_zval"
) -> DataFrame:
    """Append the Morton z-value of integer columns (c1, c2), each first
    normalized to ``bits`` bits by an integer-exact min/max scale (one
    tiny agg joined back as a broadcast)."""
    ext = df.agg(
        F.min(c1).alias("_min1"),
        F.max(c1).alias("_max1"),
        F.min(c2).alias("_min2"),
        F.max(c2).alias("_max2"),
    )
    scale = 2**bits
    normed = df.crossJoin(F.broadcast(ext))
    xs = F.expr(f"({c1} - _min1) * {scale} div (_max1 - _min1 + 1)")
    ys = F.expr(f"({c2} - _min2) * {scale} div (_max2 - _min2 + 1)")
    return normed.withColumn(zcol, morton_col(xs, ys, bits)).drop(
        "_min1", "_max1", "_min2", "_max2"
    )


def commit_zordered(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    cols: tuple[str, str],
    n_files: int = 16,
    stats_cols: list[str] | None = None,
    mode: str = "overwrite",
):
    """Write ``df`` z-ordered on two integer layout columns as a managed-
    table commit with data-skipping stats (defaults to stats on the layout
    columns themselves). Returns the committed Snapshot."""
    from ..sources import table_commit as TC

    c1, c2 = cols
    keyed = with_zvalue(df, c1, c2)
    clustered = (
        keyed.repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
    )
    return TC.commit(
        clustered, root, mode=mode, stats_cols=stats_cols or list(cols)
    )
