"""Incremental aggregate maintenance — the materialized-view pattern
over the committed-table layer.

At 100 TB you do not recompute a dashboard aggregate from the full fact
table on every refresh; you maintain it: each append's DELTA collapses
to group partials (map-side combine does most of the work), and the
stored aggregate advances by a keyed merge — work is O(delta + groups),
never O(table). That only works for aggregates that form a commutative
monoid under addition (counts, fixed-point sums, min/max with a
different combine — anything whose partial states merge associatively);
AVG and friends are maintained as (sum, count) pairs and finalized at
read time. This is exactly Spark's own partial-aggregation contract
(HashAggregate partial → final), lifted across commits instead of
across shuffle stages.

``combine_additive`` is the merge step: a full-outer join on the group
keys where every non-key column is an additive partial. Absent groups
on either side contribute zero — so a brand-new group appears, an
untouched group persists, and the merge is idempotent-composable with
``commit(..., txn=...)`` for exactly-once maintenance under replays
(the process_table_appends at-least-once contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combine_additive(
    current: DataFrame, partial: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge two additive-partial relations keyed on ``keys``: every
    non-key column is summed positionally by NAME (both sides must
    carry the same schema — the stored aggregate and the fresh delta
    partials). Groups absent from one side pass through unchanged
    (coalesce-to-zero), so the merge is the monoid operation, not an
    overwrite.

    Plan shape: ONE full-outer hash join on the group keys. Both sides
    are group-cardinality-sized, not fact-sized — the whole point of
    maintaining partials."""
    val_cols = [c for c in partial.columns if c not in keys]
    if set(current.columns) != set(partial.columns):
        raise ValueError(
            "combine_additive: schema mismatch between stored aggregate "
            f"{sorted(current.columns)} and delta partials "
            f"{sorted(partial.columns)}"
        )
    a, b = current.alias("a"), partial.alias("b")
    merged = a.join(b, keys, "full_outer")
    return merged.select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"a.{c}"), F.lit(0))
                + F.coalesce(F.col(f"b.{c}"), F.lit(0))
            ).alias(c)
            for c in val_cols
        ],
    )


def maintain_agg_table(
    spark,
    src_root: str,
    agg_root: str,
    checkpoint_file: str,
    partials_of,
    keys: list[str],
    app_id: str = "incremental_agg",
) -> int:
    """Drain NEW appends from the managed table at ``src_root`` and
    advance the stored aggregate at ``agg_root``: for each batch,
    ``partials_of(batch_df)`` computes the group partials (delta-sized
    work), ``combine_additive`` merges them into the stored relation,
    and the result commits with a txn watermark so a replayed batch
    no-ops — at-least-once delivery, exactly-once maintenance. Returns
    the number of new files processed (0 = aggregate already current)."""
    import os

    from ..sources import table_commit as TC

    def handle(batch_df: DataFrame, version: int) -> None:
        delta = partials_of(batch_df)
        if TC.current_version(agg_root) is not None:
            merged = combine_additive(
                TC.read_table(spark, agg_root), delta, keys
            )
        else:
            merged = delta
        TC.commit(
            merged,
            agg_root,
            mode="overwrite",
            _operation="incremental_agg",
            txn=(app_id, version),
        )

    os.makedirs(os.path.dirname(checkpoint_file) or ".", exist_ok=True)
    return TC.process_table_appends(spark, src_root, checkpoint_file, handle)
