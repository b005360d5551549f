"""MERGE INTO (CDC upsert) for lake-table maintenance.

The reference pipeline (task.ts:1-224) is insert-only: every run POSTs a
fresh FeatureCollection. A 100 TB lake additionally needs the *mutation*
primitive — apply a changelog batch (inserts / updates / deletes) to a
large target table in one pass. This module implements Delta/Iceberg-style
MERGE semantics as a single full-outer sort-merge join:

* matched  + op 'U'  -> row takes the update's values   (action 'updated')
* matched  + op 'D'  -> row is removed                  (action 'deleted',
                        filtered out of the merged output)
* unmatched update, op in ('I','U') -> row is inserted  (action 'inserted')
* unmatched update, op 'D'          -> no-op (delete of an absent key)
* unmatched target                  -> row kept as-is   (action 'kept')

Scale shape: ONE shuffle — both sides hash-partitioned on the merge keys
for the full-outer sort-merge join; no driver materialization, no second
pass. When the changelog is small relative to the target (the common CDC
case) Catalyst/AQE can instead broadcast the update side; when the target
is bucketed on the keys, the target-side exchange disappears entirely
(tests/test_bucketing.py proves that plan shape). For transactional
publication pair the
merged result with sources/table_commit.py: write the merged snapshot to
a fresh versioned prefix and CAS the manifest pointer
(tests/test_merge.py covers that composition).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERGE_ACTION_COL = "action"


def merge_into(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a changelog ``updates`` (op column: 'I'/'U'/'D') to ``target``.

    Returns the merged table: target schema plus an ``action`` column
    ('kept' | 'updated' | 'inserted'). Deleted rows are absent. The update
    side must carry every target column (values for 'D' rows may be null).

    Deterministic: one update row per key is required (enforced — duplicate
    changelog keys would make the merge order-dependent, the classic
    MERGE cardinality trap; Delta raises the same error). Enforcement is
    IN-PLAN, not an eager pre-pass: a count() window over the update side's
    merge keys feeds a raise_error branch, so the check executes inside the
    same job as the merge (the window's hash partitioning on the keys is
    the same exchange the full-outer join needs — no extra shuffle). For an
    eager fail-fast on ingest paths, call assert_unique_changelog instead.
    """
    value_cols = [c for c in target.columns if c not in keys]
    missing = [c for c in (*keys, *value_cols) if c not in updates.columns]
    if missing:
        raise ValueError(f"updates side is missing target columns: {missing}")

    dup_n = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    tgt = target.withColumn("_t_present", F.lit(True)).alias("t")
    upd = (
        updates.withColumn("_u_present", F.lit(True))
        .withColumn("_u_dup_n", dup_n)
        .alias("u")
    )

    cond = reduce(
        Column.__and__,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys],
    )
    joined = tgt.join(upd, cond, "full_outer")

    t_here = F.col("t._t_present").isNotNull()
    u_here = F.col("u._u_present").isNotNull()
    op = F.col(f"u.{op_col}")

    action = (
        F.when(
            u_here & (F.col("u._u_dup_n") > 1),
            F.raise_error(
                F.concat(
                    F.lit("changelog has duplicate merge key ("),
                    F.concat_ws(
                        ", ", *[F.col(f"u.{k}").cast("string") for k in keys]
                    ),
                    F.lit(") — MERGE would be nondeterministic"),
                )
            ).cast("string"),
        )
        .when(t_here & ~u_here, F.lit("kept"))
        .when(t_here & u_here & (op == "D"), F.lit("deleted"))
        .when(t_here & u_here, F.lit("updated"))
        .when(~t_here & u_here & (op != "D"), F.lit("inserted"))
        .otherwise(F.lit("noop"))  # delete of an absent key
    )
    take_update = action.isin("updated", "inserted")

    out_cols = [
        F.coalesce(F.col(f"u.{k}"), F.col(f"t.{k}")).alias(k) for k in keys
    ] + [
        F.when(take_update, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in value_cols
    ]
    return joined.select(*out_cols, action.alias(MERGE_ACTION_COL)).filter(
        ~F.col(MERGE_ACTION_COL).isin("deleted", "noop")
    )


def assert_unique_changelog(updates: DataFrame, keys: list[str]) -> None:
    """Fail fast if the changelog has duplicate merge keys (would make
    MERGE nondeterministic). One agg over the (small) update side; call it
    on ingest paths where the changelog source can't guarantee uniqueness."""
    dup = (
        updates.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"changelog has duplicate merge key {tuple(dup[0][k] for k in keys)}"
        )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Derive the CDC changelog between two table snapshots — the INVERSE
    of ``merge_into``: ``merge_into(old, snapshot_diff(old, new, keys),
    keys)`` reproduces ``new`` (tests/test_merge.py pins the round trip).
    This is Delta's Change-Data-Feed shape computed from plain snapshots:

    * key only in ``old``           -> op 'D' (old values carried — the
                                       delete preimage, like Delta CDF)
    * key only in ``new``           -> op 'I' (new values)
    * key in both, any value differs-> op 'U' (new values)
    * identical rows                -> absent from the changelog

    Scale shape: ONE full-outer hash join, both sides partitioned on the
    keys; change detection is a null-safe struct comparison, so it costs a
    map-side expression, not a second pass. Works on any two versions of a
    table_commit table via read_table(root, version) — time travel in,
    changelog out.
    """
    value_cols = [c for c in old.columns if c not in keys]
    if [c for c in new.columns if c not in keys] != value_cols:
        raise ValueError("snapshot schemas must match")

    o = old.withColumn("_o_present", F.lit(True)).alias("o")
    n = new.withColumn("_n_present", F.lit(True)).alias("n")
    cond = reduce(
        Column.__and__,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys],
    )
    joined = o.join(n, cond, "full_outer")
    o_here = F.col("o._o_present").isNotNull()
    n_here = F.col("n._n_present").isNotNull()
    changed = ~F.struct(*[F.col(f"o.{c}") for c in value_cols]).eqNullSafe(
        F.struct(*[F.col(f"n.{c}") for c in value_cols])
    )
    op = (
        F.when(o_here & ~n_here, F.lit("D"))
        .when(~o_here & n_here, F.lit("I"))
        .when(changed, F.lit("U"))
    )
    use_new = op.isin("I", "U")
    out = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
    ] + [
        F.when(use_new, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}")).alias(c)
        for c in value_cols
    ]
    return joined.select(op.alias(op_col), *out).filter(F.col(op_col).isNotNull())


def merge_into_committed(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    table_root: str,
    op_col: str = "op",
):
    """MERGE + transactional publish: write the merged snapshot (minus the
    bookkeeping ``action`` column) to a fresh versioned prefix under
    ``table_root`` and atomically swap the manifest pointer
    (sources/table_commit.py — PUT-if-absent snapshot, monotonic publish).
    Readers either see the old snapshot or the new one, never a mix.
    Returns the committed Snapshot."""
    from ..sources.table_commit import commit

    merged = merge_into(target, updates, keys, op_col=op_col).drop(MERGE_ACTION_COL)
    return commit(merged, table_root, mode="overwrite", _operation="merge")
