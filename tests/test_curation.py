"""Round-4 curation operators: snapshot-diff/merge round trip, SemDeDup
keep-policy invariants, bigram-LM relation sanity (value parity itself is
covered by tests/test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_drone_sense_spark.operators.merge import merge_into, snapshot_diff
from etl_drone_sense_spark.plans.curation import (
    cdc_snapshot_diff,
    dedup_semantic,
    text_bigram_lm,
)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_snapshot_diff_roundtrip(spark, sf_dir):
    """snapshot_diff is the inverse of merge_into: applying the derived
    changelog to the old snapshot reproduces the new snapshot exactly."""
    from etl_drone_sense_spark.sources.readers import read_table

    old = read_table(spark, sf_dir, "nation")
    new = (
        old.filter(F.col("n_nationkey") % 7 != 0)
        .withColumn(
            "n_name",
            F.when(
                F.col("n_nationkey") % 5 == 0, F.lit("edited")
            ).otherwise(F.col("n_name")),
        )
        .unionByName(
            old.filter(F.col("n_nationkey") % 11 == 0).select(
                (F.col("n_nationkey") + 100).alias("n_nationkey"),
                "n_name",
                "n_regionkey",
            )
        )
    )
    diff = snapshot_diff(old, new, ["n_nationkey"])
    ops = {r.op for r in diff.collect()}
    assert ops == {"I", "U", "D"}  # the mutation exercises every tier
    merged = merge_into(old, diff, ["n_nationkey"]).drop("action")
    assert _rows(merged) == _rows(new)


def test_snapshot_diff_delete_carries_preimage(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    new = spark.createDataFrame([(2, "b")], "k long, v string")
    d = snapshot_diff(old, new, ["k"]).collect()
    assert len(d) == 1 and d[0].op == "D" and d[0].v == "a"  # Delta-CDF preimage


def test_snapshot_diff_identical_rows_absent(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "k long, v string")
    assert snapshot_diff(df, df, ["k"]).count() == 0  # null-safe comparison


def test_semantic_dedup_keep_policy(spark, sf_dir):
    """Greedy keep-first-by-id: every dropped vector has a ≥-threshold
    LOWER-id neighbor in its own cell; kept vectors have none. The seeded
    companions guarantee the check is non-vacuous."""
    out = dedup_semantic(spark, sf_dir).collect()
    dropped = [r for r in out if not r.kept]
    kept = [r for r in out if r.kept]
    assert dropped, "seeding must produce semantic duplicates"
    assert all(r.n_dup_prior > 0 for r in dropped)
    assert all(r.n_dup_prior == 0 for r in kept)
    # Exactly one row per input vector (500 fixture + 50 companions).
    assert len(out) == 550


def test_cdc_diff_tiers_nonvacuous(spark, sf_dir):
    ops = {
        r.op: r.n
        for r in cdc_snapshot_diff(spark, sf_dir)
        .groupBy("op")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(ops) == {"I", "U", "D"} and min(ops.values()) > 0


def test_bigram_lm_excludes_short_docs(spark, sf_dir):
    """Docs with < 2 tokens yield no bigrams (unpadded n-gram semantics)
    and must be absent; every present doc has n_bigrams = n_tokens - 1."""
    from etl_drone_sense_spark.functions import text as TXT
    from etl_drone_sense_spark.sources.readers import read_table

    scored = {r.doc_id: r for r in text_bigram_lm(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", TXT.token_count(F.col("text")).alias("nt")
    )
    for row in docs.collect():
        if row.nt < 2:
            assert row.doc_id not in scored
        else:
            assert scored[row.doc_id].n_bigrams == row.nt - 1
