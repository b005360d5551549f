"""End-to-end corpus-prep pipeline (corpus_prepare_pipeline): the staged
composition Gopher → PII redact → exact dedup → MinHash dedup → split →
pack. Unit queries cover each stage; these tests pin the COMPOSITION —
stage counts are monotone, survivors are a subset of the input, and the
packing arithmetic is internally consistent in the final output.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from etl_drone_sense_spark.functions import text as TXT
from etl_drone_sense_spark.plans.extensions import (
    PACK_BUDGET,
    corpus_prepare_pipeline,
)
from etl_drone_sense_spark.plans.registry import t


def test_stage_counts_monotone(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_gopher = docs.filter(
        TXT.gopher_pass(TXT.gopher_features(F.col("text")))
    ).count()
    out = corpus_prepare_pipeline(spark, sf_dir).collect()

    # Every downstream stage can only shrink the relation; the quality
    # gate and the dedups must each actually fire on the fixture
    # (otherwise the pipeline test is vacuous).
    assert 0 < n_gopher < n_docs
    assert 0 < len(out) <= n_gopher

    # Output ids are a subset of the gate's survivors (no resurrection,
    # no fabricated rows) and unique (dedup did not duplicate).
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))
    gopher_ids = {
        r["doc_id"]
        for r in docs.filter(
            TXT.gopher_pass(TXT.gopher_features(F.col("text")))
        ).select("doc_id").collect()
    }
    assert set(ids) <= gopher_ids


def test_packing_arithmetic_consistent(spark, sf_dir):
    rows = corpus_prepare_pipeline(spark, sf_dir).collect()
    by_part = defaultdict(list)
    for r in rows:
        by_part[(r["source"], r["split"])].append(r)
    assert len(by_part) > 1  # multiple (source, split) partitions exist
    for part in by_part.values():
        part.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in part:
            assert r["start_offset"] == offset
            assert r["pack_id"] == offset // PACK_BUDGET
            assert r["n_tokens"] > 0
            offset += r["n_tokens"]


def test_split_values(spark, sf_dir):
    splits = {
        r["split"]
        for r in corpus_prepare_pipeline(spark, sf_dir)
        .select("split").distinct().collect()
    }
    assert splits <= {"train", "val", "test"}
    assert "train" in splits
