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


def test_stored_lsh_index_probe_matches_recompute(spark, sf_dir, tmp_path):
    """The growing-lake steady state: minhash signatures committed to a
    managed table (table_commit) per ingest batch, new batches probing the
    STORED index — must produce exactly the pairs the recompute-everything
    incremental operator finds (same hash family ⇒ bit-identical), while
    never re-hashing corpus text."""
    from etl_drone_sense_spark.operators import dedup
    from etl_drone_sense_spark.sources import table_commit as tc

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    new_pred = F.col("doc_id") % 5 == 0  # ~20% "newly ingested"
    corpus, batch = docs.filter(~new_pred), docs.filter(new_pred)

    expected = {
        (r.id_new, r.id_other, r.vs_corpus, round(r.est_jaccard, 9))
        for r in dedup.minhash_lsh_pairs_incremental(
            docs, "doc_id", "text", new_pred, threshold=0.2
        ).collect()
    }
    assert expected, "fixture produced no incremental pairs"

    root = str(tmp_path / "lsh_index")
    tc.commit(dedup.minhash_index(corpus, "doc_id", "text"), root)
    tc.commit(
        dedup.minhash_index(batch, "doc_id", "text"), root, mode="append"
    )

    corpus_idx = tc.read_table(spark, root, version=1)  # pre-batch snapshot
    new_idx = tc.read_table(spark, root).join(
        corpus_idx.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    got = {
        (r.id_new, r.id_other, r.vs_corpus, round(r.est_jaccard, 9))
        for r in dedup.minhash_probe_index(
            new_idx, corpus_idx, "doc_id", threshold=0.2
        ).collect()
    }
    assert got == expected


def test_simhash_key_width_invariance(spark, sf_dir):
    """The adaptive-width contract (r6 VERDICT item 1): prefix keys emit
    a candidate SUPERSET, the exact hamming filter converges every width
    to the same pair set — so the derived width can follow corpus growth
    without changing results. Pin three widths bit-identical, plus the
    derived-width rule's fixture/scale values."""
    from etl_drone_sense_spark.operators import dedup
    from etl_drone_sense_spark.plans.extensions import _adaptive_simhash_bits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    outs = []
    for kb in (4, 7, 12):
        got = sorted(
            map(
                tuple,
                dedup.simhash_pairs(
                    docs, "doc_id", "text", max_hamming=3, nbits=48,
                    blocks=4, key_bits=kb,
                ).collect(),
            )
        )
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 0, "fixture must produce near-dup pairs"

    assert _adaptive_simhash_bits(500) == 7      # sf0.01 documents
    assert _adaptive_simhash_bits(5_000) == 11   # sf0.1
    assert _adaptive_simhash_bits(50_000) == 12  # sf1 → full-block cap
    assert _adaptive_simhash_bits(1) == 4        # floor


def test_simhash_pigeonhole_precondition_enforced(spark, sf_dir):
    """max_hamming >= blocks breaks the pigeonhole recall guarantee —
    the operator must refuse the config loudly rather than silently
    miss pairs (r7 review catch)."""
    import pytest as _pytest

    from etl_drone_sense_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with _pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_pairs(
            docs, "doc_id", "text", max_hamming=4, nbits=48, blocks=4
        )


def test_simhash_bucket_cap_contract(spark, sf_dir):
    """The bounded-emission twin (r10 — r9 VERDICT item 3): the capped
    pair set must be a strict SUBSET of the uncapped truth on a fixture
    whose hottest bucket exceeds the cap (non-vacuous truncation), must
    be EXACT when the cap exceeds every bucket (the documented recall
    bound's boundary case), and must refuse a degenerate cap."""
    import pytest as _pytest

    from etl_drone_sense_spark.operators import dedup
    from etl_drone_sense_spark.plans.extensions import (
        SIM_BUCKET_CAP,
        _adaptive_simhash_bits,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kb = _adaptive_simhash_bits(docs.count())
    kw = dict(max_hamming=3, nbits=48, blocks=4, key_bits=kb)

    truth = set(
        map(tuple, dedup.simhash_pairs(docs, "doc_id", "text", **kw).collect())
    )
    capped = set(
        map(
            tuple,
            dedup.simhash_pairs(
                docs, "doc_id", "text", bucket_cap=SIM_BUCKET_CAP, **kw
            ).collect(),
        )
    )
    assert capped < truth, "cap must truncate on the dup-heavy fixture"
    assert len(capped) > 0, "cap must not empty the result"

    # a cap larger than any bucket is a no-op: recall is exact
    wide_cap = set(
        map(
            tuple,
            dedup.simhash_pairs(
                docs, "doc_id", "text", bucket_cap=10_000_000, **kw
            ).collect(),
        )
    )
    assert wide_cap == truth

    with _pytest.raises(ValueError, match="bucket_cap"):
        dedup.simhash_pairs(docs, "doc_id", "text", bucket_cap=1, **kw)


def test_simhash_pair_budget_guard(spark, sf_dir):
    """The uncapped-audit circuit breaker (r12 — r11 VERDICT item 3):
    a pair_budget below the corpus's exact candidate count must raise
    BEFORE the pair shuffle (naming the count and the hottest bucket),
    a budget at-or-above it must pass the call through unchanged, and a
    degenerate budget must be refused."""
    import pytest as _pytest

    from etl_drone_sense_spark.operators import dedup
    from etl_drone_sense_spark.plans.extensions import _adaptive_simhash_bits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kb = _adaptive_simhash_bits(docs.count())
    kw = dict(max_hamming=3, nbits=48, blocks=4, key_bits=kb)

    # The fixture's hottest bucket has > 2 members, so budget=1 must trip.
    with _pytest.raises(ValueError, match="exceeds\\s+pair_budget"):
        dedup.simhash_pairs(
            docs, "doc_id", "text", pair_budget=1, **kw
        ).collect()

    truth = set(
        map(tuple, dedup.simhash_pairs(docs, "doc_id", "text", **kw).collect())
    )
    guarded = set(
        map(
            tuple,
            dedup.simhash_pairs(
                docs, "doc_id", "text", pair_budget=10_000_000_000, **kw
            ).collect(),
        )
    )
    assert guarded == truth, "an under-budget guard must not change output"

    with _pytest.raises(ValueError, match="pair_budget"):
        dedup.simhash_pairs(docs, "doc_id", "text", pair_budget=0, **kw)


def test_simhash_bucket_cap_plans_window_group_limit(spark, sf_dir):
    """The cap's row_number+filter must compile to WindowGroupLimit
    (per-partition top-k below the window sort — no full bucket
    materialization), and the candidate join must stay a hashed-key
    equi-join, never a cartesian product."""
    from etl_drone_sense_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        dedup.simhash_pairs(
            docs, "doc_id", "text",
            max_hamming=3, nbits=48, blocks=4, key_bits=7, bucket_cap=8,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_simhash_packed_nbits_guard(spark):
    """r17 (r16 ADVICE): conv(bits,2,10).cast('long') overflows for a
    64-bit fingerprint with the MSB set (silent NULL under non-ANSI
    cast, dropping candidate pairs) — the packed builder must refuse
    nbits > 63 loudly, like the key_bits/max_hamming validation."""
    import pytest

    from etl_drone_sense_spark.operators import dedup

    docs = spark.createDataFrame([(1, "aaa"), (2, "aab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="nbits must be <= 63"):
        dedup.simhash_fingerprints_packed(docs, "doc_id", "text", nbits=64)
    # 63 stays legal (the full positive-long range)
    assert dedup.simhash_fingerprints_packed(
        docs, "doc_id", "text", nbits=63
    ).count() == 2
