"""SemDeDup mega-cell re-shard (operators/similarity.semantic_dedup,
r4 VERDICT item 4): a cell whose population exceeds ``max_cell_rows`` is
split by each member's second-nearest centroid BEFORE the grouped map, so
one pathological cell can never become one executor's m×m Gram matrix.
"""

from __future__ import annotations

import numpy as np

from etl_drone_sense_spark.operators import similarity as S


def _corpus(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _centroids(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "cell_id int, embedding array<double>",
    )


def _mega_fixture(spark):
    """60 vectors all nearest centroid 0 (a mega cell), split between
    second-choice centroids 1 and 2; plus 5 near centroid 3 (small cell).
    Within each second-choice subgroup the vectors are exact duplicates of
    the subgroup head, so re-sharding must still find them."""
    rng = np.random.default_rng(7)
    cents = [
        [10.0, 0.0, 0.0, 0.0],
        [9.0, 3.0, 0.0, 0.0],   # second choice for subgroup A
        [9.0, 0.0, 3.0, 0.0],   # second choice for subgroup B
        [0.0, 0.0, 0.0, 10.0],
    ]
    head_a = np.array([10.0, 1.0, 0.0, 0.0])   # near c0, 2nd = c1
    head_b = np.array([10.0, 0.0, 1.0, 0.0])   # near c0, 2nd = c2
    vecs = []
    for i in range(60):
        head = head_a if i % 2 == 0 else head_b
        vecs.append(head * (1.0 + 0.001 * (i // 2)))  # same direction = dup
    for _ in range(5):
        vecs.append(np.array([0.0, 0.0, 0.0, 10.0]) + rng.normal(0, 0.01, 4))
    return _corpus(spark, vecs), _centroids(spark, cents)


def test_megacell_resharded_output_matches_unsharded_for_dup_groups(spark):
    corpus, cents = _mega_fixture(spark)
    # max_cell_rows=20 forces the 60-member cell 0 to re-shard; the two
    # second-choice subgroups each hold colinear (cosine=1) vectors, so
    # every duplicate is still found: exactly one keeper per subgroup.
    out = S.semantic_dedup(
        corpus, cents, threshold=0.9, max_cell_rows=20
    ).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell_id, []).append(r)
    assert len(by_cell[0]) == 60
    kept0 = sorted(r.vec_id for r in by_cell[0] if r.kept)
    assert kept0 == [0, 1]  # one keeper per second-choice subgroup
    # keep-first-by-id holds inside each shard
    assert all(r.n_dup_prior > 0 for r in by_cell[0] if not r.kept)
    assert len(by_cell[3]) == 5


def test_no_megacell_means_identical_to_unsharded(spark):
    corpus, cents = _mega_fixture(spark)
    base = sorted(
        map(tuple, S.semantic_dedup(corpus, cents, 0.9, max_cell_rows=None).collect())
    )
    high = sorted(
        map(tuple, S.semantic_dedup(corpus, cents, 0.9, max_cell_rows=1000).collect())
    )
    assert base == high  # threshold not hit -> bit-identical results


def test_blocked_gram_matches_dense(spark, monkeypatch):
    """Force the blocked lower-triangular Gram path and check it equals
    the dense result on the same group."""
    corpus, cents = _mega_fixture(spark)
    dense = sorted(
        map(tuple, S.semantic_dedup(corpus, cents, 0.9, max_cell_rows=None).collect())
    )
    monkeypatch.setattr(S, "_GRAM_BLOCK", 7)  # way below the 60-member cell
    blocked = sorted(
        map(tuple, S.semantic_dedup(corpus, cents, 0.9, max_cell_rows=None).collect())
    )
    assert dense == blocked
