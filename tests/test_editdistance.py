"""FastSS edit-distance join: candidate completeness vs the quadratic
definition (the blind spot a mirrored oracle can't see — same pattern as
the geo_radius_join blocked-vs-quadratic certification)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_drone_sense_spark.operators.dedup import editdistance_pairs


def _levenshtein(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_neighborhood_join_equals_quadratic_definition(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.lower(F.substring("text", 1, 24)).alias("key"))
    )
    got = {
        (r["id_a"], r["id_b"]): r["edist"]
        for r in editdistance_pairs(docs, "doc_id", F.col("key")).collect()
    }
    rows = [(r["doc_id"], r["key"]) for r in docs.collect()]
    expected = {}
    for i, (ia, ka) in enumerate(rows):
        for ib, kb in rows[i + 1:]:
            d = _levenshtein(ka, kb)
            if d <= 1:
                lo, hi = min(ia, ib), max(ia, ib)
                expected[(lo, hi)] = d
    assert got == expected
    assert expected  # non-vacuous: the fixture must contain true pairs


def test_edge_strings(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "ab"), (4, ""), (5, ""), (6, "xyz")],
        "doc_id long, key string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["edist"]
        for r in editdistance_pairs(df, "doc_id", F.col("key")).collect()
    }
    assert got == {
        (1, 2): 1,   # substitution
        (1, 3): 1,   # deletion
        (2, 3): 1,
        (4, 5): 0,   # two empties: identical
    }


def test_wider_radius_refused(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, key string")
    with pytest.raises(ValueError, match="max_ed must be 1"):
        editdistance_pairs(df, "doc_id", F.col("key"), max_ed=2)


def test_passjoin_equals_quadratic_definition(spark, duck, sf_dir):
    """Radius-2 PassJoin vs an INDEPENDENT quadratic DuckDB levenshtein
    join on the same keys — candidate completeness ground truth (the
    registry oracle mirrors the segment construction, so this is the
    check that would catch a shared pigeonhole blind spot)."""
    from etl_drone_sense_spark.operators.dedup import editdistance_pairs_passjoin

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.lower(F.substring("text", 1, 12)).alias("key"))
    )
    got = {
        (r["id_a"], r["id_b"]): r["edist"]
        for r in editdistance_pairs_passjoin(
            docs, "doc_id", F.col("key"), max_ed=2
        ).collect()
    }
    expected = {
        (ia, ib): d
        for ia, ib, d in duck.execute(
            """
            WITH k AS (SELECT doc_id, lower(substr(text,1,12)) AS key
                       FROM documents WHERE text IS NOT NULL)
            SELECT a.doc_id, b.doc_id, levenshtein(a.key, b.key)
            FROM k a JOIN k b ON a.doc_id < b.doc_id
            WHERE levenshtein(a.key, b.key) <= 2
            """
        ).fetchall()
    }
    assert got == expected
    assert expected  # non-vacuous at the test SF


def test_passjoin_refuses_mixed_lengths(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "abcde")], "doc_id long, key string"
    )
    with pytest.raises(ValueError, match="fixed-length"):
        from etl_drone_sense_spark.operators.dedup import (
            editdistance_pairs_passjoin,
        )

        editdistance_pairs_passjoin(df, "doc_id", F.col("key"), max_ed=2)


def test_passjoin_catches_shifted_segment_pairs(spark):
    """Directed edge cases: indel pairs that shift segment alignment —
    the case a substitution-only filter would also catch, PLUS the
    shift=±2 extremes that require the full probe grid."""
    from etl_drone_sense_spark.operators.dedup import editdistance_pairs_passjoin

    rows = [
        (1, "abcdefghijkl"),
        (2, "Xabcdefghijk"),  # insert front + delete tail: segments shift +1
        (3, "bcdefghijklX"),  # delete front + insert tail: segments shift -1
        (4, "abcdefghijkX"),  # one substitution at the tail
        (5, "abXdefghiXkl"),  # two substitutions straddling two segments
        (6, "zzzzzzzzzzzz"),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    got = {
        (r["id_a"], r["id_b"]): r["edist"]
        for r in editdistance_pairs_passjoin(
            df, "doc_id", F.col("key"), max_ed=2
        ).collect()
    }
    assert got[(1, 2)] == 2 and got[(1, 3)] == 2
    assert got[(1, 4)] == 1 and got[(1, 5)] == 2
    assert all(6 not in p for p in got)


def test_operators_handle_empty_corpus(spark):
    """An empty corpus yields empty pair relations — never a driver
    error (a 100 TB pipeline's first partition filter can legitimately
    drop everything)."""
    from etl_drone_sense_spark.operators.dedup import (
        editdistance_pairs,
        editdistance_pairs_passjoin,
    )

    empty = spark.createDataFrame([], "doc_id long, key string")
    assert editdistance_pairs(empty, "doc_id", F.col("key")).count() == 0
    assert (
        editdistance_pairs_passjoin(
            empty, "doc_id", F.col("key"), max_ed=2
        ).count()
        == 0
    )
