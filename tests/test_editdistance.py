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
