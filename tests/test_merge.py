"""MERGE INTO semantics (operators/merge.py): the four action tiers on a
hand-built target/changelog pair, the cardinality guard, and the
transactional merge→table_commit composition."""

from __future__ import annotations

import pytest

from etl_drone_sense_spark.operators.merge import (
    assert_unique_changelog,
    merge_into,
    merge_into_committed,
)
from etl_drone_sense_spark.sources import table_commit as tc

TGT_SCHEMA = "k long, name string, bal double"
UPD_SCHEMA = "k long, op string, name string, bal double"


@pytest.fixture
def target(spark):
    return spark.createDataFrame(
        [(1, "ann", 10.0), (2, "bob", 20.0), (3, "cal", 30.0), (4, "dee", 40.0)],
        TGT_SCHEMA,
    )


@pytest.fixture
def updates(spark):
    return spark.createDataFrame(
        [
            (2, "U", "bob2", 22.0),  # matched update
            (3, "D", None, None),  # matched delete
            (5, "I", "eve", 50.0),  # unmatched insert
            (9, "D", None, None),  # delete of absent key -> no-op
        ],
        UPD_SCHEMA,
    )


def test_merge_actions(spark, target, updates):
    out = {r.k: r for r in merge_into(target, updates, ["k"]).collect()}
    assert set(out) == {1, 2, 4, 5}  # 3 deleted, 9 no-op
    assert out[1].action == "kept" and out[1].name == "ann"
    assert out[2].action == "updated" and out[2].name == "bob2" and out[2].bal == 22.0
    assert out[4].action == "kept"
    assert out[5].action == "inserted" and out[5].bal == 50.0


def test_merge_upsert_op_inserts_when_unmatched(spark, target):
    # 'U' on an unmatched key behaves as insert (upsert semantics).
    upd = spark.createDataFrame([(7, "U", "gil", 70.0)], UPD_SCHEMA)
    out = {r.k: r.action for r in merge_into(target, upd, ["k"]).collect()}
    assert out[7] == "inserted"
    assert len(out) == 5


def test_merge_missing_column_raises(spark, target):
    upd = spark.createDataFrame([(1, "U", "x")], "k long, op string, name string")
    with pytest.raises(ValueError, match="missing target columns"):
        merge_into(target, upd, ["k"])


def test_duplicate_changelog_guard(spark, updates):
    dup = updates.union(updates.limit(1))
    with pytest.raises(ValueError, match="duplicate merge key"):
        assert_unique_changelog(dup, ["k"])
    assert_unique_changelog(updates, ["k"])  # clean changelog passes


def test_merge_into_enforces_unique_changelog(spark, target, updates):
    """merge_into itself must refuse a duplicate-key changelog (in-plan
    raise_error at action time), not silently fan out the join."""
    dup = updates.union(updates.limit(1))
    with pytest.raises(Exception, match="duplicate merge key"):
        merge_into(target, dup, ["k"]).collect()


def test_merge_into_committed_versions(spark, tmp_path, target, updates):
    root = str(tmp_path / "dim")
    tc.commit(target, root)
    snap = merge_into_committed(
        tc.read_table(spark, root), updates, ["k"], root
    )
    assert snap.version == 2 and snap.operation == "merge"
    now = {r.k: r for r in tc.read_table(spark, root).collect()}
    assert set(now) == {1, 2, 4, 5} and now[2].name == "bob2"
    assert "action" not in tc.read_table(spark, root).columns
    # Time travel: the pre-merge snapshot still reads the original 4 keys.
    before = {r.k for r in tc.read_table(spark, root, version=1).collect()}
    assert before == {1, 2, 3, 4}
