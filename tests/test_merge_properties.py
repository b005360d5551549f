"""Property-based checks of the CDC algebra (operators/merge.py):
for ANY pair of snapshots over the same key space,

    merge_into(old, snapshot_diff(old, new)) == new      (round trip)
    snapshot_diff(x, x) == empty                         (reflexivity)
    ops partition the changed key space                  (I/U/D disjoint)

Hypothesis drives the snapshot generator; examples are kept small and
few because each example runs Spark jobs (deadline disabled)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_drone_sense_spark.operators.merge import merge_into, snapshot_diff

# A snapshot: unique keys -> (value string | None). Null values exercise
# the null-safe change comparison.
snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=30),
    st.one_of(st.none(), st.text(alphabet="abc", max_size=2)),
    max_size=12,
)


def _df(spark, snap: dict):
    rows = [(k, v) for k, v in sorted(snap.items())]
    return spark.createDataFrame(rows or [(None, None)], "k long, v string").filter(
        "k IS NOT NULL"
    )


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=snapshot, new=snapshot)
def test_diff_then_merge_roundtrip(spark, old, new):
    odf, ndf = _df(spark, old), _df(spark, new)
    diff = snapshot_diff(odf, ndf, ["k"])
    got = merge_into(odf, diff, ["k"]).drop("action")
    assert _rows(got) == _rows(ndf)

    # Ops partition the affected keys correctly.
    by_op: dict[str, set] = {"I": set(), "U": set(), "D": set()}
    for r in diff.collect():
        by_op[r.op].add(r.k)
    assert by_op["I"] == set(new) - set(old)
    assert by_op["D"] == set(old) - set(new)
    assert by_op["U"] == {
        k for k in set(old) & set(new) if old[k] != new[k]
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snap=snapshot)
def test_diff_reflexive_empty(spark, snap):
    df = _df(spark, snap)
    assert snapshot_diff(df, df, ["k"]).count() == 0
