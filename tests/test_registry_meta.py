"""Registry self-consistency: the driver contract degrades silently when
these drift (a bench query with no budget, an undeclared rows-only entry,
a forced-head name that no longer exists), so pin them."""

from __future__ import annotations

from etl_drone_sense_spark.plans import registry as RG

RG.all_queries()  # populate

# The ONLY queries allowed to ship without a DuckDB oracle, with the
# documented reason (SURVEY §2.D). sim_kmeans_ivf_topk left this set in
# r5 (bounded-quality oracle); stream_tumbling_counts left it in r6 (the
# bounded two-batch complete-mode replay made it SQL-expressible). The
# set is now EMPTY: every registered query carries a full hash oracle.
DECLARED_ROWS_ONLY: set[str] = set()


def test_rows_only_set_is_exactly_the_declared_one():
    actual = {n for n, s in RG.REGISTRY.items() if s.oracle is None}
    assert actual == DECLARED_ROWS_ONLY


def test_every_bench_query_has_a_budget():
    import bench

    bench_names = {n for n, s in RG.REGISTRY.items() if s.bench}
    missing = bench_names - set(bench.BUDGETS_S)
    assert not missing, f"bench queries without a budget: {sorted(missing)}"


def test_touched_and_checked_names_exist():
    known = set(RG.REGISTRY) | set(RG.RETIRED)
    for group in (
        RG.TOUCHED_R10,
        RG.TOUCHED_R09,
        RG.TOUCHED_R08,
        RG.TOUCHED_R07,
        RG.TOUCHED_R06,
        RG.TOUCHED_R05,
        RG.DRIVER_CHECKED_R09,
        RG.DRIVER_CHECKED_R07,
        RG.DRIVER_CHECKED_R06,
        RG.DRIVER_CHECKED_R05,
        RG.DRIVER_CHECKED_R04,
        RG.DRIVER_CHECKED_R03,
        RG.DRIVER_CHECKED_R02,
        RG.DRIVER_CHECKED_R01,
    ):
        stale = set(group) - known
        assert not stale, f"window bookkeeping names not in registry: {stale}"


def test_retired_names_stay_retired():
    """A retired name must not quietly re-enter the registry (the whole
    point of retirement was removing the sf1-incapable default path)."""
    ghosts = set(RG.RETIRED) & set(RG.REGISTRY)
    assert not ghosts, f"retired names re-registered: {sorted(ghosts)}"


def _ever_checked() -> set[str]:
    return (
        set(RG.DRIVER_CHECKED_R01)
        | set(RG.DRIVER_CHECKED_R02)
        | set(RG.DRIVER_CHECKED_R03)
        | set(RG.DRIVER_CHECKED_R04)
        | set(RG.DRIVER_CHECKED_R05)
        | set(RG.DRIVER_CHECKED_R06)
        | set(RG.DRIVER_CHECKED_R07)
        | set(RG.DRIVER_CHECKED_R09)
    )


def test_r9_fold_covers_the_r8_gap():
    """CORRECTNESS_r08.json never landed, so DRIVER_CHECKED_R09 (the r9
    artifact's exact key set) must cover every r8- and r9-touched name —
    otherwise some changed code still has only pre-change evidence."""
    uncovered = (set(RG.TOUCHED_R08) | set(RG.TOUCHED_R09)) - set(
        RG.DRIVER_CHECKED_R09
    )
    assert not uncovered, f"touched r8/r9 names without an r9 row: {uncovered}"


def test_window_head_covers_everything_unverified_or_touched():
    """The driver checks the FIRST ~50 names: every touched-this-round and
    every never-driver-checked query must sort inside that window. After
    the r9 fold the never-checked set should be empty — every registered
    name has at least one green driver row."""
    order = list(RG.all_queries())
    head = set(order[:50])
    must_be_in_head = set(RG.TOUCHED_R10) & set(order) | (
        set(order) - _ever_checked()
    )
    missing = must_be_in_head - head
    assert not missing, f"outside the driver window: {sorted(missing)}"


def test_window_head_leads_with_stalest_tier():
    """After the touched/never-checked block, remaining window slots must
    fill with the stalest-evidence tier — the 13 scalar/window-function
    primitives whose NEWEST driver row is round 4 (r9 VERDICT item 1).
    r10's touched head is small enough that the full tier must fit inside
    the 50-name window this time."""
    order = list(RG.all_queries())
    fresher = (
        set(RG.DRIVER_CHECKED_R05)
        | set(RG.DRIVER_CHECKED_R06)
        | set(RG.DRIVER_CHECKED_R07)
        | set(RG.DRIVER_CHECKED_R09)
    )
    touched = set(RG.TOUCHED_R10)
    stale_tier = [
        n
        for n in RG.REGISTRY
        if n in RG.DRIVER_CHECKED_R04
        and n not in fresher
        and n not in touched
    ]
    assert set(stale_tier) == {
        "array_funcs",
        "case_bucketing",
        "date_funcs",
        "json_funcs",
        "math_funcs",
        "set_ops",
        "string_funcs",
        "subquery_exists_notin",
        "subquery_scalar_correlated",
        "window_lag_lead",
        "window_rank_navigation",
        "window_running_sum",
        "window_topk_per_group",
    }, "stale-tier membership drifted — re-derive the rotation plan"
    pos = {n: i for i, n in enumerate(order)}
    worst_stale = max(pos[n] for n in stale_tier)
    assert worst_stale < 50, "r4 stale tier does not fit in the driver window"
    fresh_only = fresher - set(RG.DRIVER_CHECKED_R04) - touched
    first_fresh = min(pos[n] for n in fresh_only)
    assert worst_stale < first_fresh, (
        "a freshly-certified query sorts ahead of the r4 stale tier"
    )
