"""Physical-plan assertions: the plans we'd want at 100 TB, locked in tests.

Correctness says the answer is right; these say the *strategy* is right —
broadcast where a side is dimension-sized, pushdown reaching the parquet
scan, top-k without a global sort, partial aggregation before the shuffle,
and no accidental cartesian products in the LSH self-joins. A regression
here is a 100× slowdown at scale that sf0.001 correctness would never see.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from etl_drone_sense_spark.plans.registry import get


def plan_of(spark, sf_dir, name, mode="formatted") -> str:
    df = get(name).fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q5_broadcasts_dimension_tables(spark, sf_dir):
    """region/nation/customer/supplier are dimension-sized → every join in
    q5 should be a broadcast, leaving lineitem un-shuffled until the agg."""
    plan = plan_of(spark, sf_dir, "q5_region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_in_between_like")
    assert "PushedFilters: [" in plan
    # at least one real predicate pushed, not an empty list
    assert "PushedFilters: []" not in plan


def test_projection_prunes_scan_columns(spark, sf_dir):
    """sort_limit touches a few columns — the parquet ReadSchema must not be
    the full table width."""
    plan = plan_of(spark, sf_dir, "sort_limit")
    read_schemas = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ]
    assert read_schemas
    assert all("l_comment" not in line for line in read_schemas)


def test_topk_uses_take_ordered_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sort_limit")
    assert "TakeOrderedAndProject" in plan


def test_sim_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sim_topk_bruteforce")
    assert "TakeOrderedAndProject" in plan


def test_q1_has_partial_aggregation(spark, sf_dir):
    """Map-side combine: two HashAggregate nodes (partial + final) so the
    shuffle carries group states, not raw lineitem rows."""
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_drone_transform_is_narrow(spark, sf_dir):
    """The A3-A17 feature transform must stay shuffle-free (select-only)."""
    plan = plan_of(spark, sf_dir, "drone_features_flat")
    assert "Exchange" not in plan


def test_lsh_joins_are_equi_joins(spark, sf_dir):
    """Band-bucket blocking must plan as a hash-partitioned equi-join —
    never a nested-loop/cartesian over the pair space."""
    for q in ("dedup_minhash", "dedup_simhash_adaptive"):
        plan = plan_of(spark, sf_dir, q)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
            "BroadcastHashJoin" in plan
        ), q


def test_simhash_narrow_config(spark, sf_dir):
    """TEACHING config (r8: retired from the registry — VERDICT r7 item
    6): 16-bit simhash fingerprints still plan the pigeonhole equi-join
    and match the parameterized oracle at small SF, but 16 buckets per
    4-bit block means Σ|bucket|² candidates grow quadratically with
    corpus size — at the sf1 dup-deepened corpus this config's ANSWER is
    312M pairs (SF1_CERT.md), which is why the registry's default paths
    are the occupancy-scaled dedup_simhash_wide/_adaptive and the width
    rule (key_bits ≈ ceil(log2 n) − 2) exists at all."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from etl_drone_sense_spark.operators import dedup
    from etl_drone_sense_spark.plans.registry import t

    df = dedup.simhash_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        max_hamming=3,
        nbits=16,
        blocks=4,
    )
    buf = _io.StringIO()
    with _rs(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert df.count() > 0  # narrow buckets still produce real pairs


def test_subqueries_decorrelate_to_joins(spark, sf_dir):
    """EXISTS/NOT IN/scalar subqueries must plan as semi/anti/equi joins —
    a non-decorrelated subquery re-executes per outer row at scale."""
    plan = plan_of(spark, sf_dir, "subquery_exists_notin")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    plan2 = plan_of(spark, sf_dir, "subquery_scalar_correlated")
    assert "Join" in plan2
    for p in (plan, plan2):
        assert "CartesianProduct" not in p


def test_q1_whole_stage_codegen(spark, sf_dir):
    """The agg pipeline stays inside whole-stage codegen (no interpreted
    row-at-a-time stages in the hot path)."""
    # AQE wraps the plan in AdaptiveSparkPlan, which reports no codegen
    # subtrees until executed — disable it just for this introspection.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, sf_dir, "q1_pricing_summary", mode="codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen" in plan
    assert "Found 0 WholeStageCodegen subtrees" not in plan


def test_q5_falls_back_to_shuffle_join_when_dims_exceed_threshold(spark, sf_dir):
    """The no-hint design claim: customer/supplier broadcast only via the
    size threshold. With the threshold off, the same query must plan their
    joins as shuffle joins instead of forcing a broadcast.

    r13 (r12 VERDICT item 9) strengthened this from "≥1 shuffle join" to
    the full transition shape: ALL FOUR scale-dependent joins (dims⨝c,
    ⨝orders, ⨝lineitem, ⨝supplier) must land on KEYED shuffle joins, and
    the fallback must never be a BroadcastNestedLoopJoin or cartesian —
    the supplier join's compound equi-condition (s_suppkey AND s_nationkey)
    is the one a planner regression would most plausibly degrade to BNLJ.
    (Re-verified r13: the EXECUTED sf1 final adaptive plan is still
    all-broadcast — customer at sf1 is 2.4 MB, far under the 64 MB engine
    threshold — so the r12 slope-5.46× narrative's "threshold crossing at
    10×" was wrong about the mechanism; the slope is 10× probe volume on
    fixed cores. This threshold-off pin is therefore the ONLY enforcement
    of the eventual transition shape, which is why it pins all four.)"""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # simple mode: one line per node (formatted repeats each node in
        # its detail section, which double-counts joins)
        plan = plan_of(spark, sf_dir, "q5_region_revenue", mode="simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    n_keyed = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_keyed == 4, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the explicit region⋈nation hint still broadcasts — hints ignore the
    # threshold, which is exactly why SF-dependent dims must not carry one
    assert "BroadcastHashJoin" in plan


def test_tpch_broadcast_strategy_holds_at_sf1_stats(spark):
    """r8 (r7 VERDICT item 7): the 4-5.6x sf1 wall slopes on q3/q18/q5
    looked like broadcast-threshold fallback at 10x data. Verified: they
    are NOT — at sf1 file statistics every dimension join still plans
    BroadcastHashJoin with zero SortMergeJoins, the SAME shape as sf0.1
    (the dims grow 10x but stay under the 10MB threshold; lineitem-side
    volume is what grows, which is sublinear-in-wall at 10x on 32 cores
    — slope 4.2-5.6x for 10x data, recorded in BENCH_sf1.json). This
    test pins the strategy-parity claim whenever the probe fixture is on
    disk; the threshold-off fallback design is pinned separately above."""
    import os

    import pytest

    sf1 = "/root/repo/.scale_probe/sf1_full_x10"
    if not os.path.isdir(os.path.join(sf1, "lineitem.parquet")):
        pytest.skip("sf1 probe fixture not synthesized (.scale_probe)")
    for name in ("q5_region_revenue", "q3_shipping_priority", "q18_large_volume"):
        base = plan_of(spark, "/root/testdata/sf0.1", name)
        scaled = plan_of(spark, sf1, name)
        assert scaled.count("BroadcastHashJoin") == base.count(
            "BroadcastHashJoin"
        ), name
        assert "SortMergeJoin" not in scaled, name


def test_bloom_prefilter_sits_below_the_shuffle(spark, sf_dir):
    """join_bloom_prefiltered: the might_contain predicate must filter
    the fact scan BEFORE its exchange — that ordering IS the operator
    (shuffle carries survivors only)."""
    plan = plan_of(spark, sf_dir, "join_bloom_prefiltered")
    assert "might_contain" in plan
    fact_scan = plan.find("pythonUDF")  # the Arrow predicate projection
    assert fact_scan != -1
    # the filter feeds an Exchange above it in the formatted tree: the
    # BatchEvalPython/ArrowEvalPython node appears under the join's
    # shuffle, not above it
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_builtin_runtime_bloom_filter_injects(spark, sf_dir):
    """Spark's own runtime bloom filter (the optimizer-heuristic twin of
    operators/bloomjoin.py) must inject a might_contain subquery on the
    fact side when a selective creation side joins a large application
    side — at fixture scale the size trip-wires need scoping down, the
    same way the AQE skew-split test scales its thresholds."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F

        from etl_drone_sense_spark.plans.registry import t

        orders = (
            t(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        import io as _io
        from contextlib import redirect_stdout as _rs

        buf = _io.StringIO()
        with _rs(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_range_join_binned_is_equi_join(spark, sf_dir):
    """The binned range join must plan as a hash-partitioned equi-join on
    the bin key — not the nested-loop its non-equi twin degrades to."""
    plan = plan_of(spark, sf_dir, "join_range_binned")
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """join_skewed_salted: the join condition must include the salt column
    (so the hot key's rows hash to `salts` distinct shuffle shards), and the
    dim replication must be an explode, not a cartesian product."""
    plan = plan_of(spark, sf_dir, "join_skewed_salted")
    assert "_salt" in plan
    assert "CartesianProduct" not in plan
    assert "explode" in plan.lower()


def test_aqe_splits_skewed_join_partitions(spark):
    """With AQE skew-join on and one hot key carrying ~90% of a
    shuffle-sized left side, the executed sort-merge join must report
    skew=true (OptimizeSkewedJoin split the hot partition)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 20000).select(
            F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
            # pad must depend on id: a constant would fold past the shuffle
            # and the hot partition would weigh nothing
            F.rpad(F.col("id").cast("string"), 512, "x").alias("pad"),
        )
        right = spark.range(0, 20001).select(
            F.col("id").alias("k"), F.lit("y").alias("r")
        )
        out = left.join(right, "k")
        assert len(out.collect()) == 20000
        final = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_incremental_dedup_is_equi_join(spark, sf_dir):
    """The batch-vs-corpus probe join must stay a (band,bucket) equi-join —
    no cartesian, no broadcast-nested-loop fallback."""
    plan = plan_of(spark, sf_dir, "dedup_incremental")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hyperplane_lsh_is_equi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_embedding_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gapfill_has_no_pair_explosion(spark, sf_dir):
    """Gap-fill uses the union+window as-of form: its fill step must not
    appear as a range join (cartesian / nested-loop candidates)."""
    plan = plan_of(spark, sf_dir, "events_gapfill")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_repetition_top_gram_uses_group_limit(spark, sf_dir):
    """text_repetition's most-frequent-2-gram must compile to a per-
    partition WindowGroupLimit (top-1 pushed below the shuffle), with
    partial aggregation on every explode branch — never a global sort."""
    plan = plan_of(spark, sf_dir, "text_repetition")
    assert "WindowGroupLimit" in plan
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_unigram_logprob_partial_aggs_and_exact_sum(spark, sf_dir):
    """Token-frequency and per-doc passes must partial-aggregate map-side,
    and the per-doc sum must run on the quantized BIGINT (exact integer
    aggregation), not on raw doubles."""
    plan = plan_of(spark, sf_dir, "text_unigram_logprob")
    assert "partial_count" in plan
    assert "partial_sum(lp_q" in plan
    assert "CartesianProduct" not in plan


def test_boilerplate_strip_no_pair_explosion(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "text_boilerplate_strip")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_boilerplate_strip_clean_docs_bypass(spark, sf_dir):
    """r11 rework: docs holding no boiler line take a pure column path —
    the plan is a Union whose clean branch carries no aggregation, and
    exactly ONE collect_list reassembly exists (the dirty branch)."""
    plan = plan_of(spark, sf_dir, "text_boilerplate_strip", mode="simple")
    assert "Union" in plan, plan
    assert "LeftAnti" in plan, plan
    # one reassembly aggregation only (partial + final = 2 mentions)
    assert plan.count("collect_list") == 2, plan


def test_paragraph_dedup_clean_docs_bypass(spark, sf_dir):
    """Same bypass shape for the C4 paragraph dedup: one Union, one
    collect_list rebuild (dirty branch only), no first-occurrence window
    over the clean majority."""
    plan = plan_of(spark, sf_dir, "dedup_paragraph", mode="simple")
    assert "Union" in plan, plan
    assert "LeftAnti" in plan, plan
    assert plan.count("collect_list") == 2, plan


def test_sample_importance_scoring_is_join_free(spark, sf_dir):
    """r11 rework (r9 VERDICT item 7): the hashed-unigram bucket arrays
    are staged once (scoring reads the SAME cached relation the census
    consumed — InMemoryTableScan), the bucket log-ratio table enters the
    scoring plan as a collected constant array, so the final query has NO
    join and no shuffle besides the TakeOrderedAndProject top-N."""
    plan = plan_of(spark, sf_dir, "sample_importance", mode="simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "InMemoryTableScan" in plan, plan  # the staged bucket arrays
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert node not in plan, f"{node} in scoring plan:\n{plan}"
    assert "Exchange" not in plan, plan


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A partitioned fact joined to a selectively-filtered dim must plan a
    dynamic-pruning subquery on the fact scan's PartitionFilters — at
    cluster scale this is what keeps a dim-filtered join from reading
    every fact partition."""
    from pyspark.sql import functions as F

    from etl_drone_sense_spark.sources.readers import read_table

    path = str(tmp_path / "orders_by_priority")
    read_table(spark, sf_dir, "orders").write.partitionBy(
        "o_orderpriority"
    ).parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(p, i) for i, p in enumerate(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )],
        "o_orderpriority string, rank int",
    ).filter(F.col("rank") == 0)  # selective predicate -> DPP eligible
    j = fact.join(dim, "o_orderpriority").groupBy("o_orderpriority").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    rows = j.collect()
    assert len(rows) == 1 and rows[0]["o_orderpriority"] == "1-URGENT"


def test_batched_topk_uses_window_group_limit(spark, sf_dir):
    """sim_topk_batch's per-query rank must compile to WindowGroupLimit
    (per-partition top-k heaps below the shuffle), with the query batch
    broadcast — never a global sort of the scored corpus."""
    plan = plan_of(spark, sf_dir, "sim_topk_batch")
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_profile_columns_is_single_scan(spark, sf_dir):
    """All-column profiling must be ONE scan + one aggregate pipeline —
    the naive per-column profiler scans the table once per column."""
    plan = plan_of(spark, sf_dir, "profile_columns")
    # formatted mode prints each node twice (tree + details); count the
    # numbered detail entries only.
    scans = [
        ln
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and "Scan parquet" in ln
    ]
    assert len(scans) == 1, scans


def test_validate_expectations_broadcasts_referential_dim(spark, sf_dir):
    """The referential rule's customer side is dimension-sized: the anti
    join must broadcast, keeping the whole check one fact pass."""
    plan = plan_of(spark, sf_dir, "validate_expectations")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_geo_radius_join_is_banded_broadcast_not_cartesian(spark, sf_dir):
    """The spatial radius join must be a band equi-join with the POI side
    broadcast — a cross join here is the O(n·m) trap at scale."""
    plan = plan_of(spark, sf_dir, "geo_radius_join")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_shingle_staging_survives_optimizer(spark, sf_dir):
    """The staged-tokens projection must NOT be collapsed into the shingle
    transform lambda: an inlined tokenize subtree re-evaluates once per
    shingle (O(tokens²)/doc — the 6× regression r5 fixed). Guard: the
    tokenize split() appears exactly once in the optimized plan, outside
    the lambda."""
    from pyspark.sql import functions as F

    from etl_drone_sense_spark.functions import text as TXT
    from etl_drone_sense_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    staged = docs.withColumn("_toks", TXT.tokens(F.col("text"))).select(
        "doc_id", TXT.shingle_hashes_from_tokens(F.col("_toks"), 3).alias("hv")
    )
    plan = staged._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, plan


def test_runtime_bloom_filter_on_selective_shuffle_join(spark, sf_dir):
    """When a selective dim filter feeds a SHUFFLE join (broadcast is the
    first choice, but a dim over the threshold shuffles), Spark 4 can
    inject a runtime bloom filter: the dim's join keys are sketched and
    `might_contain` prunes fact rows BEFORE the fact side's shuffle —
    at 100 TB that's the difference between shuffling the whole fact
    table and shuffling the ~matching fraction. The engine leaves the
    feature enabled; this pins that it actually fires on the canonical
    fact⨝filtered-dim shape (thresholds lowered to local-fixture scale
    the way a 100 TB run would meet them naturally)."""
    from etl_drone_sense_spark.sources.readers import read_table

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    ]
    old = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        li = read_table(spark, sf_dir, "lineitem")
        part = read_table(spark, sf_dir, "part").filter("p_type = 'PROMO'")
        j = li.join(part, li.l_partkey == part.p_partkey)
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, "runtime bloom filter not injected"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_q6_pushes_all_predicates_to_scan(spark, sf_dir):
    """Q6 is the pushdown benchmark: every predicate (date range, discount
    band, quantity cap) must reach the parquet scan as a PushedFilter —
    row-group min/max skipping is what makes this query scan-bound."""
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    for frag in (
        "GreaterThanOrEqual(l_shipdate,1997-01-01",
        "LessThan(l_shipdate,1998-01-01",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in plan, f"predicate not pushed: {frag}"


def test_q19_disjunction_derives_per_side_pushdown(spark, sf_dir):
    """The OR'd brackets span both join sides; Catalyst must derive each
    side's implication (brand/size disjunction → part scan, quantity hull
    → lineitem scan) and push it below the join — without this the
    disjunction only filters post-join and both scans read everything."""
    plan = plan_of(spark, sf_dir, "q19_bracket_disjunction")
    assert "EqualTo(p_brand,Brand#11)" in plan, "brand OR not pushed to part"
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan, (
        "quantity hull not pushed to lineitem"
    )


def test_column_pruning_reaches_scan(spark, sf_dir):
    """ReadSchema must carry only referenced columns: q1 touches 7 of
    lineitem's 11 (a scan that reads all 11 for this projection wastes
    ~40% of the I/O at 100 TB), and q6's scan must not read the join-only
    or agg-only columns it never references."""
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"):
        assert col in rs
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert col not in rs, f"unreferenced column read: {col}"

    plan6 = plan_of(spark, sf_dir, "q6_forecast_revenue")
    rs6 = [l for l in plan6.splitlines() if "ReadSchema" in l][0]
    assert "l_returnflag" not in rs6 and "l_orderkey" not in rs6


# --- late-r8 additions: TPC-H completion tier + iterative/temporal ops ------


def test_q4_exists_is_semi_join_not_aggregate_dedup(spark, sf_dir):
    """The EXISTS must stay a semi join (short-circuits per key, never
    duplicates orders) — not an inner join + distinct."""
    plan = plan_of(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q21_decorrelates_to_one_lineitem_aggregate(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair must collapse into ONE per-order
    aggregate over lineitem — the naive transliteration self-joins the
    biggest table twice more. Plan check: the fact is never re-joined at
    line grain — lineitem feeds only the (orderkey, suppkey) aggregate
    (appearing at most twice as a scan when the exchange is not reused),
    plus one orders scan and one supplier scan."""
    plan = plan_of(spark, sf_dir, "q21_waiting_suppliers", mode="simple")
    assert plan.count("Scan parquet") <= 4  # lineitem x2 + orders + supplier
    assert "CartesianProduct" not in plan


def test_q2_min_is_window_group_limit(spark, sf_dir):
    """The correlated min must plan as a rank-1 WindowGroupLimit (per-
    partition top-1 heaps before the shuffle) — ONE pass over the join
    web, not an aggregate + equality probe re-reading it."""
    plan = plan_of(spark, sf_dir, "q2_min_cost_supplier")
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan  # top-100 is a heap, not a sort


def test_q16_blacklist_is_broadcast_anti_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q16_supplier_part_counts")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_q20_partlist_is_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q20_concentrated_suppliers")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_editdistance_join_is_equi_on_variant(spark, sf_dir):
    """FastSS candidates come from an equi join on the deletion variant —
    never a cartesian/NLJ levenshtein over all pairs."""
    plan = plan_of(spark, sf_dir, "dedup_editdistance")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_windows_share_one_sort(spark, sf_dir):
    """lag (suppression) + lead/row_number (intervals) must ride a single
    (user_id, ts) sort — one exchange for the whole history build."""
    from pyspark.sql import functions as F

    from etl_drone_sense_spark.operators.temporal import scd2_history

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    changes = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("tier"))
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        scd2_history(changes, "user_id", "ts", ["tier"]).explain()
    plan = buf.getvalue()
    # one exchange for the groupBy + one for the window partitioning; the
    # second window reuses the first's sort (no third exchange)
    assert plan.count("Exchange") <= 2


def test_pagerank_loop_narrows_shuffle_width(spark, sf_dir):
    """The per-round relations are graph-scale, not corpus-scale: the loop
    must narrow its own (private-session) shuffle width while leaving the
    caller's conf untouched."""
    from pyspark.sql import functions as F

    from etl_drone_sense_spark.operators.graph import pagerank_fixed_point

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    edges = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)], "src long, dst long"
    )
    ranks = pagerank_fixed_point(edges, iters=1)
    # tiny graph → the loop ran at width 1; the final relation's
    # partitioning reflects it
    assert ranks.rdd.getNumPartitions() <= 2
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_pagerank_rounds_never_move_the_adjacency(spark, sf_dir):
    """The r12 scale fix's regression pin: in the final multi-round loop
    job the checkpointed adjacency must be consumed IN PLACE — no
    Exchange and no Sort above any edge-relation scan, every loop join a
    ShuffledHashJoin, and exactly ONE exchange per round (the
    map-combined contribution shuffle, which IS the recurrence's message
    exchange). AQE used to discard the checkpointed partitioning and the
    rounds re-shuffled AND re-sorted the full edge list — the entire
    5.78x slope (BENCH_sf1 r11). The graph is sized so the measured loop
    width is > 1: at width 1 the planner does not recognize the
    checkpointed hash(u, 1) partitioning and re-exchanges (harmless —
    single-partition data — but it would fail the counts below)."""
    from pyspark.sql import functions as F
    from pyspark.sql.classic.dataframe import DataFrame as _CDF

    from etl_drone_sense_spark.operators import graph as G

    edges = spark.range(60000).select(
        (F.col("id") % 5000).alias("src"),
        ((F.col("id") * 37) % 5000).alias("dst"),
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    plans = []
    orig = _CDF.localCheckpoint

    def spy(self, eager=True):
        plans.append(self._jdf.queryExecution().executedPlan().toString())
        return orig(self, eager=eager)

    _CDF.localCheckpoint = spy
    try:
        G.pagerank_fixed_point(sym, iters=3, assume_symmetric=True)
    finally:
        _CDF.localCheckpoint = orig
    final = plans[-1]  # the 3-round final checkpoint job
    assert "SortMergeJoin" not in final, final
    # r16: two hash joins per round — the edge join plus the state
    # rebuild (the old third join, ranks ⨝ degree, became a projection
    # when the state started carrying the out-degree).
    assert final.count("ShuffledHashJoin") == 3 * 2, final
    # one contribution exchange per round — nothing else moves
    assert final.count("Exchange") == 3, final
    assert "+- Sort" not in final and "- Sort " not in final, final


def test_exact_quantiles_single_exchange(spark, sf_dir):
    """One shuffle on the group key serves the window sort AND the final
    rollup (same key → partitioning reused); the quantile explode happens
    after ranking and collapses immediately — no per-quantile pass."""
    plan = plan_of(spark, sf_dir, "agg_exact_quantiles", mode="simple")
    assert plan.count("Exchange") == 1, plan


def test_kmv_sketch_is_window_group_limit(spark, sf_dir):
    """The k-minimum selection must plan as WindowGroupLimit (rank filter
    pushed into each sort partial) — a full per-group sort would
    materialize the whole distinct-hash relation at 100 TB."""
    from pyspark.sql import functions as F

    from etl_drone_sense_spark.plans.extensions import _KMV_K, _kmv_sketch
    from etl_drone_sense_spark.sources.readers import read_table

    df = _kmv_sketch(read_table(spark, sf_dir, "events"), _KMV_K)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "WindowGroupLimit" in plan, plan


def test_anomaly_mad_shuffles_only_on_user(spark, sf_dir):
    """Every exchange in the median/MAD pipeline must hash on user_id —
    any other key means an accidental re-distribution of the event
    relation."""
    plan = plan_of(spark, sf_dir, "events_anomaly_mad")
    import re

    parts = re.findall(r"hashpartitioning\(([^,)]+)", plan)
    assert parts, plan
    assert all(p.strip().startswith("user_id") for p in parts), parts


def test_ols_is_single_aggregation_pass(spark, sf_dir):
    """The regression fit is ONE partial-aggregable shuffle: moments
    aggregate with map-side combine, coefficients are a projection."""
    plan = plan_of(spark, sf_dir, "ml_ols_regression", mode="simple")
    assert plan.count("Exchange") <= 2, plan  # agg shuffle + final sort
    assert "HashAggregate" in plan, plan


def test_triangle_count_no_cartesian_and_persisted_edges(spark, sf_dir):
    """Wedge join + closing probe must stay equi-joins; the edge relation
    feeds three join roles from ONE persisted build."""
    plan = plan_of(spark, sf_dir, "graph_triangle_count", mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("InMemoryTableScan") >= 3, plan


def test_pca_gram_is_arrow_partials_not_explode(spark, sf_dir):
    """The Gram matrix must come from mapInPandas partials (partitions x
    d^2 rows), never a corpus x d^2 explode."""
    from etl_drone_sense_spark.operators.similarity import gram_matrix_fixed
    from etl_drone_sense_spark.sources.readers import read_table

    df = gram_matrix_fixed(read_table(spark, sf_dir, "embeddings"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "MapInPandas" in plan, plan
    assert "Generate" not in plan, plan  # no explode anywhere


def test_split_leakage_safe_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "corpus_split_leakage_safe", mode="simple")
    assert "CartesianProduct" not in plan


def test_binned_quantiles_never_sorts_the_full_relation(spark, sf_dir):
    """The selection twin's only full-relation shuffles are hash
    aggregations; every Sort in the plan operates on the tiny bin
    relation or the filtered target-bin rows (both downstream of a
    selective join), never directly on the scan."""
    plan = plan_of(spark, sf_dir, "agg_exact_quantiles_binned")
    # formatted mode details: the sorted twin shows
    # "Sort ... Scan parquet" adjacency via one exchange; here every
    # Sort must sit above a Filter/Join, and a window over the raw scan
    # would show as Window directly consuming the first exchange.
    lines = plan.splitlines()
    tree = [ln for ln in lines if ln.strip().startswith(("+-", ":-", "Sort", "AdaptiveSparkPlan"))]
    txt = "\n".join(tree)
    # the full-relation window sort of the sorted twin is absent:
    assert "WindowGroupLimit" not in txt
    # sanity: the plan still contains the two windows (cum + in-bin pick)
    assert plan.count("Window") >= 2, plan


def test_sssp_rounds_frontier_only_one_exchange(spark, sf_dir):
    """r13 delta-relaxation pin: every per-round SSSP checkpoint job must
    (a) SHUFFLE_HASH both loop joins (the frontier relax and the
    dist⟗cand merge) with no sorts, (b) move data exactly ONCE — the
    map-combined message aggregation; the relax join is co-partitioned
    (state hash(node, W) against adjacency hash(u, W)) and the merge
    joins two node-partitioned relations. Graph sized so loop width > 1
    (width-1 partitioning is not recognized and would re-exchange)."""
    from pyspark.sql import functions as F
    from pyspark.sql.classic.dataframe import DataFrame as _CDF

    from etl_drone_sense_spark.operators import graph as G

    edges = spark.range(60000).select(
        (F.col("id") % 5000).alias("src"),
        ((F.col("id") * 37) % 5000).alias("dst"),
        (1 + F.col("id") % 9).alias("w"),
    )
    sym = edges.unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    plans = []
    orig = _CDF.localCheckpoint

    def spy(self, eager=True):
        plans.append(self._jdf.queryExecution().executedPlan().toString())
        return orig(self, eager=eager)

    _CDF.localCheckpoint = spy
    try:
        G.sssp_fixed_rounds(sym, source=1, rounds=3)
    finally:
        _CDF.localCheckpoint = orig
    # plans: edge checkpoint, adjacency pin, state init, 3 round states
    rounds = plans[-3:]
    for rp in rounds:
        assert "SortMergeJoin" not in rp, rp
        assert rp.count("ShuffledHashJoin") == 1, rp
        assert rp.count("Exchange") == 1, rp
        assert "+- Sort" not in rp and "- Sort " not in rp, rp


def test_q18_single_lineitem_scan(spark, sf_dir):
    """r14 (r13 VERDICT item 6): q18's HAVING aggregation already
    computes the output's per-order quantity sum, so the plan must scan
    lineitem exactly ONCE — the r13 second scan (re-aggregating
    qualifying orders' lines) was rework and carried a 4.2x sf1 slope.
    Also pins: exactly one fact-table exchange feeding the agg (the
    map-combined groupBy(l_orderkey)), no further aggregate above the
    joins, and top-k without a global sort."""
    plan = plan_of(spark, sf_dir, "q18_large_volume", mode="simple")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "TakeOrderedAndProject" in plan
    # the only HashAggregates are the partial/final pair of the one
    # per-order sum — the old plan had a second pair above the joins
    assert plan.count("HashAggregate") == 2, plan
