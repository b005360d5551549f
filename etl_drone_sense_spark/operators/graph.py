"""Connected components over an edge list — duplicate-cluster formation.

Near-dup detection yields PAIRS; a cleaning job needs CLUSTERS (the
transitive closure: if a~b and b~c, then {a,b,c} dedupe together, even
though (a,c) was never a candidate pair). ``connected_components``
computes them with iterative min-label propagation:

* every node starts labeled with its own id;
* each round, a node adopts the minimum label among itself and its
  neighbors (one join edges⨝labels + one min-aggregate — both
  partial-aggregable equi-shuffles on node id);
* converges in O(diameter) rounds; the driver checks the convergence
  counter (a 1-row aggregate) each round, exactly like the k-means loop.

Label propagation is the standard large-graph CC shape (GraphX/Pregel use
the same exchange pattern); dedup clusters have tiny diameters (chains of
near-identical docs), so rounds stay in the low single digits.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 20,
    narrow_shuffle: bool = True,
) -> DataFrame:
    """(node, component) — component = min node id reachable from node.

    ``edges`` is undirected input (each pair listed once, either order).
    Only nodes that appear in an edge are returned; isolated nodes are by
    definition their own singleton cluster and never need relabeling.

    CONCURRENCY CAVEAT: with ``narrow_shuffle=True`` (default) the loop
    temporarily lowers the SESSION-wide ``spark.sql.shuffle.partitions``
    (restored in a finally). The setting is session-global — repartition
    of the inputs cannot bound a groupBy's output width, and AQE's
    coalescing doesn't survive the eager localCheckpoints the loop needs
    — so any query PLANNED concurrently in the same session would inherit
    the narrowed width. Single-threaded drivers (this repo's bench,
    tests, and the correctness gate) are unaffected; a multi-threaded
    driver must pass ``narrow_shuffle=False`` and accept the wider loop
    stages instead.
    """
    # localCheckpoint (not persist): the input may carry an arbitrarily deep
    # plan (e.g. the whole LSH pipeline), and every propagation round would
    # re-analyze it — checkpointing truncates the lineage so round N's plan
    # is O(1), not O(N × input-plan).
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )

    # Size the loop's shuffle width from the MEASURED edge count instead of
    # inheriting the session conf: every round shuffles the (tiny compared
    # to the corpus) edge/label relations, and eager localCheckpoints stop
    # AQE from coalescing those exchanges, so a 32-wide conf costs ~32
    # near-empty tasks per stage per round. ~50k edge-rows per partition
    # keeps tasks meaningful; the session conf stays the CAP, so a 100 TB
    # edge list keeps its full width. sym is already materialized, so the
    # count is a cheap scan, paid once.
    spark = edges.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key)

    converged = False
    rounds = 0
    try:
        if narrow_shuffle:
            # The sizing count lives INSIDE the branch: with
            # narrow_shuffle=False the value is unused and the count job
            # would be a pure waste of a scan (ADVICE r5).
            loop_parts = max(1, min(int(prev_parts), sym.count() // 50_000 + 1))
            spark.conf.set(conf_key, str(loop_parts))
        for _ in range(max_iters):
            rounds += 1
            neighbor_min = (
                sym.join(labels, sym.v == labels.node)
                .groupBy(F.col("u").alias("node"))
                .agg(F.min("component").alias("_nbr_min"))
            )
            # One join computes BOTH the new label and the did-it-change
            # flag (a node changes iff a neighbor's label beats its own),
            # so the convergence probe is a scan of the checkpointed
            # result instead of a third shuffling join per round — the
            # loop is overhead-bound on small relations, so one fewer
            # exchange per round is ~30% off the steady-state wall clock.
            flagged = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("_nbr_min"), F.col("component")),
                    ).alias("component"),
                    (F.col("_nbr_min") < F.col("component")).alias("_changed"),
                )
                .localCheckpoint(eager=True)
            )
            changed = flagged.filter(F.col("_changed")).limit(1).count()
            labels = flagged.drop("_changed")
            if changed == 0:
                converged = True
                break
    finally:
        spark.conf.set(conf_key, prev_parts)
    if not converged:
        # Partial labels are silently wrong for any component whose graph
        # diameter exceeds max_iters (long near-duplicate chains) — make
        # that loud instead of returning them as if final.
        warnings.warn(
            f"connected_components did not converge after {rounds} rounds; "
            "labels may be partial — raise max_iters",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    base_micro: int = 150_000,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, rank) after ``iters`` synchronous PageRank rounds, in EXACT
    integer micro-units — rank 1_000_000 ≡ 1.0.

    Every step is integer arithmetic: each round a node sends
    ``(rank * damping_num) div (damping_den * outdeg)`` along every
    out-edge (integer floor division — deterministic, no float summation
    order to diverge between engines) and collects
    ``base_micro + Σ incoming``. That makes a fixed-iteration run
    bit-identical to ANY other engine executing the same recurrence (the
    registry query's DuckDB oracle is the same five rounds as chained
    CTEs), which is what lets an ITERATIVE operator ride the exact-hash
    correctness gate at all — float PageRank can only ever be compared
    with tolerances.

    Semantics notes: nodes = all edge endpoints; a dangling node (no
    out-edges) receives rank but contributes none (the mass-leak form —
    the standard bounded-iteration simplification); floor division also
    leaks ≤ outdeg-1 micro-units per node per round. Both leaks are part
    of the DEFINED recurrence, identically reproduced by any conforming
    engine, so cross-engine hashes still match exactly.

    Scale: the out-degree is joined into the edge list ONCE before the
    loop (the adjacency (u, v, d) is static across rounds — joining it
    per round would redo the same degree aggregation five times), and
    that join runs AT THE LOOP'S SHUFFLE WIDTH so the checkpointed
    adjacency is hash-partitioned on u at exactly the width every round
    joins at (localCheckpoint preserves outputPartitioning through the
    LogicalRDD): the edge list is shuffled ONCE for the whole run, and
    each round exchanges only the node-scale rank relation — without
    the width match the planner re-shuffles the edges every round,
    which at sf0.1 was five ~1M-row exchanges of pure waste and at
    100 TB would make each round cost as much as the build. Lineage is
    truncated with an eager localCheckpoint every ``checkpoint_every``
    rounds — NOT every round: each checkpoint is a full materialize-
    and-launch barrier (~0.3 s of fixed latency in local mode), while
    an unchecked round only deepens the plan by two joins, so short
    stretches are cheaper to re-analyze than to materialize; a
    mid-loop checkpoint that would land within checkpoint_every-1
    rounds of the final (always-materialized) one is skipped — two
    barriers one round apart truncate nothing the final one doesn't.
    Rounds are a fixed count (PageRank runs 10-50 rounds in practice),
    so there is no convergence probe."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.localCheckpoint(eager=True)

    contrib_expr = F.expr(
        f"(rank * {damping_num}) div ({damping_den} * d)"
    ).alias("_c")
    spark = edges.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key)
    try:
        loop_parts = max(
            1, min(int(prev_parts), sym.count() // 50_000 + 1)
        )
        spark.conf.set(conf_key, str(loop_parts))
        adj = (
            sym.join(sym.groupBy("u").agg(F.count(F.lit(1)).alias("d")), "u")
            .localCheckpoint(eager=True)
        )
        nodes = (
            sym.select(F.col("u").alias("node"))
            .unionByName(sym.select(F.col("v").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        ranks = nodes.select(
            "node", F.lit(1_000_000).cast("long").alias("rank")
        )
        for i in range(1, iters + 1):
            incoming = (
                adj.join(ranks, adj.u == ranks.node)
                .select(F.col("v").alias("node"), contrib_expr)
                .groupBy("node")
                .agg(F.sum("_c").alias("_in"))
            )
            ranks = nodes.join(incoming, "node", "left").select(
                "node",
                (
                    F.lit(base_micro).cast("long")
                    + F.coalesce(F.col("_in"), F.lit(0))
                ).alias("rank"),
            )
            # The FINAL round always materializes here too: the narrow
            # conf is restored on exit, so a lazy tail would re-plan its
            # shuffles at the session width outside the loop's scope.
            if i == iters or (i % checkpoint_every == 0 and iters - i >= 2):
                ranks = ranks.localCheckpoint(eager=True)
    finally:
        spark.conf.set(conf_key, prev_parts)
    return ranks


def flatten_hierarchy(
    nodes: DataFrame,
    key: str = "key",
    parent: str = "parent",
    max_doublings: int = 20,
) -> DataFrame:
    """(key, root_key, depth) for every node of a parent-pointer forest —
    the ``WITH RECURSIVE`` ancestor-walk class (org charts, category
    trees, BOM roll-ups) computed by POINTER DOUBLING.

    ``nodes`` carries one row per node: ``key`` and ``parent`` (NULL for
    a root). The forest must be acyclic; a cycle never reaches a root, so
    the loop hits ``max_doublings`` and warns rather than spinning.

    Why doubling instead of a per-edge walk: a naive loop follows ONE
    parent edge per round (O(max_depth) shuffles — a 50-deep chain is 50
    joins); doubling keeps, per node, the ancestor 2^j edges up plus the
    real-edge count to it, and composes the relation with itself —
    ``anc_{j+1}(k) = anc_j(anc_j(k))`` — so the whole forest flattens in
    ceil(log2(max_depth)) self-joins. Roots self-loop with step count 0,
    which makes the composition uniform: a finished row joins its root's
    own fixed-point row and is unchanged, so there is no union-of-done
    branch to grow the plan. Each round is ONE equi-shuffle of the
    node-scale state on the ancestor pointer; lineage is truncated per
    round (eager localCheckpoint) and the loop narrows the session
    shuffle width to the measured node count — the same discipline (and
    the same session-global conf caveat) as connected_components above.

    The output is exact integers (depth = real edges to the root), so a
    fixed recurrence is bit-identical to any other engine's recursive-CTE
    evaluation — the registry query hash-checks this loop against DuckDB
    ``WITH RECURSIVE`` directly.
    """
    state = nodes.select(
        F.col(key).alias("key"),
        F.coalesce(F.col(parent), F.col(key)).alias("ptr"),
        F.when(F.col(parent).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("steps"),
        F.col(parent).isNull().alias("done"),
    ).localCheckpoint(eager=True)

    spark = nodes.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key)
    converged = False
    try:
        loop_parts = max(
            1, min(int(prev_parts), state.count() // 50_000 + 1)
        )
        spark.conf.set(conf_key, str(loop_parts))
        # Probe AFTER each join, and only from round 2 on: after round j
        # the jump is 2^j edges, so rounds 1-2 can only have converged on
        # a ≤4-deep forest — for real hierarchies the early probes are
        # guaranteed-false jobs. The loop is barrier-bound (each round is
        # an eager localCheckpoint), so every skipped job is wall-clock.
        for j in range(1, max_doublings + 1):
            hop = state.select(
                F.col("key").alias("_k"),
                F.col("ptr").alias("_p"),
                F.col("steps").alias("_s"),
                F.col("done").alias("_d"),
            )
            state = (
                state.join(hop, state.ptr == hop._k)
                .select(
                    "key",
                    F.col("_p").alias("ptr"),
                    (F.col("steps") + F.col("_s")).alias("steps"),
                    F.col("_d").alias("done"),
                )
                .localCheckpoint(eager=True)
            )
            if j >= min(2, max_doublings):
                if state.filter(~F.col("done")).limit(1).count() == 0:
                    converged = True
                    break
    finally:
        spark.conf.set(conf_key, prev_parts)
    if not converged:
        warnings.warn(
            f"flatten_hierarchy did not converge after {max_doublings} "
            "doublings: depth exceeds 2^max_doublings or the graph has a "
            "cycle — results may be partial",
            RuntimeWarning,
            stacklevel=2,
        )
    return state.select(
        "key", F.col("ptr").alias("root_key"), F.col("steps").alias("depth")
    )


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(component, n_members, keep_id) per duplicate cluster: the survivor
    is the minimum id — which IS the component label."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("keep_id"),
    )
