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
) -> DataFrame:
    """(node, component) — component = min node id reachable from node.

    ``edges`` is undirected input (each pair listed once, either order).
    Only nodes that appear in an edge are returned; isolated nodes are by
    definition their own singleton cluster and never need relabeling.
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

    converged = False
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
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
