"""Similarity search over embedding columns (SURVEY §2 Part C3).

Two tiers:

* ``topk_cosine``        — exact brute-force scan. One narrow pass + a
                           global top-k (``orderBy ... limit k`` compiles to
                           TakeOrderedAndProject: per-partition heaps, no
                           full sort, no full shuffle). The right baseline
                           up to ~10^9 vectors per query batch.
* ``ivf_topk_cosine``    — IVF-style: partition vectors by nearest centroid
                           once (the expensive pass is amortized across
                           queries), then probe only ``nprobe`` cells. The
                           scale path: the probe reads a pruned partition
                           subset instead of the full corpus.
* ``embedding_near_pairs`` — near-duplicate pairs by cosine within blocking
                           cells (label/IVF cell), for embedding-dedup.

All dot products are Catalyst ``zip_with``/``aggregate`` expressions
(functions/vectors.py) — JVM-side, no Python per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vectors as V

# Lehmer / MINSTD parameters for the bucket_cap admission coin (shared
# verbatim by the DuckDB oracle twin, plans/extensions._bucket_cap_qualify):
# h(id) = (id % M) * A % M with M = 2^31−1 prime, A = 48271. Products stay
# < 2^47 — exact in int64 in BOTH engines, no overflow, no float.
BUCKET_HASH_M = 2_147_483_647
BUCKET_HASH_A = 48_271

# Largest group a semantic_dedup cell computes as ONE dense Gram matrix;
# above this the lower-triangular product runs in B×B blocks (8192² int64
# ≈ 0.5 GiB — comfortably inside one executor's working memory).
_GRAM_BLOCK = 8192


def _cos(a: Column, b: Column) -> Column:
    return V.cosine(a, b)


def topk_cosine(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single query vector.

    ``query`` is a 1-row DataFrame with ``vec_col``; it is broadcast, so the
    scan stays shuffle-free until the final top-k heap merge.
    """
    q = F.broadcast(query.select(F.col(vec_col).alias("_qvec")))
    scored = corpus.crossJoin(q).select(
        F.col(id_col),
        F.round(_cos(F.col(vec_col), F.col("_qvec")), 6).alias("cosine"),
    )
    # Deterministic top-k: tie-break on id.
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cell_id",
) -> DataFrame:
    """IVF assignment: nearest centroid (max cosine) per vector.

    Centroids are few (√n in classic IVF) → broadcast; assignment is one
    narrow pass. Ties broken by centroid id for determinism.
    """
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id), F.col(vec_col).alias("_cvec")
        )
    )
    scored = corpus.crossJoin(c).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(centroid_id),
        F.round(_cos(F.col(vec_col), F.col("_cvec")), 9).alias("_sim"),
    )
    w = F.row_number().over(
        Window.partitionBy(id_col).orderBy(
            F.col("_sim").desc(), F.col(centroid_id).asc()
        )
    )
    return scored.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn", "_sim")


def probe_cells(
    centroids: DataFrame,
    query: DataFrame,
    nprobe: int,
    vec_col: str = "embedding",
    centroid_id: str = "cell_id",
) -> DataFrame:
    """Rank centroids by cosine similarity to the (single-row) query
    vector and keep the ``nprobe`` nearest — the cell-selection half of
    ``ivf_topk_cosine``, factored out (r15 ADVICE) so maintained-index
    serving (plans/extensions.sim_ivf_topk_served) shares the exact
    rounding and (sim DESC, cell_id) tie-break instead of carrying an
    inline copy that could drift while still sharing the frozen
    oracle. Returns a single-column (centroid_id) relation, broadcast-
    sized by construction (≤ nprobe rows)."""
    c = F.broadcast(
        centroids.select(centroid_id, F.col(vec_col).alias("_cvec"))
    )
    q1 = query.select(F.col(vec_col).alias("_qv"))
    return (
        c.crossJoin(F.broadcast(q1))
        .select(
            centroid_id,
            F.round(_cos(F.col("_cvec"), F.col("_qv")), 9).alias("_sim"),
        )
        .orderBy(F.col("_sim").desc(), F.col(centroid_id).asc())
        .limit(nprobe)
        .select(centroid_id)
    )


def ivf_topk_cosine(
    corpus: DataFrame,
    query: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cell_id",
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` cells nearest the query.

    At scale the corpus is written partitioned by cell_id, so the probe is a
    partition-pruned scan of nprobe/ncells of the data.
    """
    assigned = assign_cells(corpus, centroids, id_col, vec_col, centroid_id)
    if nprobe == 1:
        cells = assign_cells(
            query.select(F.lit(0).alias("_qid"), F.col(vec_col)),
            centroids,
            "_qid",
            vec_col,
            centroid_id,
        ).select(centroid_id)
    else:
        cells = probe_cells(centroids, query, nprobe, vec_col, centroid_id)
    pruned = assigned.join(F.broadcast(cells), centroid_id)
    return topk_cosine(pruned, query, k, id_col, vec_col)


def embedding_near_pairs(
    corpus: DataFrame,
    block_col: str = "label",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking cells.

    The self-join key is the block column (IVF cell / cluster label), so the
    pair space is Σ|cell|², not n². Per-vector norms are computed once on
    each join side, not once per pair (each vector participates in O(|cell|)
    pairs; the division order matches ``vectors.cosine`` bit-for-bit).
    Returns (id_a, id_b, cosine) pairs."""
    side = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(block_col).alias("_blk"),
        V.norm(F.col(vec_col)).alias("_nrm"),
    )
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a._blk") == F.col("b._blk"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                V.dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (F.col("a._nrm") * F.col("b._nrm")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int | None = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then mark as duplicates
    vectors whose cosine similarity WITHIN a cluster exceeds ``threshold``.
    Clustering makes the pair space Σ|cell|² instead of n² — the published
    method's entire scaling argument; k is sized ~√n so cells stay bounded.

    Keep policy (deterministic): within each cluster, greedy keep-first by
    ascending id — a vector is dropped iff some LOWER-id vector in its
    cluster is ≥ threshold similar. (The paper keeps a random exemplar per
    duplicate group; greedy-by-id is the reproducible equivalent and needs
    no iterative connected components on the hot path.)

    This operator is the repo's canonical JUSTIFIED Pandas-UDF path: the
    per-cluster all-pairs cosine is a dense m×m matrix product — exactly
    what the paper computes — and a numpy int64 matmul does it ~1000×
    faster than interpreted per-pair array lambdas (measured: the
    expression form ran 45k cosines/s; one 275-member cell is 38k pairs).
    Determinism across engines comes from FIXED-POINT arithmetic
    (vectors.quantize_fixed, 2^24 scale): integer dot products are exact
    and order-independent, so numpy's blocked matmul, Spark expressions,
    and DuckDB's list_sum fold all yield the SAME int64 — the double
    division/sqrt/floor that follow are IEEE-identical everywhere.

    Returns one row per input vector: (id, cell_id, kept, n_dup_prior).
    Scale shape: one Arrow-batched narrow pass for assignment (the k×dim
    int codebook ships in the task closure), one shuffle on cell_id, one
    grouped-map per cell; a cell must fit an executor (bounded by k~√n).

    MEGA-CELL RE-SHARD (the 100 TB skew path): with ``max_cell_rows`` set,
    cells whose population exceeds it are re-sharded BEFORE the grouped
    map, by each member's SECOND-nearest centroid — already computed by
    the assignment matmul, so sub-clustering costs nothing extra and needs
    no new codebook. Near-duplicate pairs have near-identical cosines to
    every centroid, so they overwhelmingly share a second choice and stay
    comparable; pairs split across sub-shards go uncompared — the same
    recall-for-scale trade the paper makes with its cluster blocking in
    the first place. Detection needs per-cell counts, so the assigned
    relation is scoped-persisted and read twice (count + grouped map);
    pass ``max_cell_rows=None`` to skip both the persist and the count on
    corpora known to be skew-free. Within a group, a Gram matrix larger
    than ``_GRAM_BLOCK``² is computed in row/column blocks — quadratic
    time (inherent to all-pairs), but peak memory bounded by the block.
    """
    import numpy as np
    import pandas as pd

    cents = sorted(
        (r[0], [float(v) for v in r[1]])
        for r in centroids.select("cell_id", vec_col).collect()
    )
    scale = float(V.FIXED_SCALE)
    cmat = np.array(
        [[np.floor(v * scale + 0.5) for v in vec] for _, vec in cents],
        dtype=np.int64,
    )
    cell_ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))

    quantized = corpus.select(
        F.col(id_col), V.quantize_fixed(F.col(vec_col)).alias("qvec")
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(pdf["qvec"].tolist(), dtype=np.int64)
            dots = q @ cmat.T  # exact int64
            qn = np.sqrt((q * q).sum(axis=1).astype(np.float64))
            cos = dots / np.outer(qn, cnorm)
            best = cos.argmax(axis=1)  # first (lowest cell_id) wins ties
            if cos.shape[1] > 1:
                # Second-best centroid = the mega-cell sub-shard key.
                # Masking the winner then re-argmax keeps the same
                # first-lowest-index tie rule as the primary assignment.
                masked = cos.copy()
                masked[np.arange(len(best)), best] = -np.inf
                sub = cell_ids[masked.argmax(axis=1)]
            else:
                sub = np.zeros(len(best), dtype=np.int64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "cell_id": cell_ids[best],
                    "sub_id": sub,
                    "qvec": pdf["qvec"].values,
                }
            )

    assigned = quantized.mapInPandas(
        assign, schema=f"{id_col} long, cell_id long, sub_id long, qvec array<long>"
    )

    mega: set[int] = set()
    if max_cell_rows is not None:
        from ..caching import scoped_persist

        assigned = scoped_persist("similarity.semantic_dedup.assigned", assigned)
        mega = {
            r["cell_id"]
            for r in assigned.groupBy("cell_id")
            .count()
            .filter(F.col("count") > max_cell_rows)
            .collect()
        }
    if mega:
        shard = F.when(
            F.col("cell_id").isin([int(c) for c in mega]), F.col("sub_id")
        ).otherwise(F.lit(0))
    else:
        shard = F.lit(0)

    thr = float(threshold)
    # Captured into the closure (pickled by VALUE to workers, so tests can
    # shrink it; a module-global lookup would re-import the default there).
    gram_block = _GRAM_BLOCK

    def dedup_cell(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        cell = key[0]
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        q = np.array(pdf["qvec"].tolist(), dtype=np.int64)
        m = len(pdf)
        n = np.sqrt((q * q).sum(axis=1).astype(np.float64))
        if m <= gram_block:
            g = q @ q.T  # exact int64 Gram matrix
            cos = g / np.outer(n, n)
            # Same half-up 6-digit rounding as F.round/DuckDB round(x, 6)
            # for the positive range the threshold lives in.
            cos6 = np.floor(cos * 1e6 + 0.5) / 1e6
            prior = np.tril(cos6 >= thr, k=-1).sum(axis=1)
        else:
            # Blocked lower-triangular Gram: peak memory gram_block², not
            # m² — the executor-fit bound for a group that is still huge
            # after re-sharding.
            prior = np.zeros(m, dtype=np.int64)
            B = gram_block
            for i0 in range(0, m, B):
                i1 = min(i0 + B, m)
                for j0 in range(0, i1, B):
                    j1 = min(j0 + B, i1)
                    g = q[i0:i1] @ q[j0:j1].T
                    cos = g / np.outer(n[i0:i1], n[j0:j1])
                    hit = np.floor(cos * 1e6 + 0.5) / 1e6 >= thr
                    if j1 > i0:  # diagonal block: strict lower triangle
                        hit &= (
                            np.arange(i0, i1)[:, None] > np.arange(j0, j1)[None, :]
                        )
                    prior[i0:i1] += hit.sum(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "cell_id": np.full(m, cell, dtype=np.int64),
                "kept": prior == 0,
                "n_dup_prior": prior,
            }
        )

    return (
        assigned.withColumn("_shard", shard)
        .groupBy("cell_id", "_shard")
        .applyInPandas(
            dedup_cell,
            schema=f"{id_col} long, cell_id long, kept boolean, n_dup_prior long",
        )
    )


def label_centroids(emb: DataFrame, dim: int = 64) -> DataFrame:
    """Per-label centroid via grouped-map ``applyInPandas`` (the k-means
    update step / IVF cell-centroid refresh).

    The custom-operator escape hatch when Column expressions won't do:
    each group arrives as one Arrow-backed pandas frame. Summation uses
    ``math.fsum`` (exactly rounded) so the result is reproducible under
    any row order — the grouped-map equivalent of the engine's decimal-sum
    convention. Output is long-form (label, dim_idx, centroid) rows.

    Scale: one shuffle on label; a group must fit an executor's memory —
    for billion-row cells, switch to the expression-based partial-agg form
    (F.aggregate over zipped arrays), which this cross-checks against.
    """
    import math

    import pandas as pd

    out_schema = "label int, dim_idx int, centroid double"

    def centroid(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (label,) = key
        vecs = pdf["embedding"].tolist()
        n = len(vecs)
        rows = [
            (label, i + 1, round(math.fsum(float(v[i]) for v in vecs) / n, 6))
            for i in range(dim)
        ]
        return pd.DataFrame(rows, columns=["label", "dim_idx", "centroid"])

    return emb.groupBy("label").applyInPandas(centroid, schema=out_schema)


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train IVF centroids with Lloyd's k-means as a DataFrame loop.

    Deterministic: seeds are the k lowest-id vectors; each iteration is
    assign (broadcast centroids, narrow pass) → elementwise-mean update as
    ``dim`` per-dimension ``sum(element_at(...))`` aggregates — plain hash
    aggregation with map-side partial combine, one shuffle of k×dim
    partials per task, so a cell can hold billions of rows (a grouped-map
    or collect_list update would buffer the whole cell). The centroid
    relation is collected each round (k × dim doubles — driver negligible)
    to close the loop, exactly how MLlib's driver loop works.

    Returns (cell_id, embedding) centroids as array<double>.
    """
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    cents = (
        emb.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy(id_col))
            .alias("cell_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                vec_col
            ),
        )
    )
    for _ in range(iters):
        assigned = assign_cells(emb, cents, id_col, vec_col)
        sums = assigned.groupBy("cell_id").agg(
            *[
                F.sum(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(
                    f"_s{i}"
                )
                for i in range(dim)
            ],
            F.count(F.lit(1)).alias("_n"),
        )
        cents = sums.select(
            "cell_id",
            F.array(
                *[F.col(f"_s{i}") / F.col("_n") for i in range(dim)]
            ).alias(vec_col),
        )
        # materialize this round's centroids (small) to cut the lineage
        rows = cents.collect()
        cents = emb.sparkSession.createDataFrame(
            [(r["cell_id"], list(r[vec_col])) for r in rows],
            f"cell_id int, {vec_col} array<double>",
        )
    return cents


def kmeans_inertia(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean (1 - cosine-to-assigned-centroid): the convergence metric."""
    assigned = assign_cells(emb, cents, id_col, vec_col)
    joined = assigned.join(
        F.broadcast(cents.select("cell_id", F.col(vec_col).alias("_c"))),
        "cell_id",
    )
    row = joined.agg(
        F.avg(1 - _cos(F.col(vec_col), F.col("_c"))).alias("inertia")
    ).first()
    return float(row["inertia"])


def _sign_sketch_udf(planes: list[list[int]]):
    """Vectorized sign-sketch: all nbits sign bits in ONE Arrow-batched
    numpy pass instead of nbits interpreted Catalyst folds (higher-order
    functions are not codegen'd — measured ~10× slower at 64 planes).

    Determinism: embeddings are fixed-point-quantized to int64 first
    (functions/vectors.FIXED_SCALE), and the planes are ±1 integers, so the
    dot is an exact integer sum — order-independent, hence bit-identical
    between numpy's blocked matmul and any SQL engine's fold. A float
    matmul here could flip near-zero signs vs the oracle; integers cannot."""
    plane_mat = np.asarray(planes, dtype=np.int64).T  # dim × nbits

    @F.pandas_udf("string")
    def sketch(embs: pd.Series) -> pd.Series:
        if embs.empty:
            return pd.Series([], dtype=object)
        mat = np.stack(embs.to_numpy()).astype(np.float64)
        quant = np.floor(mat * float(V.FIXED_SCALE) + 0.5).astype(np.int64)
        bits = (quant @ plane_mat) >= 0
        lut = np.array(["0", "1"])
        return pd.Series(["".join(lut[row.astype(np.int8)]) for row in bits])

    return sketch


def sign_band_relation(
    corpus: DataFrame,
    planes: list[list[int]],
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra: tuple = (),
    bucket_cap: int | None = None,
) -> DataFrame:
    """(id, vec, *extra, band_idx, band_val) — every vector's sign sketch
    split into band bucket keys. The shared blocking relation behind the
    LSH pair emitters AND the r14 kNN-graph build (sim_graph_topk): any
    two vectors sharing (band_idx, band_val) are candidates. One narrow
    scan; the sketch is the vectorized fixed-point Pandas UDF whose
    arithmetic the SQL oracles reproduce bit-for-bit.

    ``bucket_cap`` (r15 — the hot-bucket budget guard, the simhash
    pair-budget pattern applied to the vector family): admit ~``bucket_cap``
    members of each (band_idx, band_val) bucket. The banded join's
    candidate space is Σ|bucket|²; one pathological bucket holding 20%
    of the corpus (mass-duplicated or degenerate embeddings) makes that
    term quadratic in CORPUS size no matter how wide the bands are —
    the cap turns it into Σ Õ(cap)², a linear bound, at the cost of
    recall ONLY inside buckets deeper than the cap (where members are
    near-identical by construction, so dropped candidates are the
    least informative ones).

    Admission rule (r16 — the scale-safe form; the r15 original kept
    the first ``cap`` ids via row_number over the bucket window, which
    SORTS the whole hot bucket on ONE task — linear, but the straggler
    at 100×): two passes, no per-bucket sort anywhere.
      pass 1  per-bucket counts n_b (map-side-combining groupBy — the
              hot key costs one long per task, not its rows), keep only
              the OVERFULL buckets (n_b > cap; a handful by definition);
      pass 2  broadcast those counts back and admit each member by a
              deterministic Lehmer-hash coin,
                  ((id % M) * A % M) % n_b < cap,   M=2^31−1, A=48271,
              i.e. rate cap/n_b — members of benign buckets never meet
              a join at all (left-join miss), the hot bucket streams
              through a broadcast hash probe with no sort, no single-
              task window, no skew shuffle of the big side.
    Admitted count per overfull bucket is Binomial(n_b, cap/n_b) — mean
    ``cap``, concentration O(√cap) — so the budget is a RATE, not a hard
    ceiling; every bound downstream is Σ Õ(cap)². Exact integer
    arithmetic end-to-end, so the SQL twin (a QUALIFY over a windowed
    count with the same Lehmer hash) reproduces the admitted set
    bit-for-bit."""
    nbits = len(planes)
    if nbits % bands != 0:
        raise ValueError(
            f"nbits ({nbits}) must divide evenly into bands ({bands}): a "
            "remainder would silently drop the trailing sign bits from every "
            "band key, weakening selectivity (the oracle SQL assumes exact "
            "division too)"
        )
    if bucket_cap is not None and bucket_cap < 1:
        raise ValueError(f"bucket_cap must be >= 1, got {bucket_cap}")
    rows_per = nbits // bands
    sig = _sign_sketch_udf(planes)(F.col(vec_col))
    side = corpus.select(F.col(id_col), F.col(vec_col), *extra, sig.alias("_sig"))
    out = side.select(
        id_col,
        vec_col,
        *[c for c in side.columns if c not in (id_col, vec_col, "_sig")],
        F.posexplode(
            F.array(
                *[
                    F.substring("_sig", b * rows_per + 1, rows_per)
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    ).drop("_sig")
    if bucket_cap is not None:
        # Pass 1: bucket sizes, OVERFULL only. Catalyst prunes the count
        # subtree to (band_idx, band_val) — the sketch runs twice (two
        # narrow vectorized passes), which beats caching n×bands vector
        # copies; at 100 TB the counts are maintained at ingest anyway.
        hot = (
            out.groupBy("band_idx", "band_val")
            .agg(F.count(F.lit(1)).alias("_nb"))
            .filter(F.col("_nb") > bucket_cap)
        )
        # Pass 2: broadcast the (few) overfull buckets; admit by the
        # Lehmer coin. Benign buckets miss the join (_nb null) and pass.
        coin = (
            (F.col(id_col) % F.lit(BUCKET_HASH_M)) * F.lit(BUCKET_HASH_A)
            % F.lit(BUCKET_HASH_M)
        )
        out = (
            out.join(F.broadcast(hot), ["band_idx", "band_val"], "left")
            .filter(
                F.col("_nb").isNull()
                | ((coin % F.col("_nb")) < F.lit(bucket_cap))
            )
            .drop("_nb")
        )
    return out


def hyperplane_lsh_pairs(
    corpus: DataFrame,
    planes: list[list[int]],
    bands: int = 4,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs WITHOUT a precomputed blocking label:
    random-hyperplane sign-LSH (sign sketches), banded.

    Where ``embedding_near_pairs`` needs a label/IVF cell to block on, this
    is the label-free scale path: each vector gets an nbits sign sketch
    (bit j = sign⟨v, p_j⟩, P(bit differs) = angle/π), the sketch splits
    into ``bands`` bucket keys, and only same-bucket vectors pair up — a
    banded equi-join exactly like MinHash-LSH, Σ|bucket|² pair space, never
    n². Candidates are then verified with exact cosine (per-side norms
    computed once). The sketch relation is scoped-persisted: it feeds both
    sides of the self-join.

    The sketch pass is a single vectorized Pandas UDF over fixed-point
    integers (see _sign_sketch_udf) — exact, order-independent arithmetic
    shared with the SQL oracle, at numpy speed."""
    from ..caching import scoped_persist

    nbits = len(planes)
    if nbits % bands != 0:
        raise ValueError(
            f"nbits ({nbits}) must divide evenly into bands ({bands}): a "
            "remainder would silently drop the trailing sign bits from every "
            "band key, weakening selectivity (the oracle SQL assumes exact "
            "division too)"
        )
    rows_per = nbits // bands
    exploded = sign_band_relation(
        corpus, planes, bands, id_col=id_col, vec_col=vec_col,
        extra=(V.norm(F.col(vec_col)).alias("_nrm"),),
        bucket_cap=bucket_cap,
    )
    exploded = scoped_persist("similarity.hyperplane_bands", exploded)
    a, b = exploded.alias("a"), exploded.alias("b")
    cands = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("_va"),
            F.col(f"b.{vec_col}").alias("_vb"),
            F.col("a._nrm").alias("_na"),
            F.col("b._nrm").alias("_nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return verified_pairs(cands, threshold)


def verified_pairs(cands: DataFrame, threshold: float) -> DataFrame:
    """Exact-cosine verification of candidate pairs carrying per-side
    vectors (``_va``/``_vb``) and precomputed norms (``_na``/``_nb``) —
    the emission tail shared by ``hyperplane_lsh_pairs`` and the
    maintained-index serving path (plans/extensions.
    dedup_embedding_lsh_served), so the division order
    ``dot / (na * nb)`` — which the SQL oracles reproduce bit-for-bit —
    can never drift between the batch and served queries."""
    return (
        cands.withColumn(
            "cosine",
            F.round(
                V.dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _pq_subdist(vec_col: str, dsub: int, vec_cast=None):
    """Squared L2 between a vector's subspace-j slice and the sub-centroid
    ``cvec`` (both indexed by the joined codebook row's ``j``), rounded to
    9 decimals for cross-engine argmin parity. Written as diff*diff, never
    pow(x, 2) — pow parity across engines is not guaranteed."""
    def term(i: int):
        d = (
            F.element_at(F.col(vec_col), (F.col("j") - 1) * dsub + i).cast(
                "double"
            )
            - F.element_at(F.col("cvec"), i).cast("double")
        )
        return d * d

    out = term(1)
    for i in range(2, dsub + 1):
        out = out + term(i)
    return F.round(out, 9)


def pq_assign_codes(
    emb: DataFrame,
    cents: DataFrame,
    dsub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding: for every vector and every subspace
    ``j``, the nearest sub-centroid id under squared L2 on that subspace's
    ``dsub``-dim slice. ``cents`` is the frozen codebook relation
    (j, c, cvec) — small, broadcast.

    Returns (id, j, c) — the PQ code table. Shape: broadcast-join narrow
    pass + a (id, j)-window for the argmin; at production scale this runs
    ONCE at ingest and the codes are a stored byte column (m log2(k) bits
    per vector — here 8x3 = 24 bits instead of 64 floats), which is the
    entire point of PQ: the serving path never touches raw vectors except
    for the final re-rank. Distances round to 9 decimals before the argmin
    (with the centroid id as tie-break) so Spark and any SQL verifier pick
    identical codes at float64 parity.
    """
    from pyspark.sql import Window

    scored = emb.join(F.broadcast(cents)).select(
        F.col(id_col),
        F.col("j"),
        F.col("c"),
        _pq_subdist(vec_col, dsub).alias("dist"),
    )
    w = Window.partitionBy(id_col, "j").orderBy("dist", "c")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "j", "c")
    )


def pq_topk_adc(
    emb: DataFrame,
    query: DataFrame,
    cents: DataFrame,
    dsub: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes (Jegou et al. 2011):
    build the query's (subspace x centroid) distance table — m*k_sub
    scalars, broadcast — then score every vector as the sum of m table
    lookups on its codes and take the k nearest.

    Scale shape: the scored relation is codes JOIN broadcast(dtable) — no
    raw-vector math on the serving path, one partial-agg shuffle of
    (id, partial-sum) pairs, then TakeOrderedAndProject for the top-k.
    Per-subspace lookups sum as DECIMAL(28,9) so the m-term total is
    order-independent (the repo's exact-sum convention).
    """
    dtab = cents.join(
        F.broadcast(query.select(F.col(vec_col).alias("qvec")))
    ).select("j", "c", _pq_subdist("qvec", dsub).alias("qdist"))
    codes = pq_assign_codes(emb, cents, dsub, id_col, vec_col)
    return (
        codes.join(F.broadcast(dtab), ["j", "c"])
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("qdist").cast("decimal(28,9)")).cast("double"), 6
            ).alias("adc_dist")
        )
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


def gram_matrix_fixed(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, g) — the exact integer Gram matrix of the quantized corpus:
    entries are per-coordinate fixed-point values floor(e*1e6 + 0.5)
    (the registry's IEEE-identical quantization), G = Q^T Q summed as
    exact integers, so the result is order-independent and bit-identical
    to any engine computing the same sums.

    Scale shape: each Arrow batch contributes ONE d x d numpy int64
    matmul (the BLAS-shaped partial — same discipline as the SemDeDup
    Gram cells), so the shuffle carries partitions x d^2 partial rows,
    never corpus x d^2 exploded rows. int64 headroom: |q| <= ~1e6+
    so a product is ~1e12 and a 100k-row batch partial ~1e17, inside
    int64; the cross-partition sum rides DECIMAL(38,0) so the TOTAL has
    no corpus ceiling."""
    import numpy as np
    import pandas as pd

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            # floor(x*1e6 + 0.5): the registry's per-row quantization,
            # reproduced with the identical IEEE ops (NOT np.rint, whose
            # banker's rounding diverges on exact halves)
            q = np.floor(
                np.stack(pdf[vec_col].to_numpy()) * 1e6 + 0.5
            ).astype(np.int64)
            g = q.T @ q  # d x d int64 partial
            d = g.shape[0]
            ii, jj = np.meshgrid(
                np.arange(d, dtype=np.int64),
                np.arange(d, dtype=np.int64),
                indexing="ij",
            )
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "partial": g.ravel()}
            )

    from pyspark.sql import functions as F

    partials = emb.select(vec_col).mapInPandas(
        batches, schema="i int, j int, partial long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum(F.col("partial").cast("decimal(38,0)"))
        .cast("long")
        .alias("g")
    )
