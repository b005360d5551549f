"""Round-4 curation-at-scale queries: semantic dedup, CDC changelog
derivation, bigram LM scoring, domain-mixture sampling, sequential
pattern matching, Z-order layout, and importance sampling.

These extend the training-data-pipeline surface (SURVEY §2 C) past the
round-3 set: every query here is a full-oracle registry entry following
the repo's conventions — decimal/fixed-point exact aggregation, rounded
transcendentals, deterministic tie-breaks, literal constants shared
character-for-character between the Spark expressions and the DuckDB SQL.

Reference parity note: the reference (task.ts:1-224) contains none of
this; these are the engine's scale-path extensions mandated by the
BASELINE.json north star, same as plans/extensions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as TXT
from ..functions import vectors as V
from ..operators import merge as M
from ..operators import similarity
from .registry import register, t
from .extensions import _frozen_cents_values, _seeded_embeddings, _SEEDED_EMB_CTE

# ---------------------------------------------------------------------------
# Semantic deduplication (SemDeDup)
# ---------------------------------------------------------------------------


@register(
    "dedup_semantic",
    oracle=f"""
    WITH {_SEEDED_EMB_CTE},
    cents AS (
        SELECT * FROM (VALUES {_frozen_cents_values()}) AS v(cell_id, cvec)
    ),
    scored AS (
        SELECT e.vec_id, e.embedding, c.cell_id,
               round({V.cosine_sql('e.embedding', 'c.cvec')}, 9) AS sim
        FROM seeded e CROSS JOIN cents c
    ),
    mem AS (
        SELECT vec_id, embedding, cell_id FROM (
            SELECT vec_id, embedding, cell_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, cell_id) AS rn
            FROM scored)
        WHERE rn = 1
    ),
    pairs AS (
        SELECT b.vec_id AS id_b
        FROM mem a JOIN mem b
          ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
        WHERE round({V.cosine_sql('a.embedding', 'b.embedding')}, 6) >= 0.8
    ),
    dups AS (SELECT id_b AS vec_id, count(*) AS n_dup_prior
             FROM pairs GROUP BY id_b)
    SELECT m.vec_id, m.cell_id,
           d.vec_id IS NULL AS kept,
           coalesce(d.n_dup_prior, 0) AS n_dup_prior
    FROM mem m LEFT JOIN dups d USING (vec_id)
    """,
    tags=("dedup", "similarity", "semantic"),
    bench=True,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.semantic_dedup): cluster-blocked
    semantic deduplication over the frozen IVF codebook — assign every
    embedding to its nearest trained centroid (broadcast narrow pass),
    find ≥0.8-cosine pairs WITHIN cells only (Σ|cell|² pair space), and
    greedily keep the lowest id per duplicate relation. Seeded companions
    (+0.05 shift, same as dedup_embedding) make the threshold non-vacuous.
    """
    from ._frozen_codebook import FROZEN_CENTROIDS

    cents = spark.createDataFrame(
        list(FROZEN_CENTROIDS), "cell_id int, embedding array<double>"
    )
    return similarity.semantic_dedup(
        _seeded_embeddings(spark, sf_dir), cents, threshold=0.8
    )


# ---------------------------------------------------------------------------
# CDC changelog derivation (snapshot diff)
# ---------------------------------------------------------------------------

_CDC_V2_SQL = """
    base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    ),
    v2 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 10.0
                    ELSE o_totalprice END AS o_totalprice
        FROM base WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 50000000, o_custkey, o_orderstatus, o_totalprice
        FROM base WHERE o_orderkey % 101 = 0
    )
"""


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH {_CDC_V2_SQL}
    SELECT CASE WHEN n.o_orderkey IS NULL THEN 'D'
                WHEN o.o_orderkey IS NULL THEN 'I'
                ELSE 'U' END AS op,
           coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN n.o_orderkey IS NULL THEN o.o_custkey
                ELSE n.o_custkey END AS o_custkey,
           CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus
                ELSE n.o_orderstatus END AS o_orderstatus,
           CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice
                ELSE n.o_totalprice END AS o_totalprice
    FROM base o FULL OUTER JOIN v2 n ON o.o_orderkey = n.o_orderkey
    WHERE n.o_orderkey IS NULL OR o.o_orderkey IS NULL
       OR o.o_custkey IS DISTINCT FROM n.o_custkey
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
    tags=("cdc", "lake", "merge"),
    bench=True,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture derivation (operators/merge.snapshot_diff): the
    changelog (op I/U/D + row values) between two snapshots of a table —
    Delta CDF semantics computed from plain versions, the inverse of
    merge_upsert (merge_into(old, diff) == new; round-trip pinned in
    tests/test_merge.py). v2 is a deterministic mutation of orders:
    ~1/97 of keys deleted, ~1/89 repriced (+10), ~1/101 re-inserted under
    a shifted key. One full-outer hash join on the key; change detection
    is a null-safe struct comparison — map-side, no second pass."""
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    survivors = base.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 10.0
        ).otherwise(F.col("o_totalprice")),
    )
    inserts = base.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 50000000).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
    )
    v2 = survivors.unionByName(inserts)
    return M.snapshot_diff(base, v2, ["o_orderkey"])


# ---------------------------------------------------------------------------
# Bigram language-model quality scoring
# ---------------------------------------------------------------------------


@register(
    "text_bigram_lm",
    oracle=f"""
    WITH bigr AS MATERIALIZED (
        SELECT doc_id, unnest({TXT.word_ngrams_sql('text', 2)}) AS g
        FROM documents
    ),
    c2 AS (SELECT g, count(*) AS n2 FROM bigr GROUP BY g),
    c1 AS (SELECT string_split(g, ' ')[1] AS w1, sum(n2) AS n1
           FROM c2 GROUP BY 1),
    voc AS (SELECT count(DISTINCT string_split(g, ' ')[2]) AS v FROM c2),
    lp AS (
        SELECT c2.g,
               CAST(floor(ln((c2.n2 + 0.5) / (c1.n1 + 0.5 * voc.v))
                          * 1000000000) AS BIGINT) AS lp_q
        FROM c2
        JOIN c1 ON string_split(c2.g, ' ')[1] = c1.w1
        CROSS JOIN voc
    )
    SELECT b.doc_id,
           count(*) AS n_bigrams,
           round(sum(lp.lp_q) / 1e9 / count(*), 6) AS avg_logprob
    FROM bigr b JOIN lp USING (g)
    GROUP BY b.doc_id
    """,
    tags=("text", "quality", "lm"),
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality scoring with add-k smoothing (k=0.5) — the
    next-order companion of text_unigram_logprob: P(w2|w1) estimated from
    the corpus itself, documents scored by mean per-bigram log-prob.
    Degenerate/repetitive docs score high, token-salad scores low.

    Scale shape: bigrams come from ONE posexplode + one lead() window per
    doc (codegen'd, same pattern text_repetition measured 6x faster than
    interpreted array lambdas); counts collapse map-side to bigram-
    vocabulary size; the context (w1) relation derives from the bigram
    counts — no second corpus pass; the score join is co-partitioned on
    the bigram string. Log-probs are quantized to fixed-point BIGINT
    before summation (floor(lp*1e9)) so every aggregate is exact integer
    arithmetic under any partitioning (repo convention). Docs with < 2
    tokens have no bigrams and are absent, matching the unpadded n-gram
    semantics of word_ngrams_sql."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    wp = Window.partitionBy("doc_id").orderBy("pos")
    bigr = (
        docs.select(
            "doc_id", F.posexplode(TXT.tokens(F.col("text"))).alias("pos", "tok")
        )
        .select(
            "doc_id", "tok", F.lead("tok", 1).over(wp).alias("t1")
        )
        .filter(F.col("t1").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "t1").alias("g"))
    )
    from ..caching import scoped_persist

    bigr = scoped_persist("curation.bigram_rel", bigr)
    c2 = bigr.groupBy("g").agg(F.count("*").alias("n2"))
    w1 = F.split(F.col("g"), " ").getItem(0)
    w2 = F.split(F.col("g"), " ").getItem(1)
    c1 = c2.groupBy(w1.alias("w1")).agg(F.sum("n2").alias("n1"))
    voc = c2.select(w2.alias("w2")).agg(
        F.count_distinct(F.col("w2")).alias("v")
    )
    lp = (
        c2.join(c1, w1 == F.col("w1"))
        .crossJoin(F.broadcast(voc))
        .select(
            "g",
            F.floor(
                F.log(
                    (F.col("n2") + 0.5) / (F.col("n1") + 0.5 * F.col("v"))
                )
                * 1e9
            )
            .cast("bigint")
            .alias("lp_q"),
        )
    )
    return (
        bigr.join(lp, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum("lp_q") / 1e9 / F.count("*"), 6).alias("avg_logprob"),
        )
    )
