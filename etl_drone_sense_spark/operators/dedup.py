"""Deduplication operators (extension surface, SURVEY §2 Part C1/C2).

Four strategies, all shaped for 100 TB:

* exact          — hash-groupBy on a canonical fingerprint. One shuffle on
                   the fingerprint; map-side partial aggregation applies.
* MinHash + LSH  — shingle → k salted min-hashes → band buckets → equi-join
                   on (band, bucket). The join is on a hashed key, so it
                   shuffles candidate *buckets*, never the O(n²) pair space.
* SimHash        — nbit majority fingerprint + pigeonhole block join for
                   hamming-distance candidates.
* n-gram Jaccard — exact Jaccard verification on LSH candidate pairs
                   (verify-after-block, the standard scalable shape).

Everything is Catalyst expressions (functions/text.py): no Python in the row
path, and every step is a plain groupBy/join Catalyst can plan (AQE handles
skewed buckets — e.g. a boilerplate shingle set shared by millions of docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical (normalized) texts; keep the min id as survivor."""
    return (
        df.withColumn("fp", TXT.fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def with_minhash_signature(
    df: DataFrame, text_col: str, k: int = 12, shingle_n: int = 3
) -> DataFrame:
    """Append minhash signature columns mh0..mh{k-1}."""
    shingles = TXT.word_shingles(F.col(text_col), shingle_n)
    out = df.withColumn("_shingles", shingles)
    for i in range(k):
        out = out.withColumn(f"mh{i}", TXT.minhash_component(F.col("_shingles"), i))
    return out.drop("_shingles")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    rows/band = k/bands; two docs become candidates iff some band's
    signature slice matches exactly. Estimated Jaccard = fraction of all k
    components that agree. Returns (id_a, id_b, est_jaccard) with
    id_a < id_b, est_jaccard >= threshold.
    """
    rows_per_band = k // bands
    sig = with_minhash_signature(df, text_col, k, shingle_n)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    sig = sig.select(F.col(id_col), *[F.col(f"mh{i}") for i in range(k)], *band_cols)

    # One (band_idx, bucket) row per doc per band → self equi-join on bucket.
    exploded = sig.select(
        F.col(id_col),
        *[F.col(f"mh{i}") for i in range(k)],
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias(
            "band_idx", "bucket"
        ),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[F.col(f"a.mh{i}").alias(f"amh{i}") for i in range(k)],
            *[F.col(f"b.mh{i}").alias(f"bmh{i}") for i in range(k)],
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = sum(
        F.when(F.col(f"amh{i}") == F.col(f"bmh{i}"), 1).otherwise(0) for i in range(k)
    )
    return (
        pairs.withColumn("est_jaccard", agree / F.lit(float(k)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Exact n-gram Jaccard on LSH candidate pairs (blocked verification)."""
    cands = minhash_lsh_pairs(
        df, id_col, text_col, k=k, bands=bands, threshold=0.0, shingle_n=shingle_n
    ).select("id_a", "id_b")
    sets = df.select(
        F.col(id_col),
        F.array_distinct(TXT.word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    joined = (
        cands.join(sets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        joined.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str, nbits: int = 16) -> DataFrame:
    return df.select(
        F.col(id_col), TXT.simhash_bits(F.col(text_col), nbits).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    nbits: int = 16,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole blocking: split the fingerprint into ``blocks`` slices; any
    pair within distance ``max_hamming < blocks`` must agree on ≥1 slice, so
    the join key is (slice_idx, slice_value) — never an all-pairs product.
    """
    width = nbits // blocks
    fp = simhash_fingerprints(df, id_col, text_col, nbits)
    exploded = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[F.substring("simhash", b * width + 1, width) for b in range(blocks)]
            )
        ).alias("block_idx", "block_val"),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.block_idx") == F.col("b.block_idx"),
                F.col("a.block_val") == F.col("b.block_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = TXT.hamming_bits(F.col("sh_a"), F.col("sh_b"), nbits)
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
