"""Training-corpus preparation operators (LLM-pipeline surface).

* ``chunk_documents``   — overlapping token-window chunking (context-length
                          shaping for pretraining/fine-tuning corpora);
* ``assign_split``      — deterministic hash-based train/val/test split
                          (md5-derived, so the assignment is reproducible
                          across engines, runs and cluster sizes — never
                          RNG-sampled, which would shift under re-partition);
* ``cross_source_overlap`` — n-gram-hash contamination check between
                          sources (the train/test-leak detector).

All pure Catalyst expressions; chunking is explode-based (narrow), the
split is a scalar hash, the overlap check is an equi-join on shingle
hashes — the same never-materialize-the-pair-space shape as the LSH dedup
family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Split each document into overlapping token windows.

    Window starts step by ``chunk_tokens - overlap``; the final window may
    be short (slice past the end truncates). Narrow: sequence+slice inside
    one projection, then a generator — no shuffle at any corpus size.
    """
    step = chunk_tokens - overlap
    # Stage tokenization in a projected column: the slice lambda would
    # otherwise re-evaluate the tokenize subtree once per chunk
    # (functions/text.shingles_from_tokens rationale).
    staged = docs.withColumn("_toks", TXT.tokens(F.col(text_col)))
    toks = F.col("_toks")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - overlap, F.lit(1)), F.lit(step)
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s, chunk_tokens))
    return staged.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "_chunk"),
    ).select(
        id_col,
        "chunk_idx",
        F.array_join(F.col("_chunk"), " ").alias("chunk_text"),
        F.size(F.col("_chunk")).cast("long").alias("n_tokens"),
    )


def chunk_documents_sql(chunk_tokens: int = 50, overlap: int = 10) -> str:
    """DuckDB twin of ``chunk_documents`` over the documents table."""
    step = chunk_tokens - overlap
    toks = TXT.tokens_sql("text")
    return f"""
    SELECT doc_id,
           CAST(u.i - 1 AS INT) AS chunk_idx,
           array_to_string(list_slice(t.toks, 1 + (u.i - 1) * {step},
                           (u.i - 1) * {step} + {chunk_tokens}), ' ') AS chunk_text,
           len(list_slice(t.toks, 1 + (u.i - 1) * {step},
               (u.i - 1) * {step} + {chunk_tokens})) AS n_tokens
    FROM (SELECT doc_id, {toks} AS toks FROM documents) t,
         LATERAL (SELECT unnest(range(1, 2 + (greatest(len(t.toks) - {overlap}, 1) - 1) // {step})) AS i) u
    """


def split_bucket(id_col: Column) -> Column:
    """Deterministic 0-99 bucket from the md5 of the row id."""
    return F.pmod(
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(100),
    )


def split_bucket_sql(id_expr: str) -> str:
    return f"(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8))::BIGINT % 100)"


def assign_split(
    df: DataFrame, id_col: str, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Attach a reproducible train/val/test split column."""
    b = split_bucket(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def cross_source_overlap(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    shingle_n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs from DIFFERENT groups sharing ≥ min_shared n-gram
    hashes — the contamination/leak detector between corpus sources.

    Shape: distinct shingle hashes per doc (narrow) → explode → equi-join
    on the hash value with group_a < group_b → count shared hashes per
    pair. Only true shared-shingle buckets ever join."""
    hashed = docs.withColumn("_toks", TXT.tokens(F.col(text_col))).select(
        F.col(id_col),
        F.col(group_col),
        F.explode(
            F.array_distinct(
                TXT.shingle_hashes_from_tokens(F.col("_toks"), shingle_n)
            )
        ).alias("h"),
    )
    a, b = hashed.alias("a"), hashed.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.h") == F.col("b.h"),
                F.col(f"a.{group_col}") < F.col(f"b.{group_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{group_col}").alias("group_a"),
            F.col(f"b.{group_col}").alias("group_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def stratified_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, int]
) -> DataFrame:
    """Deterministic stratified downsampling: keep a row iff its md5
    bucket (0-99, from the row KEY — never RNG) is below the stratum's
    target percentage. Strata absent from ``rates`` are dropped (rate 0).

    The workhorse of corpus mixing — "keep 10% of CommonCrawl, 50% of
    books, all of reference data" — expressed as a pure scalar predicate:
    no shuffle, no sort, reproducible across engines/runs/cluster sizes,
    and pushes down to the scan like any other filter.
    """
    pairs: list[Column] = []
    for stratum, pct in rates.items():
        pairs += [F.lit(stratum), F.lit(int(pct))]
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(stratum_col)), F.lit(0)
    )
    return df.filter(split_bucket(F.col(key_col)) < rate)


def stratified_sample_pred_sql(
    key_expr: str, stratum_expr: str, rates: dict[str, int]
) -> str:
    """DuckDB twin of the ``stratified_sample`` predicate."""
    cases = " ".join(
        f"WHEN '{s}' THEN {int(p)}" for s, p in rates.items()
    )
    return (
        f"{split_bucket_sql(key_expr)} < "
        f"(CASE {stratum_expr} {cases} ELSE 0 END)"
    )


def reservoir_per_group(
    df: DataFrame, key_col: str, group_col: str, k: int
) -> DataFrame:
    """Deterministic k-per-group sample ("frozen reservoir"): rank rows
    within each group by the md5 of their key — a fixed pseudorandom
    order — and keep the first k. Adds ``sample_rank`` (1-based).

    One shuffle on the group column; at 100 TB groups are processed
    independently and the rank never materializes more than k rows per
    group downstream. Unlike ``TABLESAMPLE``/RNG reservoirs the output is
    stable under re-partitioning and re-runs, which is what a training-
    data pipeline needs for reproducible eval carve-outs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
