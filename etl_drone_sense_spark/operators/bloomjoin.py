"""Bloom-prefiltered join: cut the fact-side shuffle before an equi-join
whose dim side is too big to broadcast but whose KEY SET fits a bloom.

The 100-TB problem this solves: a selective dim filter (say 1-in-5
orders) joined against a fact table shuffles the ENTIRE fact side, then
drops 80% of it inside the join. Broadcast fixes that only while the dim
fits executor memory; past that, the classic answer (Spark's own
``spark.sql.optimizer.runtime.bloomFilter``, Iceberg/Trino bloom
pushdown) is a bloom filter over the dim keys applied fact-side BEFORE
the shuffle — false positives just ride along and die in the exact join,
so correctness never depends on the filter (the same contract as the
manifest blooms in sources/table_commit.py).

This module is the ENGINE-OWNED version of that move, independent of the
optimizer's size-threshold heuristics (which at 100 TB fire exactly when
file statistics say so — the built-in injection is plan-asserted
separately in tests/test_plans.py):

* build side: one ``mapInPandas`` pass over the dim keys produces a
  fixed-size bitset PER PARTITION (numpy-vectorized double hashing);
  the driver ORs the partials — ``num_partitions × m/8`` bytes of
  driver traffic, the same order as Spark's bloom_filter_agg subquery
  result, never the keys themselves;
* probe side: the OR'd bitset broadcasts into an Arrow-batched
  ``pandas_udf`` predicate on the fact key, filtering before any
  shuffle. The exact join runs on the survivors.

Hashing is splitmix64-style multiplicative mixing over the int64 key —
pure numpy uint64 arithmetic (wrapping is the algorithm), no Python loop
over rows, no md5-per-row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_K = 6

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 keys (wrapping uint64
    ARRAY arithmetic IS the algorithm — numpy wraps arrays silently; the
    seed offset is pre-wrapped in Python int space because numpy warns
    on SCALAR overflow)."""
    z = x + np.uint64((seed * int(_GOLDEN)) % (1 << 64))
    z = (z ^ (z >> np.uint64(30))) * _MIX1
    z = (z ^ (z >> np.uint64(27))) * _MIX2
    return z ^ (z >> np.uint64(31))


def _indices(keys: np.ndarray, i: int, m_bits: int) -> np.ndarray:
    """Double-hashed bit index i for each key: (h1 + i·h2) mod m."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(u, 1)
    h2 = _splitmix64(u, 2) | np.uint64(1)
    return ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)


def build_key_bloom(dim: DataFrame, key: str, m_bits: int = 1 << 23) -> bytes:
    """OR-merged bloom bitset over ``dim[key]`` (one executor pass,
    ``num_partitions × m_bits/8`` bytes of driver traffic). ``m_bits``
    must be a power of two; size it ~10 bits per expected distinct key
    for ~1% FP at k=6 (the sources/table_commit.py sizing rule)."""
    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    n_bytes = m_bits // 8

    def part_bits(it):
        bits = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in it:
            keys = pdf[key].to_numpy()
            keys = keys[~pd.isna(keys)]
            if not keys.size:
                continue
            seen = True
            for i in range(BLOOM_K):
                idx = _indices(keys, i, m_bits)
                np.bitwise_or.at(
                    bits, idx >> 3, (np.uint8(1) << (idx & 7).astype(np.uint8))
                )
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = dim.select(key).mapInPandas(
        part_bits, schema="bits binary"
    ).collect()
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for row in partials:
        merged |= np.frombuffer(row.bits, dtype=np.uint8)
    return merged.tobytes()


def bloom_might_contain(
    spark, bloom: bytes, key_col: Column | str, m_bits: int = 1 << 23
) -> Column:
    """Arrow-batched ``might_contain`` predicate over the broadcast
    bitset — the fact-side prefilter. NULL keys return false (they can
    never equi-join)."""
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf(T.BooleanType())
    def might_contain(keys: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        kn = keys.to_numpy()
        mask = ~pd.isna(kn)
        out = np.zeros(len(kn), dtype=bool)
        if mask.any():
            kv = kn[mask].astype(np.int64)
            ok = np.ones(kv.size, dtype=bool)
            for i in range(BLOOM_K):
                idx = _indices(kv, i, m_bits)
                ok &= (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 == 1
            out[mask] = ok
        return pd.Series(out)

    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return might_contain(c)


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 23,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a bloom prefilter on the fact side: only fact rows
    whose key MIGHT be in the dim key set reach the shuffle; the exact
    join on top removes bloom false positives, so the result is
    hash-identical to the plain join (the registered query's oracle IS
    the plain join). Inner/semi only — an outer join must keep
    non-matching fact rows, which the prefilter would drop."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            "bloom_prefilter_join supports inner/semi joins only "
            f"(outer joins must keep non-matching rows): {how!r}"
        )
    spark = fact.sparkSession
    bloom = build_key_bloom(dim, dim_key, m_bits)
    pre = fact.filter(bloom_might_contain(spark, bloom, fact_key, m_bits))
    return pre.join(dim, pre[fact_key] == dim[dim_key], how)
