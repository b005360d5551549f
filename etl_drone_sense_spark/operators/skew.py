"""Skew-resistant join (explicit salting).

A sort-merge join on a skewed key places the hot key's ENTIRE fact-side
volume in one reducer task — the task that never finishes at 100 TB.
Two remedies, complementary:

* **AQE skew-join split** (``spark.sql.adaptive.skewJoin.enabled``):
  Spark detects oversized shuffle partitions at runtime and splits them,
  replicating the matching build-side blocks. Zero code, but it needs the
  runtime stats to be visible (first shuffle materialized) and only
  applies to sort-merge joins. Demonstrated in tests/test_plans.py.
* **Explicit salting** (this module): the fact side is sharded into
  ``salts`` pseudo-keys via a uniform hash of its unique columns, and the
  dim side is replicated once per shard, turning one hot reducer into
  ``salts`` uniform ones. Works with stats invisible, under AQE-off, and
  for downstream aggregations that must stay co-partitioned.

Shuffle math: fact volume unchanged; dim volume × ``salts`` (dims are the
small side by construction — if the dim does not fit ×salts in the
shuffle, broadcast it instead and skew stops mattering entirely).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str | Sequence[str],
    salt_on: Sequence[str],
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⨝ dim`` on ``key`` with a ``salts``-way salt.

    ``salt_on``: fact columns whose hash spreads the hot key's rows
    uniformly across shards (any unique-ish tuple — a row id, or the full
    natural key). The salt is internal; the output schema equals a plain
    join's.

    ``how`` is restricted to inner/left (and left_semi): the dim side is
    pre-exploded ×``salts``, so a right/full outer join would emit each
    UNMATCHED dim row ``salts`` times — no longer a plain join's output.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}, got {how!r}: the "
            "dim side is replicated per salt, so outer variants would "
            "duplicate unmatched dim rows"
        )
    keys = [key] if isinstance(key, str) else list(key)
    f = fact.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in salt_on]), F.lit(salts))
    )
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    return f.join(d, on=[*keys, "_salt"], how=how).drop("_salt")
