"""Scoped persistence for relations consumed by multiple subplans.

A DataFrame persisted inside an operator outlives the operator call:
Spark's CacheManager holds cached plans until explicitly unpersisted, so a
long-lived session that invokes the same operator repeatedly (a bench
loop, the driver's registry sweep) accumulates dead cached blocks in
executor memory. ``scoped_persist`` keeps AT MOST ONE live cache per key —
each new invocation releases the previous one — and ``release_caches()``
drops everything (bench.py calls it between queries). The cache still
can't be released eagerly inside the operator itself: the consuming action
runs later, caller-side, and an unpersist before it would silently disable
the sharing the persist exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: dict[str, DataFrame] = {}


def scoped_persist(
    key: str,
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    prev = _LIVE.pop(key, None)
    if prev is not None:
        prev.unpersist(blocking=False)
    out = df.persist(level)
    _LIVE[key] = out
    return out


def release_caches() -> None:
    """Unpersist every scoped cache (end of a bench iteration / sweep)."""
    while _LIVE:
        _, df = _LIVE.popitem()
        df.unpersist(blocking=False)


def live_cache_count() -> int:
    return len(_LIVE)
