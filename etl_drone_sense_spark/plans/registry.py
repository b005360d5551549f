"""Query registry: every operator the engine claims, as a named pair of
(a Spark DataFrame program, an ANSI-SQL DuckDB oracle).

This drives ``__spark_entry__.queries()`` / ``oracle_sql()`` (the driver's
correctness gate), ``bench.py``, and the differential tests.

Numeric-parity conventions (SURVEY §7.4):
* double sums are computed as ``sum(cast(x as decimal(28,6)))`` then cast
  back to double — decimal summation is exact and order-independent, so
  Spark's partial-aggregation order can't diverge from DuckDB's;
* results of transcendental math are ``round(.., 6)`` inside the query;
* top-k queries always carry a unique-key tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver does a weaker rows-only check
    tags: tuple[str, ...]
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = False
):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), bench)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture table scan with declared schema."""
    return read_table(spark, sf_dir, name)


# --- exact-sum helpers (see module docstring) -------------------------------

def dsum(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(28,6)")).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast("decimal(28,6)")).cast("double") / F.count(c)).alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def davg_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(sum(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / count({expr}) AS {alias}"
    )


def _load() -> None:
    # Import for registration side-effects.
    from . import drone, extensions, relational  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {n: s.fn for n, s in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


def get(name: str) -> QuerySpec:
    _load()
    return REGISTRY[name]


def bench_queries() -> dict[str, QueryFn]:
    _load()
    return {n: s.fn for n, s in REGISTRY.items() if s.bench}
