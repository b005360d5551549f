"""Vector column expressions over ``array<float>`` embeddings.

Pure Catalyst expressions (``zip_with`` + ``aggregate``): the dot product
and norms stay JVM-side and codegen'd, so brute-force similarity scans are
memory-bandwidth-bound, not Python-bound. Math is done in double precision
(floats are up-cast before multiply) to match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    # Same sequential left-fold order as the Spark ``aggregate`` above.
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def unit(a: Column) -> Column:
    """L2-normalized copy of the vector (unit length)."""
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def quantize_i8(u: Column) -> Column:
    """Symmetric int8 quantization of a unit vector: floor(x*127 + 0.5).

    floor(+0.5) instead of round(): identical halfway behavior in every
    engine (round() half-handling differs across engines/signs)."""
    return F.transform(u, lambda x: F.floor(x * 127 + F.lit(0.5)).cast("int"))
