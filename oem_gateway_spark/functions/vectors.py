"""Embedding vector math as JVM-side higher-order functions.

All operations promote float32 elements to double *before* accumulating and
fold strictly left-to-right, so Spark and the DuckDB oracle produce
bit-identical sums (same IEEE ops in the same order) — no tolerance needed.

Scale: dot/norm are per-row map work (codegen, no shuffle).  The expensive
part of similarity search is candidate generation; see
operators/similarity.py for the LSH-bucketed path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of elementwise products (double precision)."""
    return F.aggregate(
        F.zip_with(to_double(a), to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(
        to_double(a), F.lit(0.0), lambda acc, x: acc + x * x
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe for zero vectors (returns NULL)."""
    denom = F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b))
    return F.when(denom != 0, dot(a, b) / denom)


# DuckDB twins (list lambdas fold left-to-right like F.aggregate).

def dot_sql_duckdb(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE)), 'sum')"
    )


def sq_norm_sql_duckdb(a: str) -> str:
    return (
        f"list_aggregate(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
    )


def cosine_sql_duckdb(a: str, b: str) -> str:
    return (
        f"({dot_sql_duckdb(a, b)}) / "
        f"(sqrt({sq_norm_sql_duckdb(a)}) * sqrt({sq_norm_sql_duckdb(b)}))"
    )
