"""Embedding vector math as JVM-side higher-order functions.

All operations promote float32 elements to double *before* accumulating and
fold strictly left-to-right, so Spark and the DuckDB oracle produce
bit-identical sums (same IEEE ops in the same order) — no tolerance needed.

Scale: dot/norm are per-row map work (codegen, no shuffle).  The expensive
part of similarity search is candidate generation; see
operators/similarity.py for the LSH-bucketed path.
"""

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


# Arrow-vectorized fast paths -------------------------------------------------
#
# Spark's array higher-order functions evaluate lambdas interpreted (outside
# whole-stage codegen) — ~ms per 64-dim cosine, which dominates pair-scoring.
# The pandas_udf paths below do the same math in numpy over Arrow batches
# (float64 matrix ops): 10-100x faster.  numpy sums pairwise rather than
# strictly left-to-right, so results can differ from the HOF/oracle fold in
# the last ulp — irrelevant after round(, 6) and for rankings with gaps
# >> 1e-12, which is why the suite can use them against the same oracles.


def dot_pandas(a: Column, b: Column) -> Column:
    """Pairwise dot of two array<float> columns via Arrow-batched numpy."""

    @pandas_udf("double")
    def _dot(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xm = np.stack(xs.to_numpy()).astype("float64")
        ym = np.stack(ys.to_numpy()).astype("float64")
        return pd.Series(np.einsum("ij,ij->i", xm, ym))

    return _dot(a, b)


def cosine_pandas(a: Column, b: Column) -> Column:
    """Pairwise cosine in ONE Arrow stage (dot + both norms per batch) —
    avoids chaining separate UDF evals that each re-ship the arrays."""

    @pandas_udf("double")
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        xm = np.stack(xs.to_numpy()).astype("float64")
        ym = np.stack(ys.to_numpy()).astype("float64")
        dots = np.einsum("ij,ij->i", xm, ym)
        na = np.sqrt(np.einsum("ij,ij->i", xm, xm))
        nb = np.sqrt(np.einsum("ij,ij->i", ym, ym))
        denom = na * nb
        out = np.where(denom != 0, dots / np.where(denom == 0, 1, denom), np.nan)
        return pd.Series(out)

    return _cos(a, b)


def norm_pandas(a: Column) -> Column:
    """L2 norm of an array<float> column via Arrow-batched numpy."""

    @pandas_udf("double")
    def _norm(xs: pd.Series) -> pd.Series:
        xm = np.stack(xs.to_numpy()).astype("float64")
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", xm, xm)))

    return _norm(a)


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
