"""K-means training (Lloyd's algorithm) as a DataFrame-iterative operator —
the 'iterative algorithm' pattern (and the honest way to train the IVF
centroids that operators/similarity.py currently pins as constants).

Design (the MLlib shape, re-derived):

  - centroids live on the DRIVER (k x dim doubles — a few KB), broadcast
    into each iteration as literal arrays; the DATA never leaves executors.
  - one iteration = one job: assign each vector to its nearest centroid
    (argmin over k squared distances, all JVM codegen — no UDF), then
    per-(cluster, dimension) averages via posexplode + partial aggregation.
    The only shuffle per iteration carries k x dim partial sums, not
    vectors.
  - the per-iteration ``collect`` is k x dim aggregated values (the same
    justified scalar-collect class as graph.py's convergence sums).

Determinism across engines (the oracle contract): centroids are ROUNDED to
6 decimals after every recompute, so both engines iterate from bit-identical
centroid values; distances fold dimensions in index order; argmin breaks
exact ties toward the lower cluster id.  Seeds are the embeddings of the k
lowest ids — reproducible, no RNG.

At 100 TB: iterations scan the corpus once each (cache the vector column if
memory allows); the assign+partial-avg shape is a map + one tiny exchange,
so wall time is iterations x one-pass scan — the known Lloyd's cost.  Use
a sampled corpus for training and ivf_ann_topk for serving.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dist_sq(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, folded in index order
    (sequential fold => bit-identical to the DuckDB twin).

    Deliberately the zip_with/aggregate HOF form: a fully-unrolled
    256-term scalar sum was tried and overflows janino's method limits —
    Spark then falls back to interpreted projection for the WHOLE stage,
    4x slower than the HOF fold."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    diffs = F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda a, x: a + x)


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Append ``cluster`` = argmin_c dist(vec, centroids[c]); ties go to
    the lower cluster id (array_position finds the FIRST min, same as
    numpy argmin).

    Each distance expression is evaluated exactly once into a k-array —
    a when/otherwise argmin chain would textually duplicate every
    (64-literal) distance subtree O(k) times, and the duplicated trees
    dominate planning/codegen time long before data cost matters."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    darr = F.array(*[_dist_sq(vec, c) for c in centroids])
    out = df.withColumn("__dists", darr)
    cluster = (
        F.expr("array_position(__dists, array_min(__dists))") - F.lit(1)
    ).cast("int")
    return out.withColumn("cluster", cluster).drop("__dists")


def _recompute(df: DataFrame, k: int, vec_col: str = "embedding") -> list[list[float]]:
    """New centroids = per-(cluster, dim) mean, rounded to 6 decimals.
    Shuffles only k x dim partial sums (posexplode feeds a partial agg);
    an empty cluster keeps no entry and is dropped (callers keep k stable
    by construction: seeds are data points, so iteration 1 is non-empty,
    and a cluster that loses all points simply vanishes like MLlib's)."""
    rows = (
        df.select("cluster", F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], {})[r["pos"]] = round(r["m"], 6)
    return [
        [vals[p] for p in sorted(vals)]
        for _, vals in sorted(by_cluster.items())
    ]


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means: deterministic seeds (vectors of the k lowest ids),
    ``n_iter`` rounds of assign + recompute.  Returns (assignments of the
    final round, final centroids).  The returned assignment DataFrame is
    the one the final centroids were computed FROM (standard Lloyd's
    output: labels lag centroids by half a step)."""
    seeds = [
        [float(v) for v in r[vec_col]]
        for r in df.orderBy(id_col).limit(k).collect()
    ]
    centroids = [[round(v, 6) for v in s] for s in seeds]
    assigned = None
    for _ in range(n_iter):
        assigned = assign_clusters(df, centroids, vec_col)
        centroids = _recompute(assigned, k, vec_col)
    return assigned, centroids
