"""Skew mitigation: salted two-phase aggregation (and the broadcast-side
salting pattern for joins, documented below).

When a groupBy key is pathologically hot (a handful of values carrying most
rows — boilerplate documents, a default node id), a plain hash aggregation
sends each hot key's entire volume to one reducer.  AQE's skew handling
covers sort-merge JOIN skew but not aggregation skew; the classic fix is
salting:

  phase 1: group by (key, salt = pmod(rand-ish, n_salts)) — partial
           aggregates spread over n_salts reducers per key;
  phase 2: group by key — combine the n_salts partials.

For SUM/COUNT (commutative, associative) the result is exactly the plain
aggregation.  The salt here is deterministic (hash of a unique row id) so
results are reproducible and oracle-checkable.

Join-side variant (:func:`salted_join`): explode the smaller side with all
n_salts values, salt the bigger side by row-hash, join on (key, salt) — each
hot key's rows spread over n_salts reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_sum(
    df: DataFrame,
    key_col: str,
    agg_cols: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``agg_cols`` maps column -> one of 'sum'|'min'|'max' (decomposable
    aggregates).  Output columns: key, ``{col}_{agg}`` per entry, and ``n``
    (row count).  Exactly equal to the unsalted groupBy.
    """
    for agg in agg_cols.values():
        if agg not in _AGGS:
            raise ValueError(f"unsupported salted aggregate {agg!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key_col, "__salt")
        .agg(
            F.count("*").alias("__n"),
            *[
                _AGGS[agg](c).alias(f"__{c}_{agg}")
                for c, agg in agg_cols.items()
            ],
        )
    )
    recombine = {"sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(key_col).agg(
        F.sum("__n").alias("n"),
        *[
            recombine[agg](f"__{c}_{agg}").alias(f"{c}_{agg}")
            for c, agg in agg_cols.items()
        ],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate ``small`` across all n_salts salt
    values, salt ``big`` by a deterministic row hash, join on
    ``(on, __salt)``.  Result row set is exactly ``big.join(small, on,
    how)`` — each (big-row, small-row) key match meets in exactly one salt
    bucket — but a hot key's rows land on n_salts reducers instead of one.

    For when NEITHER broadcast nor AQE skew-split applies: the small side
    exceeds the broadcast threshold but replicating it n_salts times is
    still cheap relative to one reducer absorbing a hot key (e.g. a
    several-GB URL-dimension against a crawl keyed 30% on one domain).
    ``how`` supports 'inner' and 'left' (big side preserved: every big row
    keeps its salt, so left rows without a match survive exactly once).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt.cast("int"))
    small_s = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    )
    return big_s.join(small_s, on=[on, "__salt"], how=how).drop("__salt")
