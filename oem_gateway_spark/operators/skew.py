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

Join-side variant (not needed for the fixture sizes, shape documented for
100 TB): explode the small side with all n_salts values, salt the big side
the same way, join on (key, salt).
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
