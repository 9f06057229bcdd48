"""Reusable relational composites: operators Spark lacks as single calls,
expressed as DataFrame compositions so Catalyst plans them (the suite
queries in suite/relational.py inline the same shapes with oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """AS-OF join: for each left row, the single right row with the
    latest ``right_ts`` <= ``left_ts`` (backward) or earliest >= (forward)
    per key.  Implemented as equi-join + window top-1: one shuffle on the
    key, partition-local sort; bucket by (key, time-bucket) at scale.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    r = right.select(
        F.col(key).alias(f"__rk"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
    cond = (F.col(key) == F.col("__rk")) & (
        (F.col(f"{right_ts}{suffix}") <= F.col(left_ts))
        if direction == "backward"
        else (F.col(f"{right_ts}{suffix}") >= F.col(left_ts))
    )
    joined = left.withColumn("__lid", F.monotonically_increasing_id()).join(
        r, cond, "left"
    )
    order = (
        F.desc_nulls_last(f"{right_ts}{suffix}")
        if direction == "backward"
        else F.asc_nulls_last(f"{right_ts}{suffix}")
    )
    w = Window.partitionBy("__lid").orderBy(order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__rk", "__lid")
    )


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via row_number (single shuffle, no global
    sort).  Pass a unique tiebreaker in ``order_cols`` for determinism."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_key: tuple[str, str],
    range_cond: Column,
) -> DataFrame:
    """Equi + range join: the equi key carries the shuffle, the range
    predicate evaluates post-probe (never a cross product)."""
    lk, rk = equi_key
    return left.join(right, (F.col(lk) == F.col(rk)) & range_cond)
