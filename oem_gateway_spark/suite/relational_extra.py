"""Relational completions: multiset set-ops, distribution window
functions, ordered array aggregation, and skew-safe (salted) aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.operators.skew import salted_sum
from oem_gateway_spark.suite.registry import query


@query(
    "q_setops_multiset",
    oracle="""
    SELECT 'intersect_all' AS tag, c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
    UNION ALL
    SELECT 'except_all', c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
    """,
)
def q_setops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiset semantics (occurrence
    counting), the bag-algebra twins of q_setops."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        F.col("o_custkey").alias("c_custkey")
    )
    ia = urgent.intersectAll(high).select(
        F.lit("intersect_all").alias("tag"), "c_custkey"
    )
    ea = urgent.exceptAll(high).select(F.lit("except_all").alias("tag"), "c_custkey")
    return ia.unionByName(ea)


@query(
    "q_window_distribution",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(nth_value(c_custkey, 2) OVER (PARTITION BY c_nationkey
                ORDER BY c_acctbal DESC, c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT)
             AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    nth_value over a full-partition frame."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("c_custkey", 2).over(wfull).alias("second_richest"),
    )


@query(
    "q_array_agg_ordered",
    oracle="""
    SELECT n_nationkey,
           list_sort(list(s_suppkey)) AS supp_ids,
           array_to_string(list_sort(list(s_name)), ',') AS names_csv,
           CAST(count(*) AS BIGINT) AS n
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def q_array_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation (collect_list + sort_array) and string
    aggregation — deterministic via explicit sorting (collect_list order
    is otherwise partition-dependent)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.sort_array(F.collect_list("s_suppkey")).alias("supp_ids"),
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias(
                "names_csv"
            ),
            F.count("*").alias("n"),
        )
    )


@query(
    "q_salted_agg",
    oracle="""
    SELECT l_returnflag AS key,
           round(sum(l_extendedprice), 4) AS total,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: two-phase salted sum over a 3-value key (the
    worst-case skew shape).  Results identical to a plain groupBy; the plan
    spreads each hot key over 16 salt buckets before the final combine —
    the manual fallback when AQE skew handling isn't enough (see
    operators/skew.py and SCALE.md §6)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_sum(
        li,
        key_col="l_returnflag",
        agg_cols={"l_extendedprice": "sum"},
        n_salts=16,
    )
    return out.select(
        F.col("l_returnflag").alias("key"),
        F.round(F.col("l_extendedprice_sum"), 4).alias("total"),
        F.col("n").alias("n"),
    )
