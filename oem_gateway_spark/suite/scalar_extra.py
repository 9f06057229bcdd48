"""Scalar-surface completions (SURVEY §2.6): map functions over JSON
payloads, array predicate higher-order functions, null-handling functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, MapType, StringType

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.registry import query


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           CAST(props->>'$.k' AS INTEGER) AS k_value
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: JSON payload -> map<string,int>, then
    map_keys/size/element access (the schemaless props schematized as a
    map rather than a fixed struct).  prop_keys is serialized to CSV on
    both sides: the driver's canonicalizer sorts output columns and raw
    array cells are unhashable there (VERDICT r3 #3)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", MapType(StringType(), IntegerType()))
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_value"),
    )


@query(
    "q_array_predicates",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
           list_aggregate(list_transform(embedding, x -> CASE WHEN x > 0.5 THEN 1 ELSE 0 END), 'max') = 1 AS any_big,
           list_aggregate(list_transform(embedding, x -> CASE WHEN abs(x) < 10 THEN 1 ELSE 0 END), 'min') = 1 AS all_small,
           round(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS smallest
    FROM embeddings
    """,
)
def q_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array predicate HOFs: filter / exists / forall / sort over the
    embedding vectors — per-row map work, no shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.exists(emb, lambda x: x > 0.5).alias("any_big"),
        F.forall(emb, lambda x: F.abs(x) < 10).alias("all_small"),
        F.round(F.array_min(emb).cast("double"), 6).alias("smallest"),
    )


@query(
    "q_null_funcs",
    oracle="""
    SELECT c_custkey,
           coalesce(o_cnt, 0) AS orders_or_zero,
           CASE WHEN o_cnt IS NULL THEN 'never_ordered' ELSE 'customer' END AS status,
           nullif(coalesce(o_cnt, 0), 0) AS cnt_or_null
    FROM (
      SELECT c_custkey, CAST(cnt AS BIGINT) AS o_cnt FROM customer
      LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders
                 WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) o
        ON c_custkey = o.o_custkey)
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling layer: coalesce / IS NULL branching / nullif on the
    nullable side of an outer join."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("o_cnt"))
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("o_cnt", F.lit(0)).alias("orders_or_zero"),
        F.when(F.col("o_cnt").isNull(), "never_ordered")
        .otherwise("customer")
        .alias("status"),
        F.nullif(F.coalesce("o_cnt", F.lit(0)), F.lit(0)).alias("cnt_or_null"),
    )
