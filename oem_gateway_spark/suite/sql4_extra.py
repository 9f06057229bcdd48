"""Round-9 operators: Spark 4 SQL surfaces the registry lacked.

- q_recursive_cte   DECLARATIVE RECURSION (WITH RECURSIVE, Spark 4's
                    UnionLoop execution): the engine-managed fixed
                    point, vs the registry's driver-looped iteration
                    family (BFS, Bellman-Ford, power iteration,
                    pointer doubling).
- q_variant_extract the VARIANT semi-structured type: parse_json ->
                    binary variant -> typed-path extraction — the
                    Spark 4 answer to JSON columns at scale, vs
                    q_json_funcs' string-level get_json_object.

Reference: the gateway (SURVEY.md ~l.120) has no SQL; both are §2.6
engine-beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.registry import query


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE r(node, cur, depth) AS (
      SELECT p_partkey, p_partkey, 0 FROM part
      UNION ALL
      SELECT node, (cur - 4) // 4, depth + 1 FROM r WHERE cur >= 4
    )
    SELECT node, CAST(cur AS BIGINT) AS root, CAST(depth AS BIGINT) AS depth
    FROM r WHERE cur < 4
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q_hierarchy_resolve forest flattened DECLARATIVELY: Spark 4's
    WITH RECURSIVE walks parent(k) = (k-4) DIV 4 to the roots (keys
    0..3) inside ONE SQL statement — the engine manages the fixed
    point (UnionLoop in the physical plan), no driver loop, no manual
    checkpointing, no convergence scalar.

    New engine surface: RECURSIVE QUERY EXECUTION.  Every other
    iterative operator in the registry drives its own loop
    (q_reachability's BFS frontier, q_shortest_path_bounded's
    relaxation, d_pagerank's power iteration, q_hierarchy_resolve's
    pointer doubling) because those need per-round control — frontier
    anti-joins, convergence tests, accumulator splits.  Recursion the
    engine can manage (pure monotone UNION ALL expansion) belongs in
    the declarative form: the optimizer sees the whole loop body, and
    the anchor/step are ordinary plans.  Scale tradeoff, documented
    deliberately: UnionLoop advances ONE parent hop per round (a
    depth-d forest costs d rounds) where q_hierarchy_resolve's
    pointer doubling costs ceil(log2 d) — for deep hierarchies the
    manual scheme wins asymptotically, for the shallow-forest common
    case the declarative one is simpler and round-count-equal.  The
    two queries share the forest AND the oracle, so the driver
    hash-proves the engine's recursion against DuckDB's and
    tests/test_round9_ops.py pins row-set equality between the two
    executions.  Pure integer arithmetic."""
    load_table(spark, sf_dir, "part").select("p_partkey").createOrReplaceTempView(
        "part_rcte_src"
    )
    return spark.sql(
        """
        WITH RECURSIVE r(node, cur, depth) AS (
          SELECT p_partkey, p_partkey, 0 FROM part_rcte_src
          UNION ALL
          SELECT node, (cur - 4) DIV 4, depth + 1 FROM r WHERE cur >= 4
        )
        SELECT node, CAST(cur AS BIGINT) AS root,
               CAST(depth AS BIGINT) AS depth
        FROM r WHERE cur < 4
        """
    )


@query(
    "q_variant_extract",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(count(*) AS BIGINT) AS n_missing_path
    FROM orders GROUP BY 1
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured round trip through the VARIANT type: each order
    is serialized to a nested JSON document, parsed to a binary
    variant (parse_json), and read back with TYPED path extraction
    (variant_get '$.ord.cents' -> bigint, '$.ord.status' -> string,
    '$.cust' -> bigint); the aggregate over the extracted values must
    hash-equal DuckDB computing the same aggregate from the base
    columns — any loss, coercion, or mis-pathing in the
    parse->shred->get chain breaks the value hash.

    New engine surface: the Spark 4 VARIANT type.  q_json_funcs
    witnesses STRING-level JSON functions (get_json_object/from_json);
    VARIANT is the binary encoding those functions feed at scale —
    parse once, store shredded, extract typed paths without re-parsing
    text per access, the 100 TB semi-structured-ingestion layout
    (events/logs land as JSON, queries touch two fields).  The absent
    path '$.nope' must return NULL (counted per group and compared to
    the row count — the missing-path semantics witnessed, not
    assumed).  Money is integer cents BEFORE serialization, so the
    round trip is exact on both engines."""
    o = load_table(spark, sf_dir, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.struct(
                F.floor(F.col("o_totalprice") * 100 + 0.5)
                .cast("long")
                .alias("cents"),
                F.col("o_orderstatus").alias("status"),
            ).alias("ord"),
        )
    )
    parsed = o.select(F.parse_json(doc).alias("v"))
    fields = parsed.select(
        F.expr("variant_get(v, '$.ord.status', 'string')").alias("status"),
        F.expr("variant_get(v, '$.cust', 'bigint')").alias("cust"),
        F.expr("variant_get(v, '$.ord.cents', 'bigint')").alias("cents"),
        F.expr("variant_get(v, '$.nope', 'bigint')").alias("missing"),
    )
    return fields.groupBy("status").agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").alias("sum_cents"),
        F.countDistinct("cust").alias("n_cust"),
        F.count(F.when(F.col("missing").isNull(), 1)).alias("n_missing_path"),
    )
