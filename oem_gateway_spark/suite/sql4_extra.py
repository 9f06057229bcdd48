"""Round-9 operators: Spark 4 SQL surfaces the registry lacked.

- q_recursive_cte   DECLARATIVE RECURSION (WITH RECURSIVE, Spark 4's
                    UnionLoop execution): the engine-managed fixed
                    point, vs the registry's driver-looped iteration
                    family (BFS, Bellman-Ford, power iteration,
                    pointer doubling).
(A VARIANT-extraction sibling was drafted here in r9 and REMOVED
before registration settled: q_variant_shred in incremental_extra.py
already witnesses the parse_json -> variant_get typed path — the
growth gate says breadth-for-breadth does not buy a window slot.)

Reference: the gateway (SURVEY.md ~l.120) has no SQL; this is §2.6
engine-beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    case the declarative one is simpler and round-count-equal.  A
    second scale seam, found by the r9 x8 probe: Spark caps TOTAL rows
    emitted across recursion (spark.sql.cteRecursionRowLimit, default
    1M — ~ nodes x avg depth, hit at 160k nodes x depth 9), so the
    engine default raises it to 100M (session.py, runtime-asserted);
    hierarchies beyond any row limit belong on the pointer-doubling
    path.  The two queries share the forest AND the oracle, so the
    driver hash-proves the engine's recursion against DuckDB's and
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
