"""Behavioral / graph-structure suite: triangle counting with the
degree-orientation technique, and cohort retention — two classic
analytics shapes over the testdata's co-occurrence graph and event log.

Ref: SURVEY.md §2.6 engine-beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.cooc import COOC_MEMBERS_SQL, capped_order_members
from oem_gateway_spark.suite.registry import query

# Top-K co-occurrence backbone: the raw co-occurrence graph over a
# uniform order/supplier mix densifies toward COMPLETE as orders grow
# (every supplier pair eventually co-occurs once), which makes the
# triangle count itself cubic noise.  Keeping each node's TOP_K
# strongest neighbors (by shared-order count, ties by id) yields a
# k-degenerate backbone whose density is scale-INVARIANT — the standard
# kNN-graph sparsification, and the difference between a triangle job
# that finishes and one that enumerates n^3/6 of a near-clique.
_TRI_TOP_K = 10

_TRI_EDGES_SQL = f"""
      WITH cooc AS (
        SELECT a.l_suppkey AS cu, b.l_suppkey AS cv,
               count(*) AS n_ord
        FROM ({COOC_MEMBERS_SQL}) a JOIN ({COOC_MEMBERS_SQL}) b
            ON a.l_orderkey = b.l_orderkey
        WHERE a.l_suppkey < b.l_suppkey
        GROUP BY 1, 2
      ), dir AS (
        SELECT cu AS a, cv AS b, n_ord FROM cooc
        UNION ALL SELECT cv, cu, n_ord FROM cooc
      ), ranked AS (
        SELECT a, b, row_number() OVER (PARTITION BY a
                     ORDER BY n_ord DESC, b) AS rk
        FROM dir
      )
      SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
      FROM ranked WHERE rk <= {_TRI_TOP_K}
"""


@query(
    "d_triangles",
    oracle=f"""
    WITH und AS ({_TRI_EDGES_SQL}),
    deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS id FROM und UNION ALL SELECT v FROM und
      ) GROUP BY 1
    ),
    oriented AS (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS dst
      FROM und e JOIN deg du ON e.u = du.id JOIN deg dv ON e.v = dv.id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM oriented e1
      JOIN oriented e2 ON e1.dst = e2.src
      JOIN oriented e3 ON e1.src = e3.src AND e2.dst = e3.dst
    """,
)
def d_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the supplier co-occurrence graph via DEGREE
    ORIENTATION: every undirected edge points from its lower-degree
    endpoint to the higher (ties by id), turning the graph into a DAG
    where each triangle appears exactly once as a directed wedge plus a
    closing edge.  This is THE scale technique for triangle counting —
    a naive undirected 3-way self-join enumerates each triangle 6x and,
    worse, builds wedges at hub vertices (quadratic in the max degree);
    orientation caps every vertex's out-degree at O(sqrt(|E|)) so the
    wedge intermediate stays near-linear on skewed graphs.

    Plan: the co-occurrence counts build from ONE self-join on orderkey;
    the top-K backbone (k-degenerate by construction — see _TRI_TOP_K
    note) is a per-node row_number window; degrees are one aggregate on
    the vertex ids; the wedge join and the closing-edge semi join key on
    vertex ids (shuffle-partitioned, AQE splits any residual hub); the
    output is a single count."""
    from pyspark.sql.window import Window

    # (order, supplier) dedup AND per-order fanout cap BEFORE the
    # self-join (suite/cooc.py): an order's several lines from one
    # supplier would otherwise multiply the pair rows quadratically,
    # and a hub order would emit |group|^2 pairs even after dedup.
    # After the capped dedup the per-pair count is a plain count(*),
    # no count-distinct expand.
    li = capped_order_members(spark, sf_dir)
    a, b = li.alias("a"), li.alias("b")
    cooc = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("cu"), F.col("b.l_suppkey").alias("cv")
        )
        .agg(F.count("*").alias("n_ord"))
    )
    direct = cooc.select(
        F.col("cu").alias("na"), F.col("cv").alias("nb"), "n_ord"
    ).unionAll(
        cooc.select(
            F.col("cv").alias("na"), F.col("cu").alias("nb"), "n_ord"
        )
    )
    w_rank = Window.partitionBy("na").orderBy(F.desc("n_ord"), F.asc("nb"))
    # und feeds deg (twice, via the degree union) and the orientation
    # join; oriented feeds the wedge join THREE times (e1/e2/e3).
    # Without persists Catalyst inlines the whole subtree at every
    # reference (~137 Exchange nodes in the formatted plan); with them
    # the backbone materializes once and the wedge join reads cache.
    und = (
        direct.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= _TRI_TOP_K)
        .select(
            F.least("na", "nb").alias("u"), F.greatest("na", "nb").alias("v")
        )
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("id").alias("u_id"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v_id"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, F.col("u") == F.col("u_id"))
        .join(dv, F.col("v") == F.col("v_id"))
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .persist()
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.alias("e3")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
    tri = wedges.join(
        e3,
        (F.col("e1.src") == F.col("e3.src"))
        & (F.col("e2.dst") == F.col("e3.dst")),
        "left_semi",
    )
    from oem_gateway_spark.operators.dedup import _own_cache

    out = tri.agg(F.count("*").alias("n_triangles"))
    return _own_cache(out, und, oriented)


@query(
    "q_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS TIMESTAMP)
             AS cohort_day
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day,
                      CAST(date_trunc('day', e.ts) AS TIMESTAMP))
               AS day_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    ), cohort_size AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_users
      FROM first_seen GROUP BY 1
    )
    SELECT a.cohort_day, CAST(a.day_offset AS INT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active,
           s.n_users,
           round(count(*) / CAST(s.n_users AS DOUBLE), 6) AS retention
    FROM activity a JOIN cohort_size s ON a.cohort_day = s.cohort_day
    WHERE a.day_offset <= 7
    GROUP BY a.cohort_day, a.day_offset, s.n_users
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, and for each
    cohort the fraction still active on each of the following 7 days —
    the canonical product-analytics matrix (rows = cohorts, columns =
    day offsets).

    Plan: first-seen is one user_id aggregate; activity dedups to
    (user, day) BEFORE counting (array-distinct-style semantics via
    DISTINCT — a user active 50x in a day counts once); the cohort
    size re-aggregates the tiny first-seen result and broadcasts back.
    Two fact-sized shuffles total (first-seen, activity distinct) —
    both keyed on user_id so AQE reuses the exchange.  The 7-day cap
    keeps the output |cohorts| x 8."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    cohort_size = first_seen.groupBy("cohort_day").agg(
        F.count("*").alias("n_users")
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .join(F.broadcast(cohort_size), "cohort_day")
        .groupBy("cohort_day", "day_offset", "n_users")
        .agg(F.count("*").alias("n_active"))
        .select(
            "cohort_day",
            F.col("day_offset").cast("int").alias("day_offset"),
            "n_active",
            "n_users",
            F.round(
                F.col("n_active") / F.col("n_users").cast("double"), 6
            ).alias("retention"),
        )
    )
