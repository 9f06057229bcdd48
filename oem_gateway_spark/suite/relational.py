"""Relational suite (SURVEY §2.6 / M3): the engine surface the reference
lacks entirely — joins (equi/semi/anti/range/as-of), aggregations
(hash/distinct/rollup/cube/grouping sets), window functions, sorts/top-k,
set ops, scalar function coverage (string/date/math/JSON), sessionization.

All queries are pure DataFrame-API (one uses spark.sql for GROUPING SETS)
with DuckDB oracle twins.  Determinism rules:
  - every float aggregate rounded identically on both sides;
  - every top-k / window ordering carries a unique tiebreaker key;
  - DuckDB count/sum-of-int/rank outputs cast to match Spark types.

Scale notes are per-query docstrings; the common themes: dimension joins
broadcast (region/nation/customer at 100 TB are still tiny vs lineitem),
fact-fact joins shuffle on their equi keys with AQE skew handling, window
functions partition on high-cardinality keys (no global windows except the
bounded top-k whose input is pre-aggregated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- aggregation

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate. Filter + partial agg push to
    the scan side (map-side combine); only |flag x status| groups shuffle —
    the canonical 100 TB-safe aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc), 4).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> broadcast join -> agg ->
    top-k.  customer(filtered) broadcasts; lineitem never moves except the
    final tiny top-k (orderkey tiebreak keeps LIMIT deterministic)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. All dims broadcast (region/nation/
    supplier/customer are orders-of-magnitude smaller than the fact);
    the only shuffle is lineitem x orders on orderkey + the final group."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.049 AND l_discount <= 0.071
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure filter-aggregate — every predicate
    (date range, discount band, quantity cap) is scan-pushable, so the
    whole query is one parquet scan with PushedFilters + a single partial
    aggregate; zero shuffle beyond the one-row final combine.  The
    discount band uses 0.049/0.071 bounds (not 0.05/0.07 equality edges)
    so double-representation noise can't flip a boundary row between
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.049)
            & (F.col("l_discount") <= 0.071)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 30
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.  Catalyst's
    CNF conversion extracts the single-side residues — part gets
    ``brand IN (...) AND size <= 30`` pushed into its (broadcast) scan,
    lineitem gets ``quantity BETWEEN 1 AND 30`` pushed into the fact scan
    — so the disjunction only runs as a post-join residual on the rows
    that survive both pushed prunes.  The classic test that an optimizer
    doesn't ship the whole fact table through a join because the
    predicate mentions both sides."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: which customers returned the most value.  The
    returnflag filter pushes into the fact scan; customer and nation
    broadcast; the one fact shuffle is lineitem x orders on orderkey; the
    final top-20 is TakeOrdered (revenue desc, custkey tiebreak), never a
    global sort."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-ratio aggregate — the share of one
    month's revenue carried by PROMO parts.  The date range prunes the
    fact scan; part broadcasts; numerator and denominator compute in ONE
    aggregation pass (a conditional sum, not two scans)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc), 6).alias("promo_pct"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 4) AS totalprice,
           round(sum(l_quantity), 4) AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250)
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose line quantities exceed a threshold —
    an IN over a grouped-HAVING subquery.  Planned as aggregate-then-
    semi-join: the heavy per-orderkey aggregation runs ONCE, its
    survivors semi-join back to the fact on the same key (co-partitioned:
    no extra fact shuffle), customer broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big, on="l_orderkey", how="left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            "total_qty",
        )
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_custs,
           round(sum(c_acctbal), 4) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with NO orders —
    a scalar subquery (global average) combined with an anti-join, per
    market segment.  The scalar average computes once (tiny aggregate,
    broadcast into the filter); the NOT EXISTS plans as a left-anti join
    on custkey.  At 100 TB the anti probe shuffles on the join key like
    any equi-join — no per-row subquery execution."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(
        o.select("o_custkey"), rich.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_custs"),
        F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
    )


@query(
    "q_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi distinct-aggregate: Spark plans an expand + two-phase agg;
    at 100 TB prefer approx_count_distinct (q_approx_distinct) when 2%
    error is acceptable — the exact form shuffles the full key set."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
           TRUE AS parts_ok, TRUE AS supps_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=0.01): the 100 TB scale
    path for distinct counting — fixed-size sketch, single shuffle of
    sketches not keys.

    Oracle strategy (VERDICT r3 #6): the sketch value itself is engine-
    dependent, so the query emits the EXACT count plus a deterministic
    within-5%-of-exact boolean for the sketch; the oracle emits the exact
    count and literal TRUE.  Hash-green iff HLL++ holds its error bound
    (rsd=0.01 << 0.05, also pinned by test_sketch_error_bounds).

    Plan (r13 optimization): the exact distincts and the sketches run
    as SEPARATE aggregations joined on the 3-row group key.  Mixed into
    one agg, Spark's multi-distinct rewrite expands the fact 3x and
    carries the non-distinct HLL aggregates through the per-(flag, key)
    partial phase — an ~16 KB rsd=0.01 sketch buffer PER DISTINCT KEY
    (measured 9.6 s isolated at sf0.1, the slowest batch query in the
    registry); split, the sketch branch is a plain per-flag hash agg
    with 6 buffers total and the exact branch is the ordinary expand
    (1.3 s, same shape as q_distinct_agg).  Same single fact source,
    columnar scan bytes unchanged."""
    li = _t(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_suppkey").alias("exact_supps"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("ap"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("asu"),
    )
    agg = exact.join(approx, "l_returnflag")
    ok = lambda a, e: (F.abs(F.col(a) - F.col(e)) / F.col(e) < 0.05)  # noqa: E731
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        ok("ap", "exact_parts").alias("parts_ok"),
        ok("asu", "exact_supps").alias("supps_ok"),
    )


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           round(sum(l_extendedprice), 4) AS sum_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id: subtotal lattice computed in one pass
    (Expand operator) — no per-level rescans at scale."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.count("*").alias("n"),
    )


@query(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims: full subtotal lattice, single Expand pass."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT event_type, CAST(user_id % 5 AS BIGINT) AS user_bucket,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 5), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL front end — the engine exposes the full
    Spark SQL dialect alongside the DataFrame API)."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type, CAST(user_id % 5 AS BIGINT) AS user_bucket,
               count(*) AS n, round(sum(value), 4) AS total
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id % 5), ())
        """
    )


# --------------------------------------------------------------------- joins

@query(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: existence probe, no row multiplication, builds a
    hash set of the (filtered, broadcastable) right side."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no urgent orders (NOT IN, non-null
    keys; the filter keeps the result non-empty at every scale factor)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_outer_join_coalesce",
    oracle="""
    SELECT c_custkey,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 4) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_outer_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + null-aware aggregation (count skips nulls; sum
    coalesced)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 4).alias("total_spend"),
        )
    )


@query(
    "q_range_join",
    oracle="""
    SELECT CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS order_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice), 4) AS volume
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range-predicate join: ships within 60 days of order.  The
    equi key carries the shuffle; the range predicate evaluates post-probe
    (no cross product).  Pure range joins (no equi key) should add bucketed
    interval keys at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate <= F.date_add(o.o_orderdate, 60)),
        )
        .groupBy(F.date_trunc("year", "o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 4).alias("volume"),
        )
    )


@query(
    "q_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_ms(p.ts) AS purchase_ms,
           c.event_id AS last_click_id,
           epoch_ms(c.ts) AS click_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (operator Spark lacks natively): for each purchase, the
    latest click at-or-before it per user.  LINEAR plan: union-tag both
    streams, one shuffle on user_id, one partition-local sort, then a
    last-non-null carry-forward window — never materializes the
    (purchase x earlier-click) pair set, so a power user with K clicks and
    M purchases costs K+M rows, not K*M (the r1 plan's blowup).  At 100 TB
    the window partitions by (user, time-bucket) with a per-bucket
    last-click pre-aggregate carried into the next bucket to bound sort
    state.  DuckDB oracle uses its native ASOF LEFT JOIN.

    Ties: at equal ts, clicks order before purchases (ASOF's ``<=`` bound
    includes the same-instant click); among equal-ts clicks the max
    event_id wins, matching the r1 top-1 tie-break.
    """
    ev = _t(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "click").alias("is_click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("is_click"), F.col("event_id"))
    click_ts = F.when(F.col("is_click"), F.col("ts"))
    carried = tagged.select(
        "*",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
    )
    return carried.filter(~F.col("is_click")).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        "last_click_id",
        F.unix_millis("last_click_ts").alias("click_ms"),
    )


@query(
    "q_cross_join_pairs",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
)
def q_cross_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (bounded: dims only — never cross-join facts)."""
    r1 = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return r1.crossJoin(r2).filter(F.col("k1") < F.col("k2")).select("from_region", "to_region")


# ------------------------------------------------------------------- windows

@query(
    "q_window_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INT) AS rn FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part)
    WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window — the scalable 'LIMIT per key'
    (single shuffle on the partition key; no global sort)."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per customer with an explicit ROWS frame.
    Frame order carries o_orderkey tiebreak so the running values are
    deterministic under equal dates."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_spend"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS ms_since_prev,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics per user ordered by event time (ms deltas are
    exact integer arithmetic — no float drift between engines)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    return ev.select(
        "user_id",
        "event_id",
        (ms - F.lag(ms).over(w)).alias("ms_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "q_window_rank_ntile",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(rank()       OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4)     OVER w AS INT) AS quartile,
           round(first_value(c_acctbal) OVER w, 4) AS top_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family (rank/dense_rank/ntile/first_value) in one window."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.first("c_acctbal").over(w), 4).alias("top_bal"),
    )


@query(
    "q_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap) via gaps-and-islands:
    lag -> new-session flag -> cumulative sum -> per-session agg.  The
    batch twin of streaming session_window (suite/streaming_batch.py);
    one shuffle on user_id, state bounded per user."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    new_s = F.when(
        (ms - F.lag(ms).over(w) > 1800000) | F.lag(ms).over(w).isNull(), 1
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("new_session", new_s)
        .withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("duration_ms"),
        )
    )


# -------------------------------------------------------------- sort / top-k

@query(
    "q_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge of k rows, never a full sort at scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q_setops",
    oracle="""
    SELECT 'both' AS tag, c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
    UNION ALL
    SELECT 'urgent_only', c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct set semantics) tagged and unioned."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = urgent.intersect(high).select(F.lit("both").alias("tag"), "c_custkey")
    only = urgent.subtract(high).select(F.lit("urgent_only").alias("tag"), "c_custkey")
    return both.unionByName(only)


@query(
    "q_dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup on (user, type): the well-defined
    version of dropDuplicates (which keeps an arbitrary row) — window
    top-1 by event time.  Same shape as streaming dropDuplicates state."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# ------------------------------------------------------------ scalar surface

@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           CAST(length(p_name) AS INT) AS name_len,
           substr(p_type, 1, 5) AS type5,
           regexp_extract(p_type, '([a-z]+)', 1) AS first_word,
           replace(p_brand, '#', '-') AS brand_dash,
           CAST(levenshtein(p_brand, 'Brand#33') AS INT) AS lev,
           concat_ws('|', p_brand, p_type) AS joined,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function layer: case, length, substr, regex extract, replace,
    edit distance, concat, padding — all JVM-side codegen expressions."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.regexp_extract("p_type", "([a-z]+)", 1).alias("first_word"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dash"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#33")).alias("lev"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS INT) AS yr,
           CAST(extract(month FROM o_orderdate) AS INT) AS mo,
           CAST(extract(day FROM o_orderdate) AS INT) AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT) AS days_to_y2k,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time layer: extract, trunc, interval arithmetic, diffs."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000), 4) AS abs_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(pow(1 + l_discount, 2), 6) AS disc_sq,
           CAST(l_partkey % 97 AS BIGINT) AS pk_mod,
           round(greatest(l_discount, l_tax), 4) AS max_rate,
           round(least(l_discount, l_tax), 4) AS min_rate
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math layer: abs/ceil/floor/sqrt/ln/pow/mod/greatest/least (rounded
    so libm last-bit differences between engines cannot surface)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 4).alias("abs_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_discount"), 2), 6).alias("disc_sq"),
        (F.col("l_partkey") % 97).alias("pk_mod"),
        F.round(F.greatest("l_discount", "l_tax"), 4).alias("max_rate"),
        F.round(F.least("l_discount", "l_tax"), 4).alias("min_rate"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT CAST(CAST(props->>'$.k' AS INTEGER) // 10 AS INT) AS k_decade,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 4) AS avg_value,
           CAST(min(CAST(props->>'$.k' AS INTEGER)) AS INT) AS k_min,
           CAST(max(CAST(props->>'$.k' AS INTEGER)) AS INT) AS k_max
    FROM events GROUP BY 1
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (get_json_object) + aggregation —
    the reference's schemaless payloads, schematized on read."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy(F.floor(F.col("k") / 10).cast("int").alias("k_decade"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "q_pivot_conditional",
    oracle="""
    SELECT CAST(user_id % 5 AS BIGINT) AS user_bucket,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS clicks,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS views,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS errors,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signups
    FROM events GROUP BY 1
    """,
)
def q_pivot_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (the scale-safe pivot: fixed
    output columns, single pass, no per-value scans)."""
    ev = _t(spark, sf_dir, "events")

    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1))

    return ev.groupBy((F.col("user_id") % 5).alias("user_bucket")).agg(
        cnt("click").alias("clicks"),
        cnt("view").alias("views"),
        cnt("purchase").alias("purchases"),
        cnt("error").alias("errors"),
        cnt("signup").alias("signups"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
      FROM lineitem WHERE l_orderkey % 100 = 0
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      FROM lineitem WHERE l_orderkey % 100 = 0
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      FROM lineitem WHERE l_orderkey % 100 = 0)
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide measure columns to (metric, val) rows — the
    inverse of q_pivot_conditional, via the native ``unpivot`` operator
    (one Generate pass over the scan, row count x n_measures, no join or
    shuffle; the oracle spells it as UNION ALL, the relational identity)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )


@query(
    "q_stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar,
           round(median(l_extendedprice), 4) AS med_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar/median/exact
    percentile.  At 100 TB swap percentile for approx_percentile (t-digest
    sketch) — exact percentile materializes per-group sorted arrays."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar"),
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("med_price"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS vec_sum,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sq_norm,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) AS vec_max
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over embedding vectors: transform +
    aggregate (fold) + max — all JVM-side, no UDF, the building blocks of
    the similarity operators."""
    e = _t(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    zero = F.lit(0.0)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.aggregate(dbl, zero, lambda a, x: a + x), 4).alias("vec_sum"),
        F.round(F.aggregate(dbl, zero, lambda a, x: a + x * x), 4).alias("sq_norm"),
        F.round(F.array_max(dbl), 4).alias("vec_max"),
    )
