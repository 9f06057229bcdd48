"""TPC-H composite shapes II: the hard subquery/join patterns (Q4, Q7,
Q8, Q12, Q13, Q17, Q21) adapted to the testdata's columns (no partsupp /
shipmode / commitdate in this generation — each query keeps the
ORIGINAL's machinery and swaps only the filter columns; the partsupp
family Q2/Q9/Q11/Q16/Q20 has no table to run against).

Why these seven: together they cover the remaining classic OLAP plan
shapes the suite didn't yet witness — aggregated EXISTS (Q4), two-alias
dimension join with a disjunctive pair predicate (Q7), a
conditional-share ratio over a seven-table join (Q8), a non-equi
residual on top of an equi join (Q12), a predicate ON the outer-join
condition feeding stacked aggregates (Q13), correlated-aggregate
decorrelation (Q17), and double-correlated EXISTS / NOT EXISTS (Q21).

Scale notes are per-query; the common rules: dimension sides are
nation-filtered FIRST (so the broadcast is the filtered dim, ~1/25 of
rows), the fact table shuffles at most once per distinct join key, and
every selective predicate sits against the scan (pushdown-eligible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q7_nation_trade_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year — the two-alias dimension join (nation joins twice, through
    supplier and through customer) with a DISJUNCTIVE pair predicate.

    Plan: both dimension chains are nation-pre-filtered (only the two
    nations survive before broadcasting — the disjunction collapses to
    an IN on each side at the scan, with the pair constraint as a
    broadcast-join residual), so the fact side shuffles exactly once
    (lineitem x orders on orderkey); the date range prunes the lineitem
    scan.  Ref: the reference has no relational engine — this is §2.6
    engine surface (SURVEY.md)."""
    pair = ("NATION_1", "NATION_2")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "q8_market_share",
    oracle="""
    WITH all_sales AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
        JOIN part      ON l_partkey = p_partkey
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region    ON cn.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of ECONOMY-part revenue sold to
    ASIA customers, by order year — a conditional-share ratio over a
    seven-table join.

    Plan: every dimension chain reduces before broadcast (part filtered
    to one type, customer semi-reduced through nation x region to one
    region); numerator and denominator come out of ONE aggregation pass
    (conditional sum), so the fact scans once and shuffles once
    (lineitem x orders).  The supplier-nation flag needed for the
    numerator rides the broadcast supplier dim."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0.0)
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(nation_vol) / F.sum(volume), 6).alias("mkt_share"))
    )


@query(
    "q12_late_shipments",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments (shipped >60 days after the order
    date) split into high/low order-priority counts per ship year — an
    equi join carrying a NON-EQUI residual predicate that compares
    columns from BOTH sides (so it cannot push to either scan; it
    evaluates as a join filter after the match).

    Plan: one fact-fact shuffle on orderkey; the residual filters
    join output before the (tiny, per-year) aggregation; high/low split
    is a conditional sum in one pass."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        j.groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2' AND p_size <= 10
      AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-half-average-quantity orders
    of one brand's small parts — the correlated AVG subquery, written
    decorrelated: the per-part average computes ONCE as a grouped
    aggregate and joins back, never once-per-outer-row.

    Plan: the part filter reduces first and broadcasts; the per-part
    average only aggregates lineitems of surviving parts (the semi
    reduction happens BEFORE the heavy aggregate, which a naive
    translate misses); both the aggregate and the final probe are
    partitioned on partkey, so AQE can co-schedule them with one fact
    shuffle.  Per-part averages over the filtered fact equal the
    full-table correlated averages because AVG only sees that part's
    rows either way."""
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    part_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    small = li.join(part_avg, on="l_partkey").filter(
        F.col("l_quantity") < F.col("half_avg")
    )
    return small.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
        F.count("*").alias("n"),
    )


@query(
    "q21_sole_blame_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN nation      ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers from one nation solely to blame for a
    returned item on a multi-supplier order — the double-correlated
    EXISTS + NOT EXISTS, planned as a left-semi join followed by a
    left-anti join (each correlated predicate becomes ONE distributed
    join on orderkey with the supplier-inequality as residual; no
    per-row subquery execution anywhere).

    Plan: three passes over lineitem, all partitioned on orderkey (the
    semi and anti probes reuse the fact's shuffle partitioning under
    AQE); supplier and nation broadcast; the top-20 is TakeOrdered."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    li = _t(spark, sf_dir, "lineitem")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("sk3")
    )
    kept = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("sk2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("sk3")),
        "left_anti",
    )
    return (
        kept.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having at least one flagged
    line, counted by priority — EXISTS over the fact planned as ONE
    left-semi join (the correlated subquery never executes per row).

    Plan: both date predicates push into the orders scan; the lineitem
    probe side filters to flagged rows before the semi join; the final
    aggregate is five groups."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    flagged = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(flagged, o.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey,
             CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts
    (how many customers placed 0, 1, 2... qualifying orders) — a LEFT
    OUTER join with a predicate on the JOIN CONDITION (not a WHERE —
    rows must survive with count 0), then two stacked aggregations.

    Plan: the filtered orders side shuffles on custkey against the
    customer side once; count(o_orderkey) ignores the null-extended
    rows, so zero-order customers land in the c_count=0 bucket; the
    second aggregate is tiny (distinct counts).  This join is the
    textbook skew case at scale — one mega-customer inflates a single
    custkey — handled by AQE skew splitting since the first aggregate
    keys on the SAME custkey the join shuffled on."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    j = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
        "left_outer",
    )
    per_cust = j.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))
