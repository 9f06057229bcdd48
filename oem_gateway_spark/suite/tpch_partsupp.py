"""TPC-H composite shapes III: the partsupp-family queries (Q2, Q9, Q11,
Q15, Q16, Q20) adapted to this testdata generation, which ships NO
partsupp table.  Each query keeps the ORIGINAL's plan machinery — the
part the engine must prove it can execute at scale — and substitutes the
partsupp-derived quantity with one computable from the tables we have:

- supply cost     -> 0.6 * p_retailprice          (Q9 profit expression)
- min supply cost -> min unit price actually paid  (Q2 correlated min)
- stock value     -> lineitem revenue per part     (Q11 group-vs-global)
- avail quantity  -> share of a part's yearly flow (Q20 nested IN)
- supplier lists  -> suppliers observed shipping   (Q16 distinct count)
- revenue view    -> unchanged (Q15 needs no partsupp at all)

Numeric-stability rule for the equality-on-aggregate shapes (Q15's
``= max(...)``, Q2's ``= min(...)``, Q11's ``> global_sum * f``):
money is computed in EXACT INTEGER CENTS (``CAST(round(x*100) AS
BIGINT)``) before aggregation, so sums are order-independent integers
and the Spark/DuckDB comparison can never diverge on a float ulp.  The
inputs are near-integers after *100 (prices have 2 decimals), so the
round-to-integer is unambiguous — no .5-boundary ambiguity exists (a
cents ratio can only be exactly x.5 when the denominator is a power of
two, which both engines round identically, away from zero).

Ref: the reference gateway (SURVEY.md §2.6) has no relational surface —
this whole family is engine-beyond-reference coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev_cents2() -> F.Column:
    """l_extendedprice * (1 - l_discount) as an exact integer in units of
    1e-4 currency (cents x discount-percent): price-cents (int) times
    (100 - discount-percent) (int)."""
    price_cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    keep_pct = F.round((1 - F.col("l_discount")) * 100).cast("long")
    return price_cents * keep_pct


_REV_CENTS2_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * CAST(round((1 - l_discount) * 100) AS BIGINT)"
)


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey, sum({_REV_CENTS2_SQL}) AS rev_units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           round(rev_units / 10000.0, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE rev_units = (SELECT max(rev_units) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum quarterly revenue
    — the CREATE VIEW + scalar-max equality pattern.  The revenue "view"
    computes once; the scalar max comes back as a 1-row broadcast joined
    against the view (never a window over an unpartitioned sort — the
    view has |suppliers| rows, millions at scale).

    Plan: date filter pushes to the lineitem scan; one shuffle on
    suppkey; the max is a partial+final scalar agg; supplier dim
    broadcasts.  Revenue is summed in exact integer units so the
    equality predicate is float-safe (module docstring)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    from oem_gateway_spark.operators.dedup import _own_cache

    # rev feeds the scalar max AND the equality join: persist the (tiny,
    # per-supplier) relation so the date-filtered fact scans once.
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev_cents2()).alias("rev_units"))
        .persist()
    )
    mx = rev.agg(F.max("rev_units").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    out = (
        rev.join(F.broadcast(mx), rev.rev_units == mx.mx)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_units") / 10000.0, 2).alias("total_revenue"),
        )
    )
    return _own_cache(out, rev)


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, s_name, s_acctbal, n_name,
             min(CAST(round(l_extendedprice * 100 / l_quantity) AS BIGINT))
               AS unit_cents
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1, 2, 3, 4, 5
    ), best AS (
      SELECT l_partkey, min(unit_cents) AS best_cents FROM cost GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           round(unit_cents / 100.0, 2) AS min_cost
    FROM cost
      JOIN best USING (l_partkey)
      JOIN part ON p_partkey = l_partkey
    WHERE unit_cents = best_cents
      AND p_size <= 15 AND p_type = 'ECONOMY'
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the region's suppliers
    offering the MINIMUM unit cost — the correlated scalar-min subquery
    (`ps_supplycost = (SELECT min(ps_supplycost) ...)`), decorrelated:
    the per-part min computes ONCE as a grouped aggregate and joins
    back, never once per outer row.  Unit cost is the minimum observed
    unit price (exact cents; see module docstring).

    Plan: region->nation->supplier reduces first and broadcasts into
    the lineitem scan (only EUROPE lineitems survive); the (part,supp)
    and per-part aggregates share partitioning on partkey so AQE
    schedules them with one fact shuffle; part filter broadcasts; the
    final ORDER BY ... LIMIT is a TakeOrdered with full tiebreak, so
    the top-100 is deterministic."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100 / F.col("l_quantity"))
        .cast("long")
        .alias("unit_cents"),
    )
    from oem_gateway_spark.operators.dedup import _own_cache

    # cost feeds the per-part min AND the equality join back: persist
    # the (per-(part, supp), region-filtered) relation — one fact scan.
    cost = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("unit_cents").alias("unit_cents"))
        .persist()
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cents").alias("best_cents")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey", "p_type")
    out = (
        cost.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cents") == F.col("best_cents")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round(F.col("unit_cents") / 100.0, 2).alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )
    return _own_cache(out, cost)


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum({_REV_CENTS2_SQL}
                     - CAST(round(p_retailprice * 100) AS BIGINT) * 60
                       * CAST(round(l_quantity) AS BIGINT)) / 10000.0, 2)
             AS sum_profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE 'red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    five-table join with a substring part filter — supply cost adapted
    to 0.6 * p_retailprice (no partsupp; module docstring).  Profit
    accumulates in exact 1e-4-currency integer units, so the grouped
    sums are order-independent.

    Plan: the LIKE-filtered part dim reduces ~1/|colors| and
    broadcasts, pruning lineitem BEFORE the only fact-fact shuffle
    (x orders on orderkey); supplier+nation chain broadcasts; the
    aggregate is |nations| x |years| groups.  At 100 TB the same plan
    holds — the expensive join is pre-filtered by the broadcast."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cost_units = (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.lit(60)
        * F.round(F.col("l_quantity")).cast("long")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(F.sum(_rev_cents2() - cost_units) / 10000.0, 2).alias(
                "sum_profit"
            )
        )
    )


@query(
    "q11_important_parts",
    oracle=f"""
    WITH part_value AS (
      SELECT l_partkey, sum({_REV_CENTS2_SQL}) AS value_units
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey,
           round(value_units / 10000.0, 2) AS value
    FROM part_value
    WHERE value_units > (SELECT sum(value_units) * 1.25 / count(*)
                         FROM part_value)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fraction of
    the GLOBAL total — the group-aggregate vs scalar-global-aggregate
    HAVING pattern (stock value adapted to lineitem revenue; module
    docstring).  The original's fraction hard-codes 0.0001/SF — scale
    dependent by spec — so the adapted threshold is 1.25x the MEAN part
    value, a stable "important" tail at every SF.  Value sums are exact
    integers; the threshold divides identically in both engines (int64
    converts to double exactly below 2^53; IEEE division is
    deterministic).

    Plan: ONE shuffle on partkey builds per-part sums; the global total
    re-aggregates the (already tiny) per-part result rather than
    re-scanning the fact; the scalar broadcasts back as a 1-row join.
    The naive translate re-scans lineitem for the subquery — this plan
    never reads the fact twice."""
    from oem_gateway_spark.operators.dedup import _own_cache

    li = _t(spark, sf_dir, "lineitem")
    # pv feeds both the threshold scalar and the filter join; without a
    # persist Catalyst inlines it at each reference and the FACT SCANS
    # TWICE (pinned by test_q11_fact_scanned_once).  The persisted
    # relation is per-part (tiny).
    pv = (
        li.groupBy("l_partkey")
        .agg(F.sum(_rev_cents2()).alias("value_units"))
        .persist()
    )
    total = pv.agg(
        (F.sum("value_units") * 1.25 / F.count("*")).alias("threshold")
    )
    out = (
        pv.join(F.broadcast(total), pv.value_units > total.threshold)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("value_units") / 10000.0, 2).alias("value"),
        )
    )
    return _own_cache(out, pv)


@query(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each surviving
    (brand, type, size) — a NOT IN exclusion subquery over a dimension
    plus a DISTINCT aggregate (supplier lists adapted to suppliers
    observed shipping; the exclusion list is negative-balance suppliers,
    standing in for the original's complaint filter).

    Plan: NOT IN compiles to a broadcast LEFT ANTI join (the exclusion
    list is tiny and provably non-null, so NOT IN == anti join); the
    filtered part dim broadcasts; count(DISTINCT) runs as the standard
    two-phase expand — partial distinct on (group, suppkey), then final
    count — one fact shuffle total."""
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_promotion_suppliers",
    oracle="""
    WITH li97 AS (
      SELECT l_suppkey, l_partkey,
             sum(CAST(round(l_quantity) AS BIGINT)) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'red%')
      GROUP BY 1, 2
    ), part_total AS (
      SELECT l_partkey, sum(qty) AS total_qty FROM li97 GROUP BY 1
    )
    SELECT s_suppkey, s_name
    FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (SELECT l_suppkey
                        FROM li97 JOIN part_total USING (l_partkey)
                        WHERE qty * 5 > total_qty)
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: one region's suppliers who dominate the flow of
    a LIKE-filtered part family — the DOUBLY-NESTED IN (suppkey IN
    (... partkey IN (...))) with a correlated quantity threshold
    (avail-quantity adapted to >20% of the part's 1997 flow; module
    docstring).  Quantities are exact integers, so the threshold
    compare (qty*5 > total) is integer-exact.

    Plan: the inner part IN is a broadcast semi join pruning lineitem
    at the scan; the per-(supp, part) and per-part aggregates share
    partkey partitioning; the qualifying-supplier set is tiny and
    broadcasts into the region-filtered supplier dim as a semi join —
    three joins, one fact shuffle, no correlated re-execution."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    from oem_gateway_spark.operators.dedup import _own_cache

    # li97 feeds the per-part totals AND the threshold join: persist the
    # (per-(supp, part), doubly-filtered) relation — one fact scan.
    li97 = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"))
        .persist()
    )
    part_total = li97.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    qualifying = (
        li97.join(part_total, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("qty") * 5 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    out = (
        s.join(
            F.broadcast(qualifying),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )
    return _own_cache(out, li97)
