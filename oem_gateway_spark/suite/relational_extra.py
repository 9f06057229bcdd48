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
           array_to_string(list_sort(list(s_suppkey)), ',') AS supp_ids,
           array_to_string(list_sort(list(s_name)), ',') AS names_csv,
           CAST(count(*) AS BIGINT) AS n
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def q_array_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation (collect_list + sort_array) and string
    aggregation — deterministic via explicit sorting (collect_list order
    is otherwise partition-dependent).  supp_ids is CSV-serialized on both
    sides: raw array cells break the driver canonicalizer's column sort
    (VERDICT r3 #3)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("s_suppkey")).cast("array<string>"), ","
            ).alias("supp_ids"),
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


@query(
    "q_stratified_sample",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE CAST('0x' || substr(md5('samp:' || CAST(o_orderkey AS VARCHAR)), 1, 8)
               AS BIGINT) % 100
          < CASE WHEN o_orderpriority = '1-URGENT' THEN 50 ELSE 10 END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (training-data pipelines): keep a
    row iff an md5-derived hash of its key falls under the stratum's rate
    (urgent 50%, rest 10%).  Pure map filter — no shuffle, no RNG state,
    reproducible across engines/runs/retries, and the rate predicate pushes
    into the scan pipeline; at 100 TB this is THE sampling primitive
    (rand() samples are neither reproducible nor replay-stable)."""
    from oem_gateway_spark.functions.hashing import hash32

    o = load_table(spark, sf_dir, "orders")
    bucket = hash32(F.col("o_orderkey").cast("string"), "samp") % 100
    rate = F.when(F.col("o_orderpriority") == "1-URGENT", 50).otherwise(10)
    return o.filter(bucket < rate).select("o_orderkey", "o_orderpriority")


@query(
    "q_time_series_gap_fill",
    oracle="""
    WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
                WHERE user_id % 50 = 0),
    bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1
               FROM ev GROUP BY user_id),
    days AS (SELECT user_id,
                    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                      AS day
             FROM bounds),
    daily AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n
              FROM ev GROUP BY user_id, day)
    SELECT d.user_id, CAST(d.day AS TIMESTAMP) AS day, COALESCE(daily.n, 0) AS n
    FROM days d LEFT JOIN daily USING (user_id, day)
    """,
)
def q_time_series_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: densify each user's daily activity to a
    complete calendar (sequence + explode generates the scaffold
    executor-side; missing days coalesce to 0).  The scaffold join keys on
    (user, day) — co-partitioned with the aggregation, so the fill adds no
    extra shuffle of the fact table."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 50 == 0)
        .select("user_id", F.col("ts").cast("date").alias("day"))
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    days = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    daily = ev.groupBy("user_id", "day").agg(F.count("*").alias("n"))
    return days.join(daily, on=["user_id", "day"], how="left").select(
        "user_id",
        # DATE -> TIMESTAMP for output parity (DuckDB DATEs surface as
        # datetime64 in pandas, Spark dates as datetime.date objects).
        F.col("day").cast("timestamp").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n"),
    )


@query(
    "q_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 6) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (median / quartiles) —
    the full-sort-per-group aggregate whose approximate twin is
    u_approx_percentile; both engines use the same linear interpolation,
    so values match to round(6).  At scale prefer the t-digest/approx
    path; exact percentile forces a per-group sort of all values."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75_price"),
        F.count("*").alias("n"),
    )


@query(
    "q_salted_join",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT l_returnflag, 'flag-' || l_returnflag AS flag_label
      FROM lineitem
    )
    SELECT flag_label,
           round(sum(l_extendedprice), 4) AS total,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN dim USING (l_returnflag)
    GROUP BY flag_label
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted JOIN (operators/skew.py::salted_join): lineitem
    joined to a 3-row dimension on l_returnflag — the worst-case join-skew
    shape (every fact row hits one of 3 keys).  The salted plan replicates
    the dim over 16 salt values and spreads each hot key across 16
    reducers; result rows are identical to the plain join (oracle).  Here
    the dim would of course broadcast — the query pins the REWRITE's
    correctness; the plan-shape test (test_plans.py) pins its partition
    spread with broadcast disabled, which is the 100 TB case (dim too big
    to broadcast, AQE split capped)."""
    from oem_gateway_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        li.select("l_returnflag")
        .distinct()
        .withColumn("flag_label", F.concat(F.lit("flag-"), F.col("l_returnflag")))
    )
    joined = salted_join(li, dim, on="l_returnflag", n_salts=16)
    return joined.groupBy("flag_label").agg(
        F.round(F.sum("l_extendedprice"), 4).alias("total"),
        F.count("*").alias("n"),
    )


@query(
    "q_window_time_range",
    oracle="""
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(sum(value) OVER w, 4) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per-user trailing-1-hour event count
    and value sum — the rolling-interval aggregate (reference emoncms
    dashboards' '1h rolling power') that ROWS frames cannot express when
    event spacing is irregular.  Both engines frame on epoch milliseconds
    ([t-3600000, t]), so peers and boundaries match exactly.

    Shape: one shuffle on user_id (high cardinality), then a per-partition
    sort + linear two-pointer frame scan — no self-join, no explode; at
    100 TB this is the only shape that doesn't blow up the trailing-window
    computation (the naive range self-join is O(rows x avg window))."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3_600_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
    )


@query(
    "q_conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_pos,
           bool_or(o_totalprice > 400000) AS any_huge,
           round(arg_max(o_totalprice, o_orderkey), 4) AS price_at_max_key,
           round(arg_min(o_totalprice, o_orderkey), 4) AS price_at_min_key
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / boolean / argmin-argmax aggregates: count_if,
    bool_and/bool_or, max_by/min_by — the aggregate-function surface beyond
    sum/avg (DuckDB twins: FILTER, bool_*, arg_max/arg_min).  max_by/min_by
    order on the UNIQUE o_orderkey so ties cannot make the result
    engine-dependent.  All decomposable — partial-aggregate map-side, a few
    groups shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
        F.round(F.max_by("o_totalprice", "o_orderkey"), 4).alias("price_at_max_key"),
        F.round(F.min_by("o_totalprice", "o_orderkey"), 4).alias("price_at_min_key"),
    )


_LATERAL_BODY = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t{on}
WHERE c.c_custkey % 10 = 0
"""


@query("q_lateral_topk", oracle=_LATERAL_BODY.format(on=" ON TRUE"))
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer): the
    for-each-row join SQL users reach for before learning window top-k.
    Catalyst decorrelates the lateral into a join + per-key limit — same
    physical ground as q_window_topk_per_group, proved here through the
    SQL front door.  (DuckDB spells the same plan with ON TRUE.)"""
    from oem_gateway_spark.catalog import load_table as _lt

    _lt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_BODY.format(on=""))


@query(
    "q_histogram",
    oracle="""
    WITH b AS (SELECT min(l_extendedprice) AS m0, max(l_extendedprice) AS m1
               FROM lineitem)
    SELECT CAST(least(floor((l_extendedprice - m0) / ((m1 - m0) / 10.0)), 9)
                AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 4) AS total
    FROM lineitem, b GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram (10 bins over the observed [min, max]) — the
    profiling primitive behind data-quality dashboards.  The bounds row is
    a 2-value broadcast; binning is then pure map arithmetic (identical
    float expressions both engines: width first, then (v-m0)/width), so
    the histogram costs one scan + one 10-group exchange at any scale.
    The max value's bin is clamped to 9 (half-open bins, closed top)."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("m0"), F.max("l_extendedprice").alias("m1")
    )
    v = F.col("l_extendedprice")
    width = (F.col("m1") - F.col("m0")) / 10.0
    bin_ = F.least(F.floor((v - F.col("m0")) / width), F.lit(9)).cast("int")
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(bin_.alias("bin"), v.alias("v"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 4).alias("total"))
    )


@query(
    "q_funnel_conversion",
    oracle="""
    WITH fc AS (
      SELECT user_id, min(ts) AS first_click FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ), conv AS (
      SELECT DISTINCT f.user_id
      FROM fc f JOIN events e
        ON e.user_id = f.user_id AND e.event_type = 'purchase'
       AND e.ts >= f.first_click
       AND e.ts <= f.first_click + INTERVAL 1 HOUR
    )
    SELECT CAST((SELECT count(*) FROM fc) AS BIGINT) AS n_clickers,
           CAST((SELECT count(*) FROM conv) AS BIGINT) AS n_converted,
           round((SELECT count(*) FROM conv) * 1.0
                 / (SELECT count(*) FROM fc), 6) AS conv_rate
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: of users who clicked, how many purchased within an
    hour of their FIRST click — the first-touch attribution shape.  The
    conversion probe is an interval left-semi join on user_id (one equi
    shuffle, interval as residual; the semi form stops at the first
    matching purchase instead of materializing all pairs).  The two
    counts and the rate ride one final single-row combine."""
    ev = load_table(spark, sf_dir, "events")
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = fc.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("first_click"))
        & (F.col("p_ts") <= F.col("first_click") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    )
    n_clickers = fc.agg(F.count("*").alias("n_clickers"))
    n_conv = conv.agg(F.count("*").alias("n_converted"))
    return (
        n_clickers.crossJoin(n_conv)
        .select(
            "n_clickers",
            "n_converted",
            F.round(F.col("n_converted") * 1.0 / F.col("n_clickers"), 6).alias(
                "conv_rate"
            ),
        )
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH newsnap AS (
      SELECT o_orderkey,
             o_totalprice + CASE WHEN o_orderkey % 23 = 0 THEN 1000 ELSE 0 END
               AS o_totalprice,
             o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderkey % 19 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderkey % 31 = 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           round(o.o_totalprice, 4) AS old_price,
           round(n.o_totalprice, 4) AS new_price
    FROM orders o FULL OUTER JOIN newsnap n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (the CDC pattern): classify rows across two table
    versions as added / removed / changed via a full-outer join on the
    key with null-safe field comparison — how a 100 TB pipeline detects
    incremental change between daily snapshots without a transaction log.
    The 'new' snapshot is synthesized deterministically from orders
    (every 19th key deleted, every 23rd repriced, every 31st re-added
    under a shifted key) so both engines diff identical inputs.

    Shape: one co-partitioned full-outer join on the key (both sides
    shuffle once on o_orderkey); unchanged rows — the overwhelming
    majority in real snapshots — are filtered by the join residual and
    never reach the output."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    modified = o.filter(F.col("o_orderkey") % 19 != 0).withColumn(
        "o_totalprice",
        F.col("o_totalprice")
        + F.when(F.col("o_orderkey") % 23 == 0, F.lit(1000.0)).otherwise(F.lit(0.0)),
    )
    readded = o.filter(F.col("o_orderkey") % 31 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    new = modified.unionByName(readded)
    old_s = o.select(*[F.col(c).alias(f"old_{c}") for c in o.columns])
    new_s = new.select(*[F.col(c).alias(f"new_{c}") for c in new.columns])
    j = old_s.join(
        new_s, old_s.old_o_orderkey == new_s.new_o_orderkey, "full_outer"
    )
    diff = j.filter(
        F.col("old_o_orderkey").isNull()
        | F.col("new_o_orderkey").isNull()
        | ~F.col("old_o_totalprice").eqNullSafe(F.col("new_o_totalprice"))
        | ~F.col("old_o_orderstatus").eqNullSafe(F.col("new_o_orderstatus"))
        | ~F.col("old_o_orderpriority").eqNullSafe(F.col("new_o_orderpriority"))
    )
    return diff.select(
        F.coalesce("old_o_orderkey", "new_o_orderkey").alias("o_orderkey"),
        F.when(F.col("old_o_orderkey").isNull(), "added")
        .when(F.col("new_o_orderkey").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        F.round("old_o_totalprice", 4).alias("old_price"),
        F.round("new_o_totalprice", 4).alias("new_price"),
    )


@query(
    "q_locf_fill",
    oracle="""
    WITH gapped AS (
      SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      FROM events WHERE user_id % 100 = 0
    )
    SELECT event_id, user_id, ts_ms,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_ms, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled
    FROM gapped
    """,
)
def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last-observation-carried-forward) forward fill: sensor
    readings with synthetic gaps (every 7th event NULLed) are filled
    with the latest preceding non-null value per user — the
    ignore-nulls running window, the standard repair for missing
    telemetry before resampling.  Rows before a user's first
    observation stay NULL (both engines agree).

    Scale: one shuffle on user_id (same as any per-key window); the
    running frame is a single forward pass per partition — no
    self-join, no gap enumeration (q_time_series_gap_fill is the
    row-DENSIFYING twin; this one preserves cardinality)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 100 == 0)
    v = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.unix_millis("ts").alias("ts_ms"),
            v.alias("v"),
        )
        .select(
            "event_id",
            "user_id",
            "ts_ms",
            F.round(F.last("v", ignorenulls=True).over(w), 4).alias("filled"),
        )
    )


@query(
    "q_scd2_apply",
    oracle="""
    WITH newsnap AS (
      SELECT c_custkey,
             c_acctbal + CASE WHEN c_custkey % 11 = 0 THEN 500.0 ELSE 0 END
               AS c_acctbal
      FROM customer WHERE c_custkey % 13 <> 0
      UNION ALL
      SELECT c_custkey + 9000000, c_acctbal FROM customer
      WHERE c_custkey % 17 = 0
    ),
    j AS (
      SELECT o.c_custkey AS old_key, o.c_acctbal AS old_bal,
             n.c_custkey AS new_key, n.c_acctbal AS new_bal
      FROM customer o FULL OUTER JOIN newsnap n USING (c_custkey)
    )
    SELECT old_key AS c_custkey, round(old_bal, 4) AS c_acctbal,
           '2020-01-01' AS valid_from,
           CASE WHEN new_key IS NULL OR old_bal <> new_bal
                THEN '2024-06-01' END AS valid_to,
           (new_key IS NOT NULL AND old_bal = new_bal) AS is_current
    FROM j WHERE old_key IS NOT NULL
    UNION ALL
    SELECT new_key, round(new_bal, 4), '2024-06-01', CAST(NULL AS VARCHAR), true
    FROM j
    WHERE new_key IS NOT NULL AND (old_key IS NULL OR old_bal <> new_bal)
    """,
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 apply: merge a new dimension snapshot into a
    slowly-changing-dimension history — unchanged rows stay open,
    changed rows close the old version (valid_to = load date) and open
    a new one, deletes close, inserts open.  The new snapshot is
    synthesized deterministically from customer (balance bump for
    custkey%11, deletes %13, inserts %17 — same convention as
    q_snapshot_diff).

    Scale: ONE full-outer join on the business key (single shuffle per
    side), then each joined row emits its 1-2 history rows through an
    array-of-structs explode — the classic UNION-of-two-selects
    formulation would recompute the join per branch; the explode does
    it in one pass.  This is the standard warehouse pattern for
    dimension history at any scale (the join key is the natural
    partitioner; no skew — business keys are unique per side)."""
    c = load_table(spark, sf_dir, "customer")
    old = c.select(
        F.col("c_custkey").alias("old_key"), F.col("c_acctbal").alias("old_bal")
    )
    new = (
        c.filter(F.col("c_custkey") % 13 != 0)
        .select(
            "c_custkey",
            (
                F.col("c_acctbal")
                + F.when(F.col("c_custkey") % 11 == 0, 500.0).otherwise(0.0)
            ).alias("new_bal"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 17 == 0).select(
                (F.col("c_custkey") + 9000000).alias("c_custkey"),
                F.col("c_acctbal").alias("new_bal"),
            )
        )
        .select(F.col("c_custkey").alias("new_key"), "new_bal")
    )
    j = old.join(new, old.old_key == new.new_key, "full_outer")
    # dates travel as ISO strings: Spark hands pandas datetime.date while
    # DuckDB hands datetime64 — strings compare identically in the driver
    load_date = F.lit("2024-06-01")
    start_date = F.lit("2020-01-01")
    changed = F.col("old_bal") != F.col("new_bal")
    old_row = F.when(
        F.col("old_key").isNotNull(),
        F.struct(
            F.col("old_key").alias("c_custkey"),
            F.round("old_bal", 4).alias("c_acctbal"),
            start_date.alias("valid_from"),
            F.when(F.col("new_key").isNull() | changed, load_date).alias(
                "valid_to"
            ),
            (F.col("new_key").isNotNull() & ~changed).alias("is_current"),
        ),
    )
    new_row = F.when(
        F.col("new_key").isNotNull() & (F.col("old_key").isNull() | changed),
        F.struct(
            F.col("new_key").alias("c_custkey"),
            F.round("new_bal", 4).alias("c_acctbal"),
            load_date.alias("valid_from"),
            F.lit(None).cast("string").alias("valid_to"),
            F.lit(True).alias("is_current"),
        ),
    )
    rows = F.filter(F.array(old_row, new_row), lambda x: x.isNotNull())
    return (
        j.select(F.explode(rows).alias("r"))
        .select("r.*")
    )


@query(
    "q_concurrent_intervals",
    oracle="""
    WITH iv AS (
      SELECT CAST(epoch_ms(ts) AS BIGINT) AS s,
             CAST(epoch_ms(ts) AS BIGINT) + 3600000 AS e
      FROM events WHERE event_type = 'purchase'
    ),
    bounds AS (
      SELECT s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d FROM iv
    ),
    merged AS (SELECT t, sum(d) AS delta FROM bounds GROUP BY t),
    swept AS (
      SELECT t, CAST(sum(delta) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS concurrency
      FROM merged
    )
    SELECT CAST(max(concurrency) AS BIGINT) AS peak,
           CAST(count(*) AS BIGINT) AS n_boundaries,
           CAST(min(CASE WHEN concurrency = (SELECT max(concurrency) FROM swept)
                         THEN t END) AS BIGINT) AS first_peak_ms
    FROM swept
    """,
)
def q_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: each purchase opens a 1-hour interval; the
    query finds the PEAK number of simultaneously-open intervals and when
    it first occurs — the occupancy/capacity-planning shape (concurrent
    sessions, connections, reservations) that naive self-join approaches
    turn into an O(n^2) overlap join.

    Plan: intervals unpivot to +1/-1 boundary deltas, coincident
    boundaries pre-aggregate (one hash shuffle), and a running sum over
    the time order yields the concurrency timeline.  The global-order
    window funnels only the AGGREGATED boundary stream (two rows per
    interval, collapsed by timestamp) through the ordered pass, and the
    peak reduces it to one row.  At 100 TB, shard the sweep by a
    partition key (per-region occupancy) or pre-bucket timestamps; the
    all-keys global timeline is inherently sequential in any engine."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    s = F.unix_millis("ts")
    iv = ev.select(s.alias("s"), (s + 3600000).alias("e"))
    bounds = iv.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    merged = bounds.groupBy("t").agg(F.sum("d").alias("delta"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    swept = merged.select("t", F.sum("delta").over(w).alias("concurrency"))
    peak = swept.agg(F.max("concurrency").alias("_peak"))
    # first_peak_ms = earliest boundary hitting the maximum — ties on the
    # peak value are resolved by time, deterministically in both engines
    return (
        swept.join(F.broadcast(peak))
        .agg(
            F.max("concurrency").alias("peak"),
            F.count("*").alias("n_boundaries"),
            F.min(
                F.when(F.col("concurrency") == F.col("_peak"), F.col("t"))
            ).alias("first_peak_ms"),
        )
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH src AS (
      SELECT o_custkey + CASE WHEN o_custkey % 19 = 0 THEN 9000000 ELSE 0 END
               AS key,
             CAST(count(*) AS BIGINT) AS n_orders,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS spend_cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY 1),
    j AS (
      SELECT c.c_custkey AS tkey, c.c_acctbal, s.key AS skey,
             s.n_orders, s.spend_cents
      FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.key),
    acted AS (
      SELECT coalesce(tkey, skey) AS c_custkey,
             CASE WHEN tkey IS NULL THEN 'insert'
                  WHEN skey IS NULL THEN 'keep'
                  WHEN n_orders >= 8 THEN 'update'
                  WHEN c_acctbal < 0 THEN 'delete'
                  ELSE 'keep' END AS action,
             CASE WHEN tkey IS NULL THEN spend_cents / 1000.0
                  WHEN skey IS NOT NULL AND n_orders >= 8
                       THEN c_acctbal + spend_cents / 1000.0
                  ELSE c_acctbal END AS bal
      FROM j)
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           floor(bal * 100 + 0.5) / 100 AS acctbal, action
    FROM acted WHERE action <> 'delete'
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO conflict semantics (the Delta/Iceberg upsert kernel,
    expressed on plain DataFrames): a change feed derived from recent
    orders merges into the customer dimension under ORDERED WHEN
    clauses — matched + active (n_orders >= 8) -> UPDATE (balance
    credit); matched + delinquent (c_acctbal < 0) -> DELETE; source key
    unknown to the target -> INSERT; anything else passes through
    unchanged.  New plan shape vs the existing warehouse family:
    multi-branch action ROUTING with clause priority (a row that is
    both active and delinquent takes the first matching clause — UPDATE
    — exactly MERGE's first-match-wins contract) and a DELETE branch
    that removes target rows; q_scd2_apply/q_snapshot_diff only ever
    append or close history rows, never route one row through
    prioritized alternatives.

    Scale: the change feed aggregates map-side to one row per customer
    (|customers| << |orders|), then ONE full-outer shuffle join on the
    business key — unique per side, so no skew; a bucketed target makes
    the exchange one-sided (q_bucketed_join's layout).  Action routing
    and the delete filter are pure map work on the joined row.  This is
    how MERGE executes on any engine at 100 TB: join + per-row clause
    resolution, never row-at-a-time lookups."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    src = o.groupBy(
        (
            F.col("o_custkey")
            + F.when(F.col("o_custkey") % 19 == 0, 9000000).otherwise(0)
        ).alias("key")
    ).agg(
        F.count("*").alias("n_orders"),
        # Sum INTEGER cents, not doubles: a double sum is accumulation-
        # order-dependent, and a last-ulp spend difference between Spark
        # and DuckDB can flip the half-cent floor below (review r6).
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).alias(
            "spend_cents"
        ),
    )
    tgt = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("tkey"), "c_acctbal"
    )
    j = tgt.join(src, F.col("tkey") == F.col("key"), "full_outer")
    action = (
        F.when(F.col("tkey").isNull(), F.lit("insert"))
        .when(F.col("key").isNull(), F.lit("keep"))
        .when(F.col("n_orders") >= 8, F.lit("update"))
        .when(F.col("c_acctbal") < 0, F.lit("delete"))
        .otherwise(F.lit("keep"))
    )
    bal = (
        F.when(F.col("tkey").isNull(), F.col("spend_cents") / 1000.0)
        .when(
            F.col("key").isNotNull() & (F.col("n_orders") >= 8),
            F.col("c_acctbal") + F.col("spend_cents") / 1000.0,
        )
        .otherwise(F.col("c_acctbal"))
    )
    return (
        j.select(
            F.coalesce("tkey", "key").alias("c_custkey"),
            # floor(x*100+0.5)/100, not round( ,2): 0.1*spend lands on
            # half-cent boundaries where Spark/DuckDB round() disagree
            # by a penny (caught at sf0.01); floor is pure IEEE on both.
            (F.floor(bal * 100 + 0.5) / 100).alias("acctbal"),
            action.alias("action"),
        )
        .filter(F.col("action") != "delete")
    )
