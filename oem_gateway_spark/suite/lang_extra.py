"""Round-10 operators: Spark 4 LANGUAGE surfaces the registry lacked.

Each row here is a different way a query ENTERS the engine — parser,
comparison semantics, wire format, statement binding — not another plan
shape over the same entrances:

- q_pipe_syntax     SQL PIPE OPERATORS (`|>`): Spark 4's linear query
                    composition syntax, a second parser path into the
                    same logical plans ANSI SELECT produces.
- q_collated_group  COLLATION-AWARE GROUPING (UTF8_LCASE): non-binary
                    string equality as the SHUFFLE/AGGREGATION key —
                    every other string group in the registry compares
                    bytes.
- q_xml_extract     from_xml typed extraction (element + attribute):
                    the third semi-structured wire format next to
                    get_json_object/from_json and parse_json/VARIANT.
- q_param_sql       PARAMETERIZED SQL (named markers + IDENTIFIER()):
                    statement/value binding separated from SQL text —
                    the injection-safe dynamic-SQL surface.
- q_orc_roundtrip   ORC datasource round trip: the second COLUMNAR
                    wire format (own reader stack, own pushdown);
                    filters and values proven to survive the format
                    boundary bit-exactly.

Reference: the gateway (SURVEY.md ~l.120) has no SQL; these are §2.6
engine-beyond-reference surfaces.  Growth gate: each is a genuinely new
engine ENTRANCE (parser / comparator / format / binder), per the r9
verdict's shape-gate discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.registry import query


@query(
    "q_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 10
    """,
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE SYNTAX: the same scan -> filter -> derive -> aggregate ->
    having dataflow every ANSI query in the registry writes inside-out,
    written as a LINEAR `|>` chain (Spark 4 pipe operators: WHERE,
    EXTEND, AGGREGATE ... GROUP BY, then a post-aggregation WHERE that
    plays HAVING).

    New engine surface: a SECOND PARSER PATH.  Everything downstream is
    deliberately unchanged — the pipe chain must lower to the identical
    optimized plan as its ANSI twin (tests/test_round10_ops.py pins
    filter pushdown to the scan and the single group-by exchange, same
    as test_q1's contract), so at 100 TB syntax choice is free: pipe
    queries inherit pushdown, partial aggregation, and AQE with zero
    new machinery.  The oracle is the ANSI spelling itself, making the
    driver hash-prove parser equivalence.  Integer-exact outputs (count
    + casts of integral quantities), no float drift."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |> EXTEND CAST(l_quantity AS BIGINT) AS qty
        |> AGGREGATE COUNT(*) AS n, SUM(qty) AS sum_qty,
                     SUM(CAST(l_linenumber AS BIGINT)) AS sum_ln
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n > 10
        |> SELECT l_returnflag, l_linestatus, n, sum_qty, sum_ln
        """
    )


@query(
    "q_collated_group",
    oracle="""
    WITH keyed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
                  ELSE lower(p_brand) END AS brand_mixed,
             p_partkey
      FROM part
    )
    SELECT lower(min(brand_mixed)) AS brand_lc,
           min(brand_mixed) AS rep,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(p_partkey) AS BIGINT) AS sum_key
    FROM keyed
    GROUP BY lower(brand_mixed)
    """,
)
def q_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION-AWARE GROUPING: a deliberately case-mangled brand key
    (even partkeys upper-cased, odd lower-cased — every class is
    guaranteed mixed) grouped under UTF8_LCASE, so 'BRAND#13' and
    'brand#13' land in ONE group by the engine's comparator, not by a
    hand-written lower() normalization.

    New engine surface: NON-BINARY STRING EQUALITY as the shuffle and
    aggregation key.  Every other string grouping in the registry
    compares bytes; here the collated type itself carries the
    equivalence into hashing/exchange (Catalyst rewrites the grouping
    key through CollationKey so hash partitioning stays consistent with
    collated equality).  At 100 TB this is the difference between
    normalizing columns at write time and declaring the comparator at
    read time — the collation travels with the type through every
    downstream join/agg.  Outputs are derived ONLY from the non-collated
    source column (binary min as the deterministic representative,
    lower() of it as the class label) and the collated key is dropped,
    so the result schema is plain strings and the DuckDB oracle is the
    explicit lower()-grouped spelling: the driver hash-proves the
    comparator equals the normalization.  Integer-exact aggregates.

    Scale caveat (read off the plan, PLANS.md): the collated key
    disqualifies hash aggregation — Spark plans SortAggregate on both
    sides of the single exchange.  Cost is n log(n/partitions) compares
    instead of O(n) hashing; still one shuffle, still partial-agg
    map-side, but for a hot 100 TB aggregation where the key is known
    ASCII, normalizing at write time (lower() into a binary column)
    buys the hash aggregate back.  Declare-the-comparator vs
    normalize-at-write is therefore a measured tradeoff, not dogma."""
    part = load_table(spark, sf_dir, "part")
    keyed = part.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_brand"))
        .otherwise(F.lower("p_brand"))
        .alias("brand_mixed"),
        "p_partkey",
    )
    collated = keyed.withColumn(
        "brand_ci", F.collate(F.col("brand_mixed"), "UTF8_LCASE")
    )
    return (
        collated.groupBy("brand_ci")
        .agg(
            F.min("brand_mixed").alias("rep"),
            F.count("*").alias("n"),
            F.sum("p_partkey").alias("sum_key"),
        )
        .select(
            F.lower(F.col("rep")).alias("brand_lc"),
            "rep",
            "n",
            "sum_key",
        )
    )


@query(
    "q_xml_extract",
    oracle="""
    SELECT CAST(l_orderkey % 7 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln
    FROM lineitem
    GROUP BY l_orderkey % 7
    """,
)
def q_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML typed extraction: each lineitem row serialized to an XML
    record (an `id` ATTRIBUTE plus `ln`/`qty` child elements), parsed
    back with from_xml into a typed struct, and aggregated from the
    extracted fields only — the landing-zone round trip q_multi_format
    _union proves for CSV/JSON-lines, witnessed for the third wire
    format warehouses actually receive.

    New engine surface: NATIVE XML PARSING (Spark 4 built-in),
    including the attribute path (default attributePrefix maps id ->
    _id in the schema) which JSON/VARIANT have no analogue for.  The
    parse is one JVM-side expression per row — no Python, no shuffle
    added; the single exchange is the final group-by.  The DuckDB
    oracle computes the same aggregate directly from the base columns,
    so the driver hash-proves the XML round trip lossless.  PERMISSIVE
    parse semantics (malformed record -> null struct, never a job
    failure — the 100 TB dirty-feed contract) are pinned in
    tests/test_round10_ops.py.  Pure integer arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    xml = li.select(
        F.concat(
            F.lit('<rec id="'),
            F.col("l_orderkey").cast("string"),
            F.lit('"><ln>'),
            F.col("l_linenumber").cast("string"),
            F.lit("</ln><qty>"),
            F.col("l_quantity").cast("bigint").cast("string"),
            F.lit("</qty></rec>"),
        ).alias("payload")
    )
    parsed = xml.select(
        F.from_xml("payload", "_id BIGINT, ln BIGINT, qty BIGINT").alias("rec")
    )
    return (
        parsed.groupBy((F.col("rec._id") % 7).alias("grp"))
        .agg(
            F.count("*").alias("n"),
            F.sum("rec.qty").alias("sum_qty"),
            F.sum("rec.ln").alias("sum_ln"),
        )
    )


@query(
    "q_param_sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderpriority <> '3-MEDIUM'
    GROUP BY o_orderpriority
    """,
)
def q_param_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL: the statement text contains no data values at
    all — the table arrives through IDENTIFIER(:tbl) and the predicate
    constants through named markers (:floor, :excl), bound at parse
    time by spark.sql(..., args=...).

    New engine surface: STATEMENT/VALUE BINDING separated from SQL
    text.  Every other spark.sql call in the registry interpolates
    nothing (constants are part of the reviewed query); the moment a
    pipeline templates queries over user- or config-supplied values —
    the per-tenant / per-day / per-source pattern every 100 TB
    deployment hits — string interpolation is an injection and a
    plan-cache miss, while markers keep one parse shape with swapped
    literals.  IDENTIFIER() is the same contract for NAMES: the bound
    string can only ever resolve as a table identifier, never as SQL.
    Injection-safety is pinned in tests/test_round10_ops.py (a quote-
    smuggling value stays an inert literal; a bogus identifier raises
    instead of parsing).  The oracle is the fully-inlined spelling, so
    the driver hash-proves binding equals inlining.  min/max are exact
    order-independent doubles; no float summation."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_param_src")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :floor AND o_orderpriority <> :excl
        GROUP BY o_orderpriority
        """,
        args={"tbl": "orders_param_src", "floor": 150000.0, "excl": "3-MEDIUM"},
    )


@query(
    "q_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round trip with predicate pushdown: a lineitem projection is
    written to ORC (once per source fingerprint, atomic_export), read
    back through the ORC datasource with a scan-pushed ship-date
    filter, and aggregated — the result must hash-equal the same
    aggregate computed from the parquet original, proving the columnar
    round trip lossless.

    New engine surface: the SECOND COLUMNAR WIRE FORMAT.  Every other
    scan in the registry is parquet (plus q_multi_format_union's text
    row formats and q_xml_extract's per-row XML); ORC is the
    interchange format an engine meets whenever it shares a lake with
    a Hive/Trino estate, and it has its OWN reader stack — separate
    pushdown implementation (PushedFilters on the ORC FileScan,
    plan-pinned in tests/test_round10_ops.py), separate vectorized
    batch decode (Batched: true), its own encodings and bloom-filter
    indexes.  At 100 TB "we can read your tables in place" is the
    difference between a migration project and a config line; this row
    proves filters and values survive the format boundary bit-exactly.
    The export is projection-only (4 of 11 columns) and cached per
    (sf_dir, lineitem fingerprint) so reruns pay one write.  Integer
    casts make every aggregate exact."""
    import os

    from oem_gateway_spark.suite.streaming_batch import _source_fp, atomic_export

    li = load_table(spark, sf_dir, "lineitem")
    safe = sf_dir.strip("/").replace("/", "_")
    orc_dir = os.path.join(
        "/root/repo/.scratch",
        f"orc-lineitem-{safe}-{_source_fp(sf_dir, 'lineitem')}",
    )

    def build(tmp: str) -> None:
        (
            li.select("l_orderkey", "l_quantity", "l_shipdate", "l_returnflag")
            .write.mode("overwrite")
            .orc(os.path.join(tmp, "data"))
        )
        open(os.path.join(tmp, "_DONE"), "w").close()

    atomic_export(build, orc_dir, "_DONE")
    back = spark.read.orc(os.path.join(orc_dir, "data")).filter(
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.sum("l_orderkey").alias("sum_okey"),
    )


@query(
    "q_sql_script",
    oracle="""
    WITH tot AS (SELECT count(*) AS t FROM lineitem),
         steps AS (SELECT (g.range + 1) * 5 AS q FROM range(10) g),
         cum AS (SELECT q,
                        (SELECT count(*) FROM lineitem
                          WHERE l_quantity <= q) AS c
                 FROM steps),
         cut AS (SELECT min(q) AS cutoff FROM cum, tot WHERE c >= t / 2)
    SELECT CAST(l_orderkey % 5 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST((SELECT cutoff FROM cut) AS BIGINT) AS cutoff
    FROM lineitem
    WHERE l_quantity <= (SELECT cutoff FROM cut)
    GROUP BY l_orderkey % 5
    """,
)
def q_sql_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (SQL/PSM control flow): a BEGIN..END block with
    DECLAREd local variables, scalar-subquery SETs, and a DATA-DEPENDENT
    WHILE loop — a stride-5 search for the smallest quantity cutoff
    covering half the table — whose result variable then parameterizes
    the script's final grouped SELECT.

    New engine surface: PROCEDURAL CONTROL FLOW AS A LANGUAGE ENTRANCE.
    Every other iteration in the registry loops in Python on the driver
    (pointer doubling, Lloyd's, BFS) or declaratively in one statement
    (recursive CTE); here the ENGINE interprets the loop — condition
    evaluation, variable scope, statement sequencing — from a single
    spark.sql() call, the migration path for the DDL-heavy stored-proc
    ETL a warehouse estate runs today.  Each WHILE iteration is a real
    aggregation job (jobs-inside-a-statement, visible in the UI), and
    the loop is guaranteed to terminate (cutoff reaches 50 = the
    quantity domain max, where cnt == tot >= tot/2).  The DuckDB oracle
    lowers the procedural search to set SQL (cumulative counts over the
    stride grid + min over qualifying cutoffs), so the driver
    hash-proves the loop's fixpoint — a wrong iteration count, an
    off-by-one stride, or a variable-scope bug all land on a different
    cutoff and drift every output row.  Scripting is enabled by default
    on this Spark (4.1.2, spark.sql.scripting.enabled=true).  Execution
    contract nuance, read off the returned plan: the script runs
    EAGERLY inside spark.sql() (statement sequencing can't be lazy) and
    the returned DataFrame is the final SELECT's materialized result
    (LocalTableScan) — so a script's last statement should REDUCE
    (aggregate/limit), never emit a table-sized row set through the
    driver; this one returns 5 rows.  Pure integer outputs."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "li_script_src"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE tot BIGINT;
          DECLARE cutoff INT = 0;
          DECLARE cnt BIGINT = 0;
          SET tot = (SELECT COUNT(*) FROM li_script_src);
          WHILE cnt < tot / 2 DO
            SET cutoff = cutoff + 5;
            SET cnt = (SELECT COUNT(*) FROM li_script_src
                        WHERE l_quantity <= cutoff);
          END WHILE;
          SELECT CAST(l_orderkey % 5 AS BIGINT) AS grp,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                 CAST(cutoff AS BIGINT) AS cutoff
          FROM li_script_src WHERE l_quantity <= cutoff
          GROUP BY l_orderkey % 5;
        END
        """
    )
