"""Gateway-parity suite: the reference's frame dataflow (SURVEY §2.1-2.4)
made oracle-checkable.

Strategy: the driver only registers the ten relational/LLM parquet tables in
DuckDB, so each query *synthesizes deterministic frame lines from lineitem/
events columns on the Spark side, runs the real parse/validate/decode chain
on the text*, while the oracle computes the expected output arithmetically —
a stronger check than string-roundtripping both sides (the oracle never sees
our parser).

Frame synthesis is lossless: Spark's double->string cast is shortest
round-trip repr, so parse(build(x)) == x bitwise.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.functions import frames as FR
from oem_gateway_spark.functions import frames_pandas as FP
from oem_gateway_spark.suite.registry import query


def _parse_byte_string(raw: str) -> int:
    """Spark size-conf strings: bare bytes ('134217728'), or a unit
    suffix ('128m', '1g', '134217728b', case-insensitive).  Stripping
    digits naively would read '128m' as 128 BYTES and silently disable
    the fan-out below (code-review r5)."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([a-z]*)\s*", raw.lower())
    if not m:
        return 134217728
    units = {
        "": 1, "b": 1,
        "k": 1 << 10, "kb": 1 << 10,
        "m": 1 << 20, "mb": 1 << 20,
        "g": 1 << 30, "gb": 1 << 30,
        "t": 1 << 40, "tb": 1 << 40,
    }
    mult = units.get(m.group(2))
    return int(m.group(1)) * mult if mult else 134217728


def _fan_out(df: DataFrame, sf_dir: str, table: str = "lineitem") -> DataFrame:
    """Spread synthesized frames across all cores before the CPU-bound
    parse chain — but ONLY when the source underdelivers parallelism.
    The testdata ships one small parquet file (1-3 input splits); a real
    100 TB source arrives as thousands of splits / stream partitions, in
    which case this is a no-op and the parse chain stays shuffle-free
    (the honest at-scale plan).  Round-robin cost on tiny rows is dwarfed
    by the parse work it unlocks locally.

    The split count is estimated from driver-side FILE METADATA
    (parquet bytes vs maxPartitionBytes — the same arithmetic
    FilePartition planning uses), not ``df.rdd.getNumPartitions()``:
    the RDD conversion materializes a physical plan per query
    invocation just to read one number (VERDICT r4)."""
    import glob as _glob

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    root = os.path.join(sf_dir, f"{table}.parquet")
    files = [
        f
        for f in _glob.glob(os.path.join(root, "*.parquet")) + [root]
        if os.path.isfile(f)
    ]
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    max_pb = _parse_byte_string(raw)
    open_cost = _parse_byte_string(
        str(spark.conf.get("spark.sql.files.openCostInBytes", "4194304"))
    )
    total = sum(os.path.getsize(f) for f in files)
    if not files:
        est_splits = 1
    else:
        # Mirror FilePartition packing (r5 ADVICE): many SMALL files do
        # NOT each get a partition — they pack into shared splits of
        # maxSplitBytes = min(maxPartitionBytes, max(openCost,
        # bytesPerCore)), each file padded by openCostInBytes.  The old
        # len(files) floor overestimated here, letting _fan_out no-op
        # while the real scan delivered far fewer partitions.
        padded = total + len(files) * open_cost
        bytes_per_core = padded // max(1, target)
        max_split = min(max_pb, max(open_cost, bytes_per_core))
        est_splits = max(1, -(-padded // max(1, max_split)))
    if est_splits >= target:
        return df
    return df.repartition(target)


def _serial_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> one serial frame per row: 'node qty disc price'."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("line_id"),
        F.concat_ws(
            " ",
            (F.col("l_suppkey") % 32).cast("int").cast("string"),
            F.col("l_quantity").cast("string"),
            F.col("l_discount").cast("string"),
            F.col("l_extendedprice").cast("string"),
        ).alias("line"),
    )


@query(
    "g_parse_serial",
    oracle="""
    WITH base AS (
      SELECT l_orderkey*10 + l_linenumber AS line_id,
             CAST(l_suppkey % 32 AS INT) AS node,
             l_quantity, l_discount, l_extendedprice
      FROM lineitem
    )
    SELECT line_id, node, idx, value FROM (
      SELECT line_id, node, 0 AS idx, l_quantity AS value FROM base
      UNION ALL SELECT line_id, node, 1, l_discount FROM base
      UNION ALL SELECT line_id, node, 2, l_extendedprice FROM base
    )
    """,
)
def g_parse_serial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3+P6+explode: serial text frames -> long-format readings.

    Ref: oemgatewaylistener.py :: OemGatewaySerialListener._process_frame
    (~l.105-115) — tokenize, validate-all-or-drop, node projection.
    """
    lines = _fan_out(_serial_lines(spark, sf_dir), sf_dir)
    # Vectorized parse (frames_pandas) — row-exact equivalent of the HOF
    # spec (tests/test_frames_equivalence.py); the oracle checks the result
    # against direct arithmetic, so the parser itself stays under test.
    parsed = FP.parse_serial_frames_fast(lines)
    return FR.explode_readings(parsed).select("line_id", "node", "idx", "value")


@query(
    "g_rfm2pi_decode",
    oracle="""
    WITH base AS (
      SELECT l_orderkey*10 + l_linenumber AS line_id,
             CAST(l_suppkey % 32 AS INT) AS node,
             l_partkey % 256            AS b1,
             l_orderkey % 256           AS b2,
             (l_partkey*7 + 13) % 256   AS b3,
             (l_orderkey*31 + l_linenumber) % 256 AS b4
      FROM lineitem
    ), dec AS (
      SELECT line_id, node,
             b1 + 256*b2 AS r1,
             b3 + 256*b4 AS r2
      FROM base
    )
    SELECT line_id, node, idx,
           CAST(CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS INT) AS value
    FROM (
      SELECT line_id, node, 0 AS idx, r1 AS raw FROM dec
      UNION ALL SELECT line_id, node, 1, r2 FROM dec
    )
    """,
)
def g_rfm2pi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5: RFM2Pi byte frames -> little-endian signed int16 readings.

    Ref: oemgatewaylistener.py :: OemGatewayRFM2PiListener._process_frame
    (~l.150-170) — the one nontrivial scalar decode in the reference.
    """
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("line_id"),
        F.concat_ws(
            " ",
            (F.col("l_suppkey") % 32).cast("int").cast("string"),
            (F.col("l_partkey") % 256).cast("string"),
            (F.col("l_orderkey") % 256).cast("string"),
            ((F.col("l_partkey") * 7 + 13) % 256).cast("string"),
            ((F.col("l_orderkey") * 31 + F.col("l_linenumber")) % 256).cast("string"),
        ).alias("line"),
    )
    parsed = FP.parse_rfm2pi_frames_fast(_fan_out(lines, sf_dir))
    return FR.explode_readings(parsed).select("line_id", "node", "idx", "value")


@query(
    "g_reject_stats",
    oracle="""
    SELECT reason AS reject_reason, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT CASE
               WHEN l_linenumber % 7 = 0 THEN 'info_frame'
               WHEN l_linenumber % 7 = 1 THEN 'non_numeric'
               WHEN l_linenumber % 7 = 2 THEN 'empty'
               ELSE 'valid'
             END AS reason
      FROM lineitem
    )
    GROUP BY reason
    """,
)
def g_reject_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3 row-level reject semantics: malformed frames drop whole, with
    dead-letter reasons (engine upgrade over the reference's silent log-drop).

    Ref: _process_frame ValueError branch — "Misformed RX frame" (~l.112).

    r13 optimization: classification runs through the vectorized
    production twin (classify_reasons_fast; row-exact vs the Catalyst
    spec chain, pinned by test_frames_equivalence) with the standard
    parse fan-out — the interpreted HOF chain over the source's 3
    input splits measured 4.9 s isolated at sf0.1; the vectorized
    32-way path is the same one every other parse query uses.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber")
    good = F.concat_ws(
        " ",
        (F.col("l_suppkey") % 32).cast("int").cast("string"),
        F.col("l_quantity").cast("string"),
        F.col("l_extendedprice").cast("string"),
    )
    line = (
        F.when(ln % 7 == 0, F.concat(F.lit("> node "), good))
        .when(ln % 7 == 1, F.concat(F.lit("10 8a2 "), F.col("l_quantity").cast("string")))
        .when(ln % 7 == 2, F.lit("   "))
        .otherwise(good)
    )
    lines = li.select(line.alias("line"))
    cls = FP.classify_reasons_fast(_fan_out(lines, sf_dir))
    return cls.groupBy("reject_reason").agg(F.count("*").alias("n"))


@query(
    "g_rfm2pi_parity_reject",
    oracle="""
    SELECT reason AS reject_reason, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT CASE
               WHEN l_linenumber % 3 = 0 THEN 'odd_parity'
               WHEN l_linenumber % 5 = 0 THEN 'byte_range'
               ELSE 'valid'
             END AS reason
      FROM lineitem
    )
    GROUP BY reason
    """,
)
def g_rfm2pi_parity_reject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 parity check + byte-range validation on the RFM2Pi path.

    Ref: OemGatewayRFM2PiListener._process_frame (~l.155) — odd byte count
    after node id rejects the frame.  (%3 wins over %5 when both divide, so
    the CASE order matches the classifier's check order: range then parity —
    15 % 3 = 0 rows are odd_parity on both sides.)

    r13 optimization: same vectorized-classifier + fan-out switch as
    g_reject_stats (the HOF chain here measured 6.8 s isolated at
    sf0.1 on 3 input splits).
    """
    li = load_table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber")
    node = (F.col("l_suppkey") % 32).cast("int").cast("string")
    b1 = (F.col("l_partkey") % 256).cast("string")
    b2 = (F.col("l_orderkey") % 256).cast("string")
    line = (
        F.when(ln % 3 == 0, F.concat_ws(" ", node, b1, b2, F.lit("7")))  # 3 bytes: odd
        .when(ln % 5 == 0, F.concat_ws(" ", node, b1, F.lit("999")))  # out of range
        .otherwise(F.concat_ws(" ", node, b1, b2))
    )
    lines = li.select(line.alias("line"))
    cls = FP.classify_reasons_fast(_fan_out(lines, sf_dir), rfm2pi=True)
    return cls.groupBy("reject_reason").agg(F.count("*").alias("n"))


@query(
    "g_rfm2pi_dead_letter",
    oracle="""
    SELECT l_orderkey*10 + l_linenumber AS line_id,
           CASE WHEN l_linenumber % 3 = 0 THEN 'odd_parity'
                ELSE 'byte_range' END AS reject_reason
    FROM lineitem
    WHERE l_linenumber % 3 = 0 OR l_linenumber % 5 = 0
    """,
)
def g_rfm2pi_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4 dead-letter ROWS (not just counts): every rejected RFM2Pi
    frame routed to the dead-letter stream with its reason, via the
    production vectorized path (dead_letter_fast) — the engine upgrade
    over the reference's silent log-drop, checked row-for-row.

    Ref: OemGatewayRFM2PiListener._process_frame (~l.150-170) discard
    branches; byte_range is checked before parity, matching the oracle's
    CASE order (%3 rows are odd_parity even when %5 also divides —
    3-token frames never hit the byte test with an out-of-range value).
    """
    li = load_table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber")
    node = (F.col("l_suppkey") % 32).cast("int").cast("string")
    b1 = (F.col("l_partkey") % 256).cast("string")
    b2 = (F.col("l_orderkey") % 256).cast("string")
    line = (
        F.when(ln % 3 == 0, F.concat_ws(" ", node, b1, b2, F.lit("7")))
        .when(ln % 5 == 0, F.concat_ws(" ", node, b1, F.lit("999")))
        .otherwise(F.concat_ws(" ", node, b1, b2))
    )
    lines = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("line_id"),
        line.alias("line"),
    )
    dead = FP.dead_letter_fast(_fan_out(lines, sf_dir), rfm2pi=True)
    return dead.select("line_id", "reject_reason")


@query(
    "g_bulk_encode",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id AS node, value,
             epoch_ms(ts) AS ts_ms,
             epoch_ms(ts) // 300000 AS batch_id
      FROM events
    )
    SELECT batch_id, event_id, node,
           ts_ms - max(ts_ms) OVER (PARTITION BY batch_id) AS dt_ms,
           value
    FROM t
    """,
)
def g_bulk_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 relative-time bulk encode: rows get a non-positive offset relative
    to their batch's send time (= batch max timestamp).

    Ref: oemgatewaybuffer.py :: OemGatewayEmoncmsBuffer._send_data
    (~l.80-95) — emoncms bulk format [[dt,node,v...],...].
    Integer millisecond arithmetic; window max per batch (no clock skew).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_id",
        F.col("user_id").alias("node"),
        "value",
        F.unix_millis("ts").alias("ts_ms"),
        (F.floor(F.unix_millis("ts") / 300000)).alias("batch_id"),
    )
    w = Window.partitionBy("batch_id")
    return t.select(
        "batch_id",
        "event_id",
        "node",
        (F.col("ts_ms") - F.max("ts_ms").over(w)).alias("dt_ms"),
        "value",
    )


@query(
    "g_fanout_union",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total
    FROM events GROUP BY event_type
    """,
)
def g_fanout_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 fan-out / implicit UNION ALL of listener streams: two disjoint
    'listeners' (split by event_id parity) union back losslessly.

    Ref: oemgateway.py :: OemGateway.run (~l.85-100) — every frame from
    every listener goes to every buffer; the union of listener streams is
    the engine's single source DataFrame.
    """
    ev = load_table(spark, sf_dir, "events")
    listener_a = ev.filter(F.col("event_id") % 2 == 0)
    listener_b = ev.filter(F.col("event_id") % 2 == 1)
    merged = listener_a.unionByName(listener_b)
    return merged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
    )
