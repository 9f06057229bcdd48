"""Final §2.6 API surfaces: cogrouped applyInPandas and Python UDTF."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.registry import query


@query(
    "u_cogroup",
    oracle="""
    WITH e AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_events,
                      round(sum(value), 4) AS sum_value
               FROM events GROUP BY user_id),
         o AS (SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n_orders,
                      round(sum(o_totalprice), 4) AS sum_spend
               FROM orders GROUP BY o_custkey)
    SELECT coalesce(e.key, o.key) AS key,
           coalesce(e.n_events, 0) AS n_events,
           coalesce(e.sum_value, 0) AS sum_value,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(o.sum_spend, 0) AS sum_spend
    FROM e FULL OUTER JOIN o ON e.key = o.key
    """,
)
def u_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: two datasets grouped on the same key,
    merged per key in one pandas function (the two-sided escape hatch —
    both sides shuffle once on the key; per-key memory bounded)."""

    # Two levers, both measured at sf0.1:
    # 1. Project BEFORE the cogroup — column pruning does not cross
    #    applyInPandas (the UDF is a black box to Catalyst), so without
    #    this every column of both tables (incl. the wide props JSON)
    #    rides the Arrow transfer the merge never reads.
    # 2. Pin the partition count with an explicit keyed repartition —
    #    the wall here is per-group PYTHON INVOCATION (1500 tiny
    #    groups), and after pruning the shuffle is so small that AQE
    #    coalesced it to 3 partitions, serializing the group calls
    #    (pruning ALONE measured SLOWER than no pruning: 16 s vs 11 s).
    #    A user-specified repartition is exempt from AQE coalescing and
    #    cogroup reuses its hash partitioning, so no extra exchange.
    # Together: 11 s -> 2.8 s.  The general lesson for Pandas-UDF
    # group ops: when per-group overhead dominates, partition count is
    # the throughput knob, and byte-based AQE coalescing optimizes the
    # wrong currency.

    def merge(events: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        key = (
            events["user_id"].iloc[0]
            if len(events)
            else orders["o_custkey"].iloc[0]
        )
        return pd.DataFrame(
            {
                "key": [int(key)],
                "n_events": [len(events)],
                "sum_value": [float(events["value"].sum()) if len(events) else 0.0],
                "n_orders": [len(orders)],
                "sum_spend": [
                    float(orders["o_totalprice"].sum()) if len(orders) else 0.0
                ],
            }
        )

    par = spark.sparkContext.defaultParallelism
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "value")
        .repartition(par, "user_id")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .repartition(par, "o_custkey")
    )
    merged = (
        ev.groupBy("user_id")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            merge,
            "key long, n_events long, sum_value double, n_orders long, sum_spend double",
        )
    )
    # Round JVM-side (half-up parity with the oracle).
    return merged.select(
        "key",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        "n_orders",
        F.round("sum_spend", 4).alias("sum_spend"),
    )


@query(
    "u_python_udtf",
    oracle="""
    SELECT doc_id, w AS word, CAST(i - 1 AS INT) AS pos
    FROM (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> length(x) > 0)) AS w,
             generate_subscripts(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> length(x) > 0), 1) AS i
      FROM documents)
    WHERE i <= 5
    """,
)
def u_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row -> many output rows via a
    lateral join — the table-function surface (here: first-5 word
    positions per document)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int")
    class FirstWords:
        def eval(self, text: str):
            import re

            words = [w for w in re.split(r"[^a-z0-9]+", (text or "").lower()) if w]
            for i, w in enumerate(words[:5]):
                yield w, i

    spark.udtf.register("first_words", FirstWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.pos
        FROM docs_udtf d, LATERAL first_words(d.text) t
        """
    )


@query(
    "u_udtf_analyze",
    oracle="""
    SELECT 'by_qty' AS part,
           CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) AS key,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem WHERE l_orderkey % 10 = 0 GROUP BY 2
    UNION ALL
    SELECT 'by_sk',
           CAST(CAST(l_suppkey AS INTEGER) AS VARCHAR),
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_orderkey % 10 = 0 GROUP BY 2
    """,
)
def u_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    SCHEMA is computed at PLAN time by user Python code from a literal
    argument — a genuinely different API entrance than the static
    ``returnType`` twin (u_python_udtf), whose schema is fixed at
    registration.  ``json_fields(props, 'qty,sk')`` emits one STRING
    column PER NAME in the literal list (analyze() parses the list and
    builds the StructType; a non-literal argument is rejected at
    planning, since no single schema could serve the plan).

    The shape is witnessed structurally, not just by hash: ONE
    registered class is called TWICE in the same query with DIFFERENT
    field lists — (qty, sk) then (sk) — and each call site gets its own
    analyzed schema; with a static returnType one of the two calls
    could not even resolve.  The JSON travels integer-valued (casts
    applied BEFORE to_json) so the Python str() round trip is
    formatting-stable, and the oracle recomputes both branches from
    lineitem directly — a mis-parsed field, misordered tuple, or
    schema/field-list drift breaks the hash.

    Scale: polymorphism is a PLANNING feature — it costs nothing at
    run time; the lateral itself is a per-row Python map (no shuffle of
    its own) and the aggregation above it shuffles on the emitted key
    like any groupBy.  The input is a 10% lineitem slice: the row is an
    API-shape witness, and per-row Python transfer dominates its wall.
    MEASURED rejected alternative (r12, sf0.1): ``udtf(..,
    useArrow=True)`` ran the same plan 12x SLOWER (119 s vs 10 s,
    best-of-2) — 4.1.2's Arrow UDTF serializer pays per-YIELD batch
    overhead that swamps the transfer savings at one output row per
    input row, so the pickled row path stays."""
    import json

    from pyspark.sql.functions import to_json, udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class JsonFields:
        @staticmethod
        def analyze(
            props: AnalyzeArgument, fields: AnalyzeArgument
        ) -> AnalyzeResult:
            if fields.value is None:
                raise ValueError(
                    "json_fields: the field list must be a literal string "
                    "(the output schema is derived from it at planning)"
                )
            schema = StructType()
            for name in fields.value.split(","):
                schema.add(name.strip(), StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, props: str, fields: str):
            d = json.loads(props) if props else {}
            names = [n.strip() for n in fields.split(",")]
            yield tuple(
                None if d.get(n) is None else str(d[n]) for n in names
            )

    spark.udtf.register("json_fields", JsonFields)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 10 == 0
    )
    src = li.select(
        to_json(
            F.struct(
                F.col("l_quantity").cast("int").alias("qty"),
                F.col("l_suppkey").cast("int").alias("sk"),
            )
        ).alias("props")
    )
    src.createOrReplaceTempView("src_udtf_poly")
    return spark.sql(
        """
        SELECT 'by_qty' AS part, t.qty AS key, CAST(COUNT(*) AS BIGINT) AS n
        FROM src_udtf_poly s, LATERAL json_fields(s.props, 'qty,sk') t
        GROUP BY t.qty
        UNION ALL
        SELECT 'by_sk', u.sk, CAST(COUNT(*) AS BIGINT)
        FROM src_udtf_poly s, LATERAL json_fields(s.props, 'sk') u
        GROUP BY u.sk
        """
    )


@query(
    "u_udtf_table_partition",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
      FROM events WHERE user_id % 5 = 0
    ), g AS (
      SELECT user_id,
             ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
                                      ORDER BY ts_ms) AS gap
      FROM e
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(gap) AS BIGINT) AS max_gap_ms
    FROM g GROUP BY user_id
    """,
)
def u_udtf_table_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE ARGUMENT (Spark 4): the function is
    called over an INPUT RELATION — ``gap_stats(TABLE(v) PARTITION BY
    user_id ORDER BY ts_ms)`` — not per scalar row via LATERAL.  This is
    the third UDTF entrance after static-returnType (u_python_udtf) and
    plan-time analyze() polymorphism (u_udtf_analyze), and the only one
    where the ENGINE drives partition/order semantics: each partition's
    rows stream through ``eval(row)`` IN THE REQUESTED ORDER on one
    instance, and ``terminate()`` flushes that partition's aggregate —
    user code holds running state across rows, which LATERAL cannot
    express (each lateral call is stateless per input row).

    The computed shape makes order semantics load-bearing: max gap
    between CONSECUTIVE events per user is only defined by the ORDER BY
    — an engine that fed rows unordered or split a user across
    instances would drift the hash vs the batch lag() oracle.  (Gaps
    over equal-ts ties are permutation-invariant — consecutive diffs of
    a sorted multiset — so ORDER BY ts_ms alone is deterministic.)

    Scale: PARTITION BY shuffles once on user_id and streams each
    group through Python with O(1) state per instance — same data
    movement as a groupBy, with arbitrary per-group sequential logic;
    the 20% user slice keeps the per-row Python transfer a witness, not
    a wall."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_ms bigint")
    class GapStats:
        def __init__(self):
            self._uid = None
            self._n = 0
            self._prev = None
            self._max_gap = None

        def eval(self, row):
            self._uid = row["user_id"]
            self._n += 1
            if self._prev is not None:
                gap = row["ts_ms"] - self._prev
                if self._max_gap is None or gap > self._max_gap:
                    self._max_gap = gap
            self._prev = row["ts_ms"]

        def terminate(self):
            if self._n:
                yield self._uid, self._n, self._max_gap

    spark.udtf.register("gap_stats", GapStats)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 5 == 0)
        .select("user_id", F.unix_millis("ts").alias("ts_ms"))
    )
    ev.createOrReplaceTempView("ev_udtf_tblarg")
    return spark.sql(
        """
        SELECT t.user_id, t.n_events, t.max_gap_ms
        FROM gap_stats(TABLE(ev_udtf_tblarg)
                       PARTITION BY user_id ORDER BY ts_ms) t
        """
    )


@query(
    "u_udtf_analyze_table",
    oracle="""
    WITH src AS (
      SELECT CAST(user_id % 16 AS BIGINT) AS bucket,
             value,
             CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
      FROM events
    )
    SELECT bucket, 'ts_ms' AS col_name,
           CAST(count(ts_ms) AS BIGINT) AS n,
           CAST(min(ts_ms) AS DOUBLE) AS min_v,
           CAST(max(ts_ms) AS DOUBLE) AS max_v
    FROM src GROUP BY bucket
    UNION ALL
    SELECT bucket, 'value',
           CAST(count(value) AS BIGINT),
           round(min(value), 4), round(max(value), 4)
    FROM src GROUP BY bucket
    """,
)
def u_udtf_analyze_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FOURTH UDTF entrance — ``analyze()`` POLYMORPHISM OVER A
    TABLE ARGUMENT, plus two function-requested planning features no
    other entrance exercises:

    - the output schema is derived from the INPUT TABLE'S SCHEMA at
      plan time (``AnalyzeArgument.dataType`` is the table's struct;
      one profile row per numeric column discovered there) — a column
      added to the input table changes the OUTPUT rows with zero call-
      site changes, which neither the literal-driven analyze twin
      (u_udtf_analyze) nor the static TABLE-arg twin
      (u_udtf_table_partition) can do;
    - ``AnalyzeResult(partitionBy=...)``: the FUNCTION requests its
      partitioning — Catalyst inserts the exchange on ``bucket`` and
      REJECTS a call that spells its own PARTITION BY (pinned), i.e.
      the partitioning contract lives with the function, not every
      call site;
    - ``AnalyzeResult(select=...)``: the function requests COLUMN
      PRUNING — only the numeric columns + the partition key cross the
      Python boundary even if the caller passes a wider table (the
      UDTF-side twin of the r12 pushFilters witness: pushdown through
      a Python boundary, requested from the Python side).

    The profile itself uses count/min/max only — exact under any row
    order and any accumulation grouping (no float-sum order
    sensitivity), so the oracle is a plain per-bucket GROUP BY.

    Scale: one exchange on the requested key, per-group O(#numeric
    cols) state, pruned Arrow transfer — the general shape of a
    schema-driven profiler at 100 TB (and the reason partitionBy-from-
    analyze matters: callers cannot forget the exchange)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructType,
    )
    from pyspark.sql.udtf import (
        AnalyzeArgument,
        AnalyzeResult,
        PartitioningColumn,
        SelectedColumn,
    )

    @udtf
    class NumericProfile:
        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            if not t.isTable:
                raise ValueError("numeric_profile expects TABLE(...) input")
            numeric = [
                f.name
                for f in t.dataType.fields
                if isinstance(f.dataType, (DoubleType, LongType))
                and f.name != "bucket"
            ]
            if not numeric:
                raise ValueError("numeric_profile: no numeric columns")
            schema = (
                StructType()
                .add("bucket", LongType())
                .add("col_name", StringType())
                .add("n", LongType())
                .add("min_v", DoubleType())
                .add("max_v", DoubleType())
            )
            return AnalyzeResult(
                schema=schema,
                partitionBy=[PartitioningColumn("bucket")],
                select=[SelectedColumn("bucket")]
                + [SelectedColumn(c) for c in numeric],
            )

        def __init__(self):
            self._bucket = None
            self._stats: dict = {}

        def eval(self, row):
            d = row.asDict()
            self._bucket = d.pop("bucket")
            for name, v in d.items():
                if v is None:
                    continue
                st = self._stats.get(name)
                if st is None:
                    self._stats[name] = [1, v, v]
                else:
                    st[0] += 1
                    if v < st[1]:
                        st[1] = v
                    if v > st[2]:
                        st[2] = v

        def terminate(self):
            for name in sorted(self._stats):
                n, lo, hi = self._stats[name]
                yield self._bucket, name, n, float(lo), float(hi)

    spark.udtf.register("numeric_profile", NumericProfile)
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 16).cast("long").alias("bucket"),
        F.round("value", 4).alias("value"),
        F.unix_millis("ts").alias("ts_ms"),
        F.col("event_type"),  # non-numeric: must be pruned, not profiled
    )
    ev.createOrReplaceTempView("ev_udtf_profile")
    return spark.sql(
        "SELECT * FROM numeric_profile(TABLE(ev_udtf_profile))"
    )
