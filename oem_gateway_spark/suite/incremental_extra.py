"""Round-7 additions: incremental/mergeable plan shapes.

Each targets a plan shape no existing registry query covers (the r5
VERDICT #8 discipline — the witness budget is the scarce resource, so
every new query must name the shape it adds):

- ``q_ivm_delta``: incremental materialized-view maintenance — the
  updated MV is produced by aggregating ONLY the delta batch and
  outer-merging it with the stored MV (cost O(|delta| + |MV|)), never
  re-scanning the base fact.  The oracle is the full recompute, so the
  IVM contract (incremental == recompute) is driver-checked exactly.
  No existing query maintains a derived table incrementally
  (d_exact_dedup_increment anti-joins a fingerprint store but emits
  rows, not a merged aggregate state).
- ``q_cdc_changelog``: snapshot diff emitted as a RETRACT-STREAM
  changelog — updates expand to TWO ordered rows (update_before with
  the old image, update_after with the new), the Debezium/Flink
  changelog contract an incremental consumer replays.  q_snapshot_diff
  classifies one row per key; the expansion (posexplode over a
  change-kind array) plus the op-ordering column is the new surface.
  Together with q_merge_upsert (the apply side) the registry now
  witnesses BOTH directions of the CDC loop.
- ``q_bitmap_distinct``: EXACT distinct counts via mergeable bitmap
  partials — bucket = key >> 6, one BIT_OR-ed 64-bit word per bucket,
  popcount-summed per group.  The exact counterpart of
  q_hll_partial_merge's approximate sketch: partials are tiny,
  mergeable, and storable, yet the count is exact; q_distinct_agg by
  contrast shuffles expanded distinct values.  This is the
  materialized-rollup-store architecture for exact COUNT(DISTINCT)
  over a bounded integer key domain.
- ``q_interval_union``: sweep-line interval-union length per key —
  overlapping intervals are merged into islands via a running-max-end
  window (prefix max over the start-ordered intervals), then one
  aggregate per island.  No existing query performs interval
  COALESCING: q_sessionize merges points by gap, q_range_join matches
  intervals but never unions them.
- ``stream_session_assign`` (suite twin of
  streaming/state.py::session_assign_stream): streaming session
  ASSIGNMENT with MERGING-INTERVAL state — the state shape the
  custom-state twin family lacked (scalars, dicts, bounded lists are
  covered; the engine-managed session_window AGGREGATION is witnessed
  separately by stream_session).  Per-event output labels events for
  joining back, which no built-in session operator emits.  Exact
  integer-ms arithmetic, shared gaps-and-islands SQL oracle, same
  4-ordered-micro-batch replay as stream_ewma.

Reference parity: the reference gateway (SURVEY.md ~l.120) has no
analytics engine; these extend the §2.6 engine surface for the
LLM-pipeline brief (incremental corpus-stats maintenance between
crawls; change feeds between pipeline runs; exact dedup-key counting
over shard stores).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.registry import query

# ----------------------------------------------------------------- q_ivm_delta

# The MV covers orders strictly before the split; the delta batch is
# everything at/after it (~10% of rows at any sf — orderdates span
# 1995..2001-08, fixed by the generator).
_IVM_SPLIT = "2001-01-01"

# Integer cents (floor(x*100 + 0.5)) on BOTH sides: library round() flips
# a penny between engines at half-cent boundaries, and summing doubles is
# accumulation-order-dependent (driver-contract gotcha, r6).
_CENTS_SQL = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


def _cents(col: str) -> F.Column:
    return F.floor(F.col(col) * 100 + 0.5)


def _ivm_store_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir + source fingerprint + pid) the stored MV:
    per (o_orderpriority, month) counts and revenue cents over the
    pre-split base.  Per-PID path with dead-owner GC (shared helper —
    parallel pytest sessions must not race on a shared store); the
    ORDERS fingerprint invalidates replicas if the actual source table
    regenerates (the r3 TIMESTAMP_NTZ incident; code-review r7 caught
    this keyed to events)."""
    from oem_gateway_spark.streaming.rollup import pid_scoped_dir
    from oem_gateway_spark.suite.streaming_batch import _source_fp

    safe = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    fp = _source_fp(sf_dir, table="orders")
    path = pid_scoped_dir("/root/repo/.scratch/ivm", f"mv_{safe}_{fp}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderdate") < F.lit(_IVM_SPLIT).cast("timestamp"))
            .groupBy(
                "o_orderpriority",
                F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            )
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(_cents("o_totalprice")).alias("revenue_cents"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


@query(
    "q_ivm_delta",
    oracle=f"""
    SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({_CENTS_SQL}) AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY o_orderpriority, strftime(o_orderdate, '%Y-%m')
    """,
)
def q_ivm_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-(priority,
    month) revenue MV is updated by aggregating ONLY the delta batch
    (orders at/after the split, ~10% of rows) and outer-merging the
    delta partials into the STORED MV — coalesce-add on count/sum, the
    textbook self-maintainable-aggregate merge.  The base fact is never
    re-scanned: the plan reads the kilobyte MV store plus the delta
    slice (the split predicate pushes down to the orders scan).

    New plan surface: every other aggregate in the registry recomputes
    from the fact table; this witnesses the MAINTENANCE contract —
    incremental result == full recompute, exactly — which is what makes
    100 TB daily-refresh rollups affordable (aggregate the day's
    partition, merge into the store; count/sum/min/max are
    self-maintainable under inserts, so the merge needs no base access).

    The ORACLE is the full recompute over all of orders: the driver
    hash-compares the incrementally-maintained MV against it, so any
    drift between the store, the delta aggregation, or the merge
    arithmetic fails loudly.  Money sums are integer cents on both
    sides (order-independent; the r6 dtype lesson says CAST the SUM
    itself, not just its input)."""
    mv = spark.read.parquet(_ivm_store_path(spark, sf_dir))
    delta = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_IVM_SPLIT).cast("timestamp"))
        .groupBy(
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.count("*").alias("d_n"),
            F.sum(_cents("o_totalprice")).alias("d_cents"),
        )
    )
    mv_s = mv.select(
        "o_orderpriority", "month",
        F.col("n_orders").alias("b_n"), F.col("revenue_cents").alias("b_cents"),
    )
    return (
        mv_s.join(delta, ["o_orderpriority", "month"], "full_outer")
        .select(
            "o_orderpriority",
            "month",
            (
                F.coalesce(F.col("b_n"), F.lit(0))
                + F.coalesce(F.col("d_n"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("b_cents"), F.lit(0))
                + F.coalesce(F.col("d_cents"), F.lit(0))
            ).cast("long").alias("revenue_cents"),
        )
    )


# ------------------------------------------------------------- q_cdc_changelog

@query(
    "q_cdc_changelog",
    oracle=f"""
    WITH old_snap AS (
      SELECT o_orderkey AS k, {_CENTS_SQL} AS v
      FROM orders WHERE o_orderkey % 7 <> 0
    ), new_snap AS (
      SELECT o_orderkey AS k,
             {_CENTS_SQL}
               + CASE WHEN o_orderkey % 5 = 0 THEN 123 ELSE 0 END AS v
      FROM orders WHERE o_orderkey % 11 <> 0
    ), j AS (
      SELECT COALESCE(o.k, n.k) AS o_orderkey, o.k AS ok, n.k AS nk,
             o.v AS ov, n.v AS nv
      FROM old_snap o FULL OUTER JOIN new_snap n ON o.k = n.k
    )
    SELECT o_orderkey, 'insert' AS op, nv AS val_cents,
           CAST(1 AS INT) AS op_order
    FROM j WHERE ok IS NULL
    UNION ALL
    SELECT o_orderkey, 'delete', ov, 1 FROM j WHERE nk IS NULL
    UNION ALL
    SELECT o_orderkey, 'update_before', ov, 1
    FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL AND ov <> nv
    UNION ALL
    SELECT o_orderkey, 'update_after', nv, 2
    FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL AND ov <> nv
    """,
)
def q_cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff emitted as a RETRACT-STREAM changelog: every update
    expands to TWO ordered rows — update_before carrying the old image
    (the retraction) and update_after carrying the new — alongside
    plain insert/delete rows, each with an op_order a consumer applies
    within-key ascending.  This is the Debezium/Flink changelog
    contract; replaying it against the old snapshot reproduces the new
    one exactly (q_merge_upsert witnesses that apply side, closing the
    CDC loop).

    New plan surface vs q_snapshot_diff (one classified row per key):
    the change-kind ARRAY + posexplode row expansion — a diff join
    whose output cardinality is data-dependent per row (0 rows for the
    unchanged majority, 1 for insert/delete, 2 for updates).  At
    100 TB the unchanged rows never leave the join (the filter is on
    the joined row before expansion), so changelog size tracks drift,
    not table size.

    Both snapshots are synthesized deterministically from orders
    (%7 keys absent from old = inserts, %11 absent from new = deletes,
    %5 repriced +123 cents = updates) so the engines diff identical
    inputs; values are integer cents end to end."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _cents("o_totalprice").alias("cents")
    )
    old_snap = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("ok"), F.col("cents").alias("ov")
    )
    new_snap = o.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("nk"),
        (
            F.col("cents")
            + F.when(F.col("o_orderkey") % 5 == 0, F.lit(123)).otherwise(F.lit(0))
        ).alias("nv"),
    )
    j = old_snap.join(new_snap, old_snap.ok == new_snap.nk, "full_outer")
    entry = lambda op, val: F.struct(  # noqa: E731
        F.lit(op).alias("op"), val.cast("long").alias("val_cents")
    )
    changes = F.when(
        F.col("ok").isNull(), F.array(entry("insert", F.col("nv")))
    ).when(
        F.col("nk").isNull(), F.array(entry("delete", F.col("ov")))
    ).when(
        F.col("ov") != F.col("nv"),
        F.array(entry("update_before", F.col("ov")), entry("update_after", F.col("nv"))),
    ).otherwise(F.array())
    return (
        j.select(
            F.coalesce("ok", "nk").alias("o_orderkey"), changes.alias("chg")
        )
        .filter(F.size("chg") > 0)
        .select("o_orderkey", F.posexplode("chg").alias("pos", "c"))
        .select(
            "o_orderkey",
            F.col("c.op").alias("op"),
            F.col("c.val_cents").alias("val_cents"),
            (F.col("pos") + 1).cast("int").alias("op_order"),
        )
    )


# ----------------------------------------------------------- q_bitmap_distinct

@query(
    "q_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct part counts per return flag via mergeable bitmap
    partials: bucket = l_partkey >> 6, each bucket folds to ONE 64-bit
    word (BIT_OR of 1 << (key & 63)), and the group's distinct count is
    the popcount sum of its words.

    New plan surface: a two-level aggregation whose first level is a
    mergeable FIXED-SIZE partial — the exact counterpart of
    q_hll_partial_merge (approximate sketch, same merge algebra) and
    the shuffle-frugal alternative to q_distinct_agg (which expands
    distinct values through the exchange).  The shuffle carries at most
    |groups| x |key_domain|/64 words regardless of row count; the words
    are storable, so a partitioned lakehouse can keep per-partition
    bitmap files and answer exact COUNT(DISTINCT) over any partition
    subset by OR-merging kilobytes — the roaring-bitmap architecture,
    expressed in three built-in JVM functions (shiftleft/bit_or/
    bit_count), zero Python in the hot path.

    Domain note: exactness needs a bounded integer key domain
    (l_partkey <= 200k*sf — at 100 TB, 2e8 keys = 25 MB of words per
    group, still partition-local); unbounded/string keys take the HLL
    path instead.  The oracle is Spark-independent COUNT(DISTINCT)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    # expr() because the Python shiftleft/shiftright wrappers only take a
    # literal bit count; SQL accepts a column expression.
    word = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(l_partkey % 64 AS INT))")
    return (
        li.groupBy("l_returnflag", F.expr("l_partkey DIV 64").alias("bucket"))
        .agg(F.bit_or(word).alias("bits"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.bit_count("bits")).cast("long").alias("n_distinct"))
    )


# ------------------------------------------------------------ q_interval_union

# Deterministic synthetic intervals: each event opens one of 1..7
# ten-minute-multiple windows; the %5 user slice keeps per-key interval
# counts high enough that islands actually merge at every sf, and wide
# enough (>=3 users even at sf0.001) that the witness covers many keys.
_IU_SLICE = 5
_IU_UNIT_MS = 600_000


@query(
    "q_interval_union",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(epoch_ms(ts) AS BIGINT) AS s,
             CAST(epoch_ms(ts) AS BIGINT)
               + (event_id % 7 + 1) * {_IU_UNIT_MS} AS e
      FROM events WHERE user_id % {_IU_SLICE} = 0
    ), marked AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN s > COALESCE(max(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    ), merged AS (
      SELECT user_id, island, min(s) AS island_s, max(e) AS island_e
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(island_e - island_s) AS BIGINT) AS covered_ms
    FROM merged GROUP BY user_id
    """,
)
def q_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval union per key: overlapping intervals merge
    into islands via a PREFIX-MAX-END window (an interval starts a new
    island iff it begins after every earlier interval ends), then one
    aggregate per island yields the union's covered length — the
    classic O(n log n) sweep, expressed as one shuffle on the key plus
    two window passes and two aggregates.

    New plan surface: interval COALESCING.  q_sessionize merges point
    events by inactivity gap; q_range_join/q_asof_join match intervals
    against points; nothing in the registry unions the intervals
    themselves — the shape behind uptime/coverage accounting, ad-break
    merging, and span dedup in training-data pipelines (merging
    overlapping char spans flagged by independent PII/quality
    scanners).

    Intervals are synthesized deterministically from events (start =
    event ms, length = (event_id mod 7 + 1) x 10 min) so both engines
    sweep identical inputs; all arithmetic is integer ms.  Island
    detection is tie-stable: equal starts cannot open a second island
    (s > prefix-max-end is false once the first of the tie lands).

    Scale: windows partition by user_id — no global pass; per-key state
    is the running max, so skew degrades to a per-key sort, not a
    cross-key shuffle."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % _IU_SLICE == 0
    )
    ms = F.unix_millis("ts")
    iv = ev.select(
        "user_id",
        "event_id",
        ms.alias("s"),
        (ms + (F.col("event_id") % 7 + 1) * _IU_UNIT_MS).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # SAME total order (s, event_id) as w_prev — with a different tie
    # order, a same-start interval could land before the island-opening
    # row in the cumulative sum and be absorbed into the PREVIOUS island,
    # overcounting covered_ms by the inter-island gap.
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1)
        .otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_cum))
    return (
        islands.groupBy("user_id", "island")
        .agg(F.min("s").alias("island_s"), F.max("e").alias("island_e"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.sum(F.col("island_e") - F.col("island_s"))
            .cast("long")
            .alias("covered_ms"),
        )
    )


# -------------------------------------------------------- stream_session_assign

_SESSION_GAP_MS = 21_600_000  # 6h: the %50 user slice averages ~3.5h gaps,
# so sessions both merge and split at every sf — a boundary-free gap
# (no event pair lands exactly ON the threshold; integer ms both sides).


@query(
    "stream_session_assign",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id,
             CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
             lag(CAST(epoch_ms(ts) AS BIGINT)) OVER (
               PARTITION BY user_id
               ORDER BY CAST(epoch_ms(ts) AS BIGINT), event_id) AS prev_ms
      FROM events WHERE user_id % 50 = 0
    ), marked AS (
      SELECT user_id, event_id, ts_ms,
             CASE WHEN prev_ms IS NULL
                    OR ts_ms - prev_ms > {_SESSION_GAP_MS}
                  THEN ts_ms END AS boundary
      FROM seq
    )
    SELECT user_id AS node, event_id, ts_ms,
           CAST(max(boundary) OVER (
             PARTITION BY user_id ORDER BY ts_ms, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_start_ms
    FROM marked
    """,
)
def stream_session_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stateful streaming session assignment
    (applyInPandasWithState): the telemetry replays as FOUR
    time-ordered micro-batches and every event is labeled with its
    6h-gap session's start timestamp, the open session carried across
    batch boundaries as MERGING-INTERVAL state — the state shape the
    CUSTOM-state twin family (scalar ewma/locf, dict counters, bounded
    top-k list) didn't carry.  Distinct from ``stream_session``, which
    witnesses the ENGINE-MANAGED session_window aggregation (session
    counts in complete mode): this is the same merging semantics
    hand-held in applyInPandasWithState with per-event ASSIGNMENT
    output — the form that labels events for joining back, which no
    built-in session operator emits.

    The batch twin is gaps-and-islands (boundary = session-opening
    event's ms; running MAX(boundary) = the session start every later
    in-session event inherits).  All arithmetic is integer ms, so the
    streaming answer equals the SQL oracle row for row — no tolerance."""
    from oem_gateway_spark.streaming import state as ST
    from oem_gateway_spark.suite.quality_extra import _ordered_event_replay
    from oem_gateway_spark.suite.streaming_batch import _run_to_table

    stream = _ordered_event_replay(spark, sf_dir)
    out = ST.session_assign_stream(
        stream,
        gap_ms=_SESSION_GAP_MS,
        key_col="user_id",
        ts_ms_col="ts_ms",
        id_col="event_id",
        timeout_minutes=None,
    )
    return _run_to_table(out, mode="update", shuffle_partitions=8)


# ------------------------------------------------- wave 2: round-7 additions

def _incremental_minhash_oracle(
    n_hashes: int = 8, n_bands: int = 4, min_equal: int = 6
) -> str:
    from oem_gateway_spark.suite.llm import DOC_OFFSET, _minhash_oracle

    rows = n_hashes // n_bands
    band_selects = []
    for b in range(n_bands):
        cols = " || '_' || ".join(
            f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {cols} AS bucket,"
            f" {', '.join(f'mh_{s}' for s in range(n_hashes))} FROM sig"
        )
    bands = " UNION ALL ".join(band_selects)
    eq = " + ".join(
        f"CASE WHEN n.mh_{s} = s.mh_{s} THEN 1 ELSE 0 END"
        for s in range(n_hashes)
    )
    return f"""
    WITH sig AS ({_minhash_oracle(n_hashes)}),
    bands AS ({bands}),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, s.doc_id AS store_id,
             CAST({eq} AS INT) AS n_equal_minhash
      FROM bands n JOIN bands s USING (band, bucket)
      WHERE n.doc_id >= {DOC_OFFSET} AND s.doc_id < {DOC_OFFSET}
    )
    SELECT new_id, store_id, n_equal_minhash
    FROM cand WHERE n_equal_minhash >= {min_equal}
    """


@query("d_incremental_minhash", oracle=_incremental_minhash_oracle())
def d_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl-vs-store near-dup detection: the NEW batch (the
    corpus's constructed perturbed twins, doc_id >= DOC_OFFSET) is
    LSH-banded and BROADCAST against the store's banded signatures —
    an asymmetric probe join that never self-joins the store.

    New plan surface: every other LSH query (d_minhash_lsh_pairs,
    d_simhash_pairs, d_setsim_prefix_join) is a SYMMETRIC self-join —
    right for a one-shot corpus pass, quadratic waste for the daily
    pipeline reality where yesterday's store-store pairs are already
    known.  Here the store side never shuffles: its banded rows stream
    map-side past the broadcast batch buckets (plan test pins
    BroadcastHashJoin), which at 100 TB is the difference between
    re-shuffling the corpus every day and broadcasting the day's crawl.
    d_exact_dedup_increment witnesses the same architecture for EXACT
    fingerprints; this is its near-dup sibling.

    Recall contract: bands/buckets are identical to the symmetric
    operator's, so batch-vs-store recall equals the symmetric join's
    cross-side recall (the constructed twin classes in the corpus give
    the expected hits); candidates verify with >= 6/8 equal components
    exactly like d_minhash_lsh_pairs."""
    from oem_gateway_spark.operators.dedup import minhash_probe_pairs
    from oem_gateway_spark.suite.llm import DOC_OFFSET, _corpus

    corpus = _corpus(spark, sf_dir)
    return minhash_probe_pairs(corpus, F.col("doc_id") >= DOC_OFFSET)


# -------------------------------------------------------- q_schema_evolution

def _evolution_dir(spark: SparkSession, sf_dir: str) -> str:
    """Two parquet files with DIFFERENT schemas in one directory: v1
    (o_orderkey, cents) for keys %3 != 0, v2 adds o_orderpriority for
    keys %3 == 0 — the lakehouse reality after a column is added
    mid-stream.  Per-PID scratch with dead-owner GC (shared helper) +
    ORDERS source fingerprint, the bucketed-table discipline."""
    from oem_gateway_spark.streaming.rollup import pid_scoped_dir
    from oem_gateway_spark.suite.streaming_batch import _source_fp

    safe = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    fp = _source_fp(sf_dir, table="orders")
    path = pid_scoped_dir(
        "/root/repo/.scratch/evolution", f"orders_{safe}_{fp}"
    )
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            _cents("o_totalprice").cast("long").alias("cents"),
            "o_orderpriority",
        )
        (
            o.filter(F.col("o_orderkey") % 3 != 0)
            .select("o_orderkey", "cents")
            .write.mode("overwrite")
            .parquet(os.path.join(path, "v1"))
        )
        (
            o.filter(F.col("o_orderkey") % 3 == 0)
            .write.mode("overwrite")
            .parquet(os.path.join(path, "v2"))
        )
        open(marker, "w").close()
    return path


@query(
    "q_schema_evolution",
    oracle=f"""
    SELECT CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END
             AS o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({_CENTS_SQL}) AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: one directory holds parquet files written
    BEFORE and AFTER a column was added; ``mergeSchema`` unions the
    footers into one schema and back-fills the missing column with
    NULL for old files — the lakehouse column-add contract, witnessed
    end to end (old rows land in the NULL priority group).

    New engine surface: the warehouse/layout family covers partitioned,
    bucketed, z-ordered, and hive-pruned layouts, but every one of them
    is schema-HOMOGENEOUS; no query witnessed reading through a schema
    change, which is how every long-lived 100 TB table actually looks
    (per-file footer schemas negotiated at scan time — column-add needs
    no rewrite of old data).  The oracle reproduces the synthesis from
    the orders view (old files' rows get NULL priority), so the driver
    hash-checks the merged read, not just its row count.

    Scale note: mergeSchema=true footer-merges every file at planning
    time — right for a witness, wrong as a steady-state default (use
    the table catalog's committed schema at 100 TB); the cost is
    planning-side and bounded by file count either way."""
    d = _evolution_dir(spark, sf_dir)
    merged = (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(d, "v1"), os.path.join(d, "v2"))
    )
    return merged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


# ------------------------------------------------------- q_time_weighted_avg

@query(
    "q_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents,
             lead(CAST(epoch_ms(ts) AS BIGINT)) OVER (
               PARTITION BY user_id
               ORDER BY CAST(epoch_ms(ts) AS BIGINT), event_id) AS next_ms
      FROM events WHERE event_type = 'view'
    )
    SELECT user_id,
           CAST(max(ts_ms) - min(ts_ms) AS BIGINT) AS dur_ms,
           CAST(sum(CASE WHEN next_ms IS NOT NULL
                         THEN v_cents * (next_ms - ts_ms) END) AS BIGINT)
             AS energy_cents_ms
    FROM seq GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted integration of an irregularly-sampled signal: each
    reading holds (LOCF) until the key's next reading, so the integral
    is sum(value x holding-duration) — the energy metric (W -> Wh) the
    reference gateway's emoncms backend derives from exactly this kind
    of feed (SURVEY ~l.120: the gateway ships raw samples; integration
    is the canonical downstream consumer).  Emitted as an integer
    numerator (cents x ms) and duration so the result is exact — the
    caller divides; an in-query division would reintroduce the
    cross-engine float hazard the integer-cents discipline exists to
    avoid.

    New semantic surface: the timeseries family resamples
    (q_resample_interpolate), gap-fills (q_time_series_gap_fill), and
    carries forward (q_locf_fill) — all producing per-point values;
    nothing integrates OVER the irregular spacing (a plain avg() is
    wrong precisely because the spacing is irregular: a 1-hour-held
    reading must weigh 60x a 1-minute-held one).

    Shape: one key shuffle, one lead() window, one aggregate — the
    sessionize plan family, with the window's lead feeding integer
    products that sum order-independently."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    ms = F.unix_millis("ts")
    w = Window.partitionBy("user_id").orderBy(ms, "event_id")
    seq = ev.select(
        "user_id",
        ms.alias("ts_ms"),
        F.floor(F.col("value") * 100 + 0.5).alias("v_cents"),
        F.lead(ms).over(w).alias("next_ms"),
    )
    return seq.groupBy("user_id").agg(
        (F.max("ts_ms") - F.min("ts_ms")).cast("long").alias("dur_ms"),
        F.sum(
            F.when(
                F.col("next_ms").isNotNull(),
                F.col("v_cents") * (F.col("next_ms") - F.col("ts_ms")),
            )
        ).cast("long").alias("energy_cents_ms"),
    )


# ---------------------------------------------------------- q_variant_shred

@query(
    "q_variant_shred",
    oracle="""
    WITH shred AS (
      SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT CAST(k % 10 AS INT) AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k
    FROM shred GROUP BY CAST(k % 10 AS INT)
    """,
)
def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding through Spark 4's VARIANT type:
    ``parse_json`` parses each props payload ONCE into the binary
    variant encoding, ``variant_get`` extracts a typed path from it —
    the modern engine path for JSON at scale, vs the string-walking
    ``get_json_object`` (q_json_agg) which re-parses the text per
    access.

    New engine surface: the registry's semi-structured coverage
    (get_json_object in q_json_agg/entry, from_json->map in
    scalar_extra) predates VARIANT; no query witnessed the variant
    encode/extract pair that Spark 4 positions as the default for
    open-schema event payloads (one parse, many cheap typed gets — at
    100 TB with wide JSON and multiple extractions per row, the parse
    amortization is the whole game; with a single key the two paths
    tie, which is why this witnesses semantics, not speed).

    The extraction is typed at the engine level (variant_get ->
    'int'), so the oracle's CAST(json_extract_string AS INTEGER) meets
    it in exact integer space; the aggregate is the one exchange."""
    ev = load_table(spark, sf_dir, "events").select(
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("k")
    )
    return ev.groupBy((F.col("k") % 10).cast("int").alias("k_bucket")).agg(
        F.count("*").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
    )
