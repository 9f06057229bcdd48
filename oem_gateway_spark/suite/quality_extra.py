"""Quality/telemetry suite, cycle 3: EWMA smoothing, dedup recall
against constructed ground truth, and bounded-depth reachability — an
exponential smoother whose arithmetic is cross-engine exact, the
end-to-end QA number for the whole near-dup stack, and the frontier-
iteration graph pattern (BFS) the CC/PageRank family didn't yet show.

Determinism notes:
- q_ewma_halflife uses alpha = 0.5, so every decay factor is an exact
  power of two (0.5^k is exactly representable and every pow
  implementation returns it exactly); the windowed sum of
  x_i * 0.5^(t-i) terms may accumulate in different orders across
  engines (segment-tree vs sequential) — drift ~1e-16 of values ~100,
  far under round(..., 6).
- d_lsh_recall_by_class counts in integers (found / total per class).
- q_reachability is set arithmetic (integer node ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.cooc import COOC_MEMBERS_SQL, capped_cooc_edges
from oem_gateway_spark.suite.llm import DOC_OFFSET
from oem_gateway_spark.suite.registry import query


def ewma_scaled_term() -> Column:
    """The 2^t-scaled EWMA term over columns ``t``/``value``, guarded:
    the exact-scaling trick overflows double past t ~ 1020, so any
    series reaching t = 1000 fails the job loudly (raise_error is woven
    into the term itself — column pruning cannot elide it) instead of
    silently producing inf/NaN.  Unbounded series belong to the
    stream_ewma O(1)-state twin, which never scales by 2^t."""
    return (
        F.when(
            F.col("t") >= 1000,
            F.raise_error(
                F.lit(
                    "q_ewma_halflife: series longer than 1000 rows would "
                    "overflow the 2^t exact-scaling trick; use the "
                    "stream_ewma O(1)-state twin for unbounded series"
                )
            ).cast("double"),
        )
        .when(F.col("t") == 1, F.col("value") * F.pow(F.lit(2.0), F.col("t")))
        .otherwise(F.col("value") * F.pow(F.lit(2.0), F.col("t") - 1))
    )


@query(
    "q_ewma_halflife",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value,
             row_number() OVER w AS t
      FROM events
      WHERE user_id % 50 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT s.user_id AS node, s.event_id,
           round(sum(CASE WHEN p.t = 1 THEN p.value * power(0.5, s.t - 1)
                          ELSE p.value * power(0.5, s.t - p.t + 1) END),
                 6) AS ewma
    FROM seq s JOIN seq p ON p.user_id = s.user_id AND p.t <= s.t
    GROUP BY s.user_id, s.event_id
    """,
)
def q_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per node (alpha = 0.5,
    seeded at the first reading): ewma_t = 0.5*x_t + 0.5*ewma_{t-1} —
    the telemetry smoother every monitoring stack runs.  The recurrence
    unrolls to a weighted window sum (x_i * 0.5^(t-i), first term
    keeping its full residual weight), so the operator is ONE window
    pass — no recursion, no UDF, no state.

    alpha = 0.5 is chosen deliberately: every weight is an exact power
    of two, making results bit-stable across engines and partitionings
    (module docstring).  Terms below 2^-1074 underflow to zero
    identically in both engines.

    Plan: one shuffle on user_id; the weighted sum evaluates over a
    running frame.  At 100 TB the frame is the cost — the O(1)-state
    streaming twin is the recurrence itself in
    applyInPandasWithState (counter_deltas' shape).

    The oracle replays the same unrolled sum via a self-join (needn't
    scale, only agree)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 50 == 0
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "value",
        F.row_number().over(w_seq).alias("t"),
    )
    # Weighted running sum: each row contributes value * 0.5^(t_cur - t),
    # with the first row's weight doubled (seeding: ewma_1 = x_1).  The
    # trick making this a single window pass: accumulate
    # value * 2^t (exact scaling) and rescale by 2^-t_cur afterwards —
    # both scalings are exact powers of two, so this equals the direct
    # sum term-for-term.  2^t overflows double at t ~ 1024; the guard
    # below fails the job loudly (instead of silently returning inf)
    # if a series ever grows past t=1000 — unbounded series belong to
    # the stream_ewma twin, whose O(1) recurrence never scales by 2^t.
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scaled = seq.withColumn("term", ewma_scaled_term())
    return (
        scaled.withColumn("acc", F.sum("term").over(w_run))
        .select(
            F.col("user_id").alias("node"),
            "event_id",
            F.round(
                F.col("acc") * F.pow(F.lit(2.0), -F.col("t") - 1) * 2, 6
            ).alias("ewma"),
        )
    )


def _lsh_recall_oracle() -> str:
    from oem_gateway_spark.suite.llm import _lsh_pairs_oracle

    return f"""
    WITH pairs AS ({_lsh_pairs_oracle()}),
    truth AS (
      SELECT doc_id, doc_id + {DOC_OFFSET} AS twin,
             CASE doc_id % 3 WHEN 0 THEN 'exact'
                             WHEN 1 THEN 'suffix'
                             ELSE 'truncation' END AS dup_class
      FROM documents
    )
    SELECT t.dup_class,
           CAST(count(*) AS BIGINT) AS n_truth,
           CAST(count(p.id_a) AS BIGINT) AS n_found,
           round(count(p.id_a) * 1.0 / count(*), 6) AS recall
    FROM truth t
      LEFT JOIN pairs p ON p.id_a = t.doc_id AND p.id_b = t.twin
    GROUP BY t.dup_class
    """


@query("d_lsh_recall_by_class", oracle=_lsh_recall_oracle())
def d_lsh_recall_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup QA: recall of the MinHash-LSH pair detector
    against CONSTRUCTED ground truth.  The suite corpus contains, for
    every document, a known twin (exact copy / suffix-perturbed /
    half-truncated by doc_id mod 3) — so the true positive set is
    known exactly, and this query reports how many of each class the
    LSH stack actually caught.  Expected structure: exact ~1.0, suffix
    high, truncation low (Jaccard of a half-document is ~1/2, below
    the 6/8-signature threshold — exactly the gap
    d_minhash_containment exists to close).  This is the audit that
    tells a 100 TB pipeline operator what their dedup thresholds MISS,
    measured in-engine with no external eval harness.

    Plan: ground truth is a map-side projection of documents; the LSH
    pair list (tiny) joins it left; counts are |classes| groups."""
    from oem_gateway_spark.operators.dedup import minhash_lsh_pairs
    from oem_gateway_spark.suite.llm import _corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    truth = docs.select(
        "doc_id",
        (F.col("doc_id") + DOC_OFFSET).alias("twin"),
        F.when(F.col("doc_id") % 3 == 0, "exact")
        .when(F.col("doc_id") % 3 == 1, "suffix")
        .otherwise("truncation")
        .alias("dup_class"),
    )
    pairs = minhash_lsh_pairs(_corpus(spark, sf_dir)).select(
        "id_a", "id_b", F.lit(1).alias("found")
    )
    joined = truth.join(
        pairs,
        (F.col("doc_id") == F.col("id_a")) & (F.col("twin") == F.col("id_b")),
        "left",
    )
    return joined.groupBy("dup_class").agg(
        F.count("*").alias("n_truth"),
        F.count("found").alias("n_found"),
        F.round(F.count("found") * 1.0 / F.count("*"), 6).alias("recall"),
    )


_REACH_EDGES_SQL = f"""
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM ({COOC_MEMBERS_SQL}) a JOIN ({COOC_MEMBERS_SQL}) b
        ON a.l_orderkey = b.l_orderkey
      WHERE a.l_suppkey <> b.l_suppkey
"""

_REACH_DEPTH = 3


@query(
    "q_reachability",
    oracle=f"""
    WITH RECURSIVE
    edges AS ({_REACH_EDGES_SQL}),
    seed AS (SELECT min(src) AS s FROM edges),
    walk(node, depth) AS (
      SELECT s, 0 FROM seed
      UNION
      SELECT e.dst, w.depth + 1
      FROM walk w JOIN edges e ON w.node = e.src
      WHERE w.depth < {_REACH_DEPTH}
    )
    SELECT node AS suppkey, CAST(min(depth) AS INT) AS min_depth
    FROM walk GROUP BY node
    """,
)
def q_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS from the smallest supplier over the
    co-occurrence graph: every node within {_REACH_DEPTH} hops, with
    its minimum hop distance — the frontier-iteration pattern
    (recommendation walks, blast-radius queries) that complements the
    label-propagation (CC) and mass-propagation (PageRank) iteration
    shapes.

    Plan: edges build once and persist, partitioned on src; each round
    joins only the FRONTIER (nodes first reached last round — anti-
    joined against the visited set, so the per-round join input
    SHRINKS as the frontier saturates, rather than re-walking the
    whole reached set).  Each round's new-node set is eagerly
    localCheckpointed (r13 optimization): ``new`` is referenced twice
    per round (as the next frontier AND in the visited union) and
    ``visited`` twice again (anti-join probe + union), so without
    lineage truncation the early rounds re-execute ~2x per later
    round — the captured before-plan carried 386 Exchange nodes and
    the isolated wall was ~12 s at sf0.1 vs ~3 s for the linear-
    lineage PageRank twin over the same edges.  The checkpointed
    round states are node-count-sized (kilobytes); on a cluster use
    ``checkpoint()`` to the durable dir instead (same note as
    operators/graph.py).  The oracle replays reachability as a
    recursive CTE.

    Measured alternative (rejected): a broadcast-frontier variant that
    skips edge materialization and semi-joins the raw fact each round
    ran 2.5x SLOWER at sf0.1 — this co-occurrence graph is near
    complete, the frontier saturates after one hop, and every round
    re-scanned the fact.  Materialize edges when the walk will touch
    most of the graph; skip materialization only for narrow probes
    (small fan-out, very selective seeds).

    The membership relation is CAPPED per order before the self-join
    (suite/cooc.py — VERDICT r4: a hub order would otherwise emit
    |group|^2 pairs); recall contract and the repartition-then-dedup
    shuffle-elision documented there."""
    from oem_gateway_spark.operators.dedup import _own_cache

    edges = capped_cooc_edges(spark, sf_dir).persist()
    seed = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).alias("min_depth")
    )
    visited = seed
    frontier = seed.select("node")
    for depth in range(1, _REACH_DEPTH + 1):
        reached = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        # Truncate lineage BEFORE the dual reference (docstring): one
        # tiny eager job per round, node-count-sized blocks.
        new = reached.join(
            visited.select("node"), on="node", how="left_anti"
        ).localCheckpoint(eager=True)
        frontier = new
        visited = visited.unionByName(
            new.withColumn("min_depth", F.lit(depth))
        )
    out = visited.select(
        F.col("node").alias("suppkey"),
        F.col("min_depth").cast("int").alias("min_depth"),
    )
    return _own_cache(out, edges)


_SSSP_HOPS = 3


@query(
    "q_shortest_path_bounded",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (
      SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
             CAST(count(*) AS BIGINT) AS shared
      FROM ({COOC_MEMBERS_SQL}) a JOIN ({COOC_MEMBERS_SQL}) b
        ON a.l_orderkey = b.l_orderkey
      WHERE a.l_suppkey <> b.l_suppkey
      GROUP BY 1, 2),
    edges AS (SELECT src, dst,
                     CAST(ceil(100.0 / shared) AS BIGINT) AS w FROM pairs),
    seed AS (SELECT min(src) AS s FROM edges),
    walk(node, cost, depth) AS (
      SELECT s, CAST(0 AS BIGINT), 0 FROM seed
      UNION
      SELECT e.dst, w.cost + e.w, w.depth + 1
      FROM walk w JOIN edges e ON w.node = e.src
      WHERE w.depth < {_SSSP_HOPS}
    )
    SELECT node AS suppkey, CAST(min(cost) AS BIGINT) AS min_cost
    FROM walk GROUP BY node
    """,
)
def q_shortest_path_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop WEIGHTED shortest path (Bellman-Ford relaxation)
    from the smallest supplier over the co-occurrence graph, edge
    length = ceil(100 / shared-order-count) — strongly-connected
    suppliers are "close".  New plan shape vs the existing iterative
    family (r5 VERDICT #8): the iteration carries an ADDITIVE COST
    ACCUMULATOR merged by min-relaxation, where q_reachability's BFS
    tracks membership only (its depth is the round index — no
    data-dependent value rides the frontier) and d_pagerank re-derives
    all mass each round rather than monotonically improving a bound.
    The recursive-CTE oracle witnesses the same semantics declaratively
    (DuckDB explores cost-carrying walks; min per node agrees with the
    relaxation fixpoint because both enumerate exactly the <= {_SSSP_HOPS}-edge
    paths).  All arithmetic is integer -> exact cross-engine.

    Plan: weighted edges build once from the capped memberships (one
    self-join + count aggregate; cooc.py's fanout cap bounds the pair
    blowup), persist partitioned on src.  Each round joins only the
    IMPROVED frontier (nodes whose bound tightened last round — the
    delta-stepping trick), does a per-round map-side min-combine on
    dst, then min-merges into the running bounds; the frontier shrinks
    to empty as bounds converge, so late rounds are near-free.
    Each round's candidate set and merged bounds are eagerly
    localCheckpointed (r13 optimization): ``cand`` is referenced
    twice per round (improved-frontier filter + bounds union) and
    ``dist`` twice again (old-bounds probe + union), so without
    lineage truncation the early rounds re-execute ~2x per later
    round (the captured before-plan carried 214 Exchange nodes; same
    pathology and fix as q_reachability).  Round states are
    node-count-sized; on a cluster use ``checkpoint()`` instead."""
    from oem_gateway_spark.operators.dedup import _own_cache
    from oem_gateway_spark.suite.cooc import capped_order_members

    members = capped_order_members(spark, sf_dir)
    a, b = members.alias("a"), members.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(F.count("*").alias("shared"))
        .select("src", "dst", F.ceil(100.0 / F.col("shared")).alias("w"))
        .repartition("src")
        .persist()
    )
    seed = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("long").alias("cost")
    )
    dist = seed
    frontier = seed
    for _ in range(_SSSP_HOPS):
        # Truncate lineage at the two dual-referenced round states
        # (docstring): one tiny eager job each, node-count-sized.
        cand = (
            frontier.join(edges, frontier.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
        old = dist.select("node", F.col("cost").alias("old_cost"))
        frontier = (
            cand.join(old, "node", "left")
            .filter(
                F.col("old_cost").isNull()
                | (F.col("cost") < F.col("old_cost"))
            )
            .select("node", "cost")
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
    out = dist.select(
        F.col("node").alias("suppkey"), F.col("cost").alias("min_cost")
    )
    return _own_cache(out, edges)


def _ordered_event_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user_id%50 event slice as FOUR time-ordered micro-batches
    (file mtimes force batch order) — the replay harness every custom
    stateful twin in this module streams from (state must carry across
    batch boundaries to match the batch oracle).  Shared builder:
    streaming_batch.event_replay_batches (r8 code review extracted it
    from two hand-rolled copies); the dir tag keeps the original
    'ewma' name so existing fingerprinted replicas stay valid."""
    from oem_gateway_spark.suite.streaming_batch import event_replay_batches

    def slicer(frame: DataFrame):
        w = Window.orderBy("ts_ms", "event_id")
        return F.ntile(4).over(w) - 1

    return event_replay_batches(spark, sf_dir, "ewma-events", slicer)


@query(
    "stream_ewma",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value,
             row_number() OVER w AS t
      FROM events
      WHERE user_id % 50 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT s.user_id AS node, s.event_id,
           round(sum(CASE WHEN p.t = 1 THEN p.value * power(0.5, s.t - 1)
                          ELSE p.value * power(0.5, s.t - p.t + 1) END),
                 6) AS ewma
    FROM seq s JOIN seq p ON p.user_id = s.user_id AND p.t <= s.t
    GROUP BY s.user_id, s.event_id
    """,
)
def stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stateful streaming EWMA (applyInPandasWithState): the same
    telemetry replays as FOUR time-ordered micro-batches (file mtimes
    force batch order), so the smoother's state must carry across
    batch boundaries — and because every alpha=0.5 operation is an
    exact power-of-two scale, the streaming recurrence is BIT-IDENTICAL
    to the batch window twin (q_ewma_halflife) and shares its SQL
    oracle with no tolerance.  The strongest form of the unified
    batch/streaming contract this suite can state: not approximately
    equal — the same doubles."""
    from oem_gateway_spark.streaming import state as ST
    from oem_gateway_spark.suite.streaming_batch import _run_to_table

    stream = _ordered_event_replay(spark, sf_dir)
    out = ST.ewma_stream(
        stream,
        key_col="user_id",
        value_col="value",
        ts_ms_col="ts_ms",
        id_col="event_id",
        timeout_minutes=None,
    )
    result = out.select(
        "node", "event_id", F.round("ewma", 6).alias("ewma")
    )
    return _run_to_table(result, mode="update", shuffle_partitions=8)


_TOPK_K = 5


@query(
    "stream_topk_admission",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, value,
             row_number() OVER w AS t
      FROM events
      WHERE user_id % 50 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT s.user_id AS node, s.event_id,
           (sum(CASE WHEN p.value > s.value
                       OR (p.value = s.value AND p.event_id < s.event_id)
                     THEN 1 ELSE 0 END) < {_TOPK_K}) AS admitted
    FROM seq s JOIN seq p ON p.user_id = s.user_id AND p.t <= s.t
    GROUP BY s.user_id, s.event_id
    """,
)
def stream_topk_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online top-{_TOPK_K} admission per node, streamed: each reading is
    flagged ``admitted`` iff it entered its key's running top-{_TOPK_K}
    AT ARRIVAL (fewer than {_TOPK_K} earlier readings beat it; ties to
    the earlier event id), with the same 4-ordered-micro-batch replay
    as stream_ewma so the top-k list must survive batch boundaries.

    New state shape for the stream-batch-unification family (r5 VERDICT
    #8): a BOUNDED ORDERED COLLECTION (k best pairs per key, capped
    forever) where every existing stateful twin carries scalars
    (ewma/locf) or per-window counters — the state shape of streaming
    leaderboards, top-k alerting, and admission caches.  The batch twin
    is prefix-rank SQL: admitted iff strictly-better prefix count < k,
    equal to the running-list semantics because insertion + truncate
    preserves the exact prefix top-k (a discarded element can never
    re-enter: the top-k only improves).  Value comparisons are on the
    same doubles both sides, count arithmetic is integer — exact oracle.

    Scale: state is O(k) per key with O(log k) maintenance per event;
    the batch oracle's prefix self-join is the quadratic formulation
    the streaming operator exists to avoid."""
    from oem_gateway_spark.streaming import state as ST
    from oem_gateway_spark.suite.streaming_batch import _run_to_table

    stream = _ordered_event_replay(spark, sf_dir)
    out = ST.topk_admission_stream(
        stream,
        k=_TOPK_K,
        key_col="user_id",
        value_col="value",
        ts_ms_col="ts_ms",
        id_col="event_id",
        timeout_minutes=None,
    )
    return _run_to_table(out, mode="update", shuffle_partitions=8)
