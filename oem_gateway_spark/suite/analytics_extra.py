"""Analytics suite IV: corpus statistics, iterative graph ranking,
embedding compression, and table profiling — four operator families a
training-data pipeline leans on that the suite didn't yet witness.

Cross-engine determinism notes (these queries compare hash-exact against
DuckDB, so every float path is chosen to be bit-identical):

- t_tfidf_top_terms uses the LOG-FREE idf variant ``tf / df`` (a pure
  integer ratio -> one IEEE division, identical in both engines).
  ``ln()`` is a libm call with no cross-library correct-rounding
  guarantee — Java's Math.log and DuckDB's std::log can differ in the
  last ulp, which is enough to flip a top-k near-tie.
- d_pagerank emits ``rank * N`` (values O(1)) rounded to 6dp: the
  per-iteration contribution sums accumulate in different orders across
  engines, so the agreement bound is ~1e-12 — far inside the rounding.
- s_quantize_int8 ranks by the QUANTIZED dot product, an exact integer
  (|q| <= 127, 64 dims -> max 1,032,256 — exact in doubles), so the
  candidate ranking cannot drift; only the final recall is a ratio.

Ref: SURVEY.md §2.6 engine-beyond-reference surface (the reference
gateway has no analytics of any kind).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.functions import hashing as H
from oem_gateway_spark.functions import vectors as V
from oem_gateway_spark.suite.cooc import COOC_MEMBERS_SQL, capped_cooc_edges
from oem_gateway_spark.suite.registry import query


@query(
    "t_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({H.words_sql('text')}) AS term FROM documents
    ), tf AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT source, term, tf, df,
             round(tf / df, 6) AS score,
             row_number() OVER (PARTITION BY source
                                ORDER BY tf / df DESC, term) AS rk
      FROM tf JOIN df USING (term)
    )
    SELECT source, term, tf, df, score
    FROM scored WHERE rk <= 5
    """,
)
def t_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per corpus source: top-5 terms by tf-idf, where
    idf is the log-free ``1/df`` variant (module docstring) — df counts
    the number of SOURCES using the term, so terms every source shares
    score low and source-specific vocabulary surfaces.

    Plan: explode -> (source, term) counts is one shuffle with map-side
    combine; the df table derives from the ALREADY-AGGREGATED tf result
    (never re-scans the corpus) and is |vocab|-sized, re-aggregated on
    term; the top-5 window partitions by source.  At 100 TB the exploded
    token stream never materializes — it flows straight into the partial
    aggregate."""
    from oem_gateway_spark.operators.dedup import _own_cache

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(H.words(F.col("text"))).alias("term")
    )
    # tf feeds both the df derivation and the scoring join; persist so
    # the corpus tokenizes ONCE (pinned by test_tfidf_single_corpus_scan).
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("tf")).persist()
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df, "term").withColumn(
        "score_raw", F.col("tf") / F.col("df")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score_raw"), F.asc("term")
    )
    out = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "source",
            "term",
            "tf",
            "df",
            F.round("score_raw", 6).alias("score"),
        )
    )
    return _own_cache(out, tf)


_PAGERANK_D = 0.85
_PAGERANK_ITERS = 3

_PR_EDGES_SQL = f"""
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM ({COOC_MEMBERS_SQL}) a JOIN ({COOC_MEMBERS_SQL}) b
        ON a.l_orderkey = b.l_orderkey
      WHERE a.l_suppkey <> b.l_suppkey
"""


@query(
    "d_pagerank",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_SQL}),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY 1),
    n AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    r0 AS (SELECT id, 1.0 / n.n AS r FROM nodes, n),
    r1 AS (
      SELECT e.dst AS id, (1 - {_PAGERANK_D}) / n.n
             + {_PAGERANK_D} * sum(r0.r / deg.outdeg) AS r
      FROM edges e JOIN r0 ON e.src = r0.id
                   JOIN deg ON e.src = deg.src, n
      GROUP BY e.dst, n.n
    ),
    r2 AS (
      SELECT e.dst AS id, (1 - {_PAGERANK_D}) / n.n
             + {_PAGERANK_D} * sum(r1.r / deg.outdeg) AS r
      FROM edges e JOIN r1 ON e.src = r1.id
                   JOIN deg ON e.src = deg.src, n
      GROUP BY e.dst, n.n
    ),
    r3 AS (
      SELECT e.dst AS id, (1 - {_PAGERANK_D}) / n.n
             + {_PAGERANK_D} * sum(r2.r / deg.outdeg) AS r
      FROM edges e JOIN r2 ON e.src = r2.id
                   JOIN deg ON e.src = deg.src, n
      GROUP BY e.dst, n.n
    )
    SELECT id AS suppkey, round(r * n.n, 6) AS rank_scaled
    FROM r3, n
    """,
)
def d_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier co-occurrence graph (suppliers are
    linked when they ship lines of the same order — the symmetric
    directed graph), {_PAGERANK_ITERS} fixed iterations, damping 0.85.
    The iterative-join pattern every graph/embedding-propagation
    pipeline needs; oracle unrolls the same iterations as CTEs.

    Every node in the edge list has outdegree >= 1 (the graph is
    symmetric), so there is no dangling mass and the simple update
    rule is exact.  Output is rank * N (module docstring).

    Plan: edges build from ONE self-join on orderkey and persist,
    pre-partitioned on src; each iteration is one join (ranks x edges,
    both sides partitioned on src/id — no re-shuffle of edges after the
    first) plus one dst-aggregate.  Lineage stays 3 deep (fixed
    iterations) so no checkpoint is needed; the unbounded-iteration
    twin in operators/graph.py localCheckpoints per round.  At 100 TB
    the edge list dominates: it shuffles once, then every iteration
    reuses its partitioning — the same discipline as
    operators/graph.py's connected components."""
    # (order, supplier) dedup AND per-order fanout cap before the
    # self-join, repartition-then-dedup shuffle elision — both shared
    # with q_reachability (suite/cooc.py); the DISTINCT edge set is
    # unchanged at any cap above the data's max order size.
    edges = capped_cooc_edges(spark, sf_dir).persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = edges.select(F.col("src").alias("id")).distinct()
    n = nodes.count()  # scalar driver value: node count only
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(_PAGERANK_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(deg, "src")
            .select("dst", (F.col("r") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("id"))
            .agg(
                (
                    F.lit((1 - _PAGERANK_D) / n)
                    + F.lit(_PAGERANK_D) * F.sum("c")
                ).alias("r")
            )
        )
    from oem_gateway_spark.operators.dedup import _own_cache

    out = ranks.select(
        F.col("id").alias("suppkey"),
        F.round(F.col("r") * n, 6).alias("rank_scaled"),
    )
    # The edges persist must outlive the caller's action; the caller
    # releases it (release_caches) after materializing — same ownership
    # convention as the dedup operators.
    return _own_cache(out, edges)


_Q_INT8_TOPK = 10
_Q_INT8_NQUERY = 8


@query(
    "s_quantize_int8",
    oracle=f"""
    WITH scale AS (
      SELECT 127.0 / max(list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE))))) AS s
      FROM embeddings
    ),
    quant AS (
      SELECT vec_id, embedding,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * scale.s) AS BIGINT)) AS q
      FROM embeddings, scale
    ),
    queries AS (SELECT * FROM quant WHERE vec_id < {_Q_INT8_NQUERY}),
    cand AS (
      SELECT qr.vec_id AS query_id, db.vec_id AS cand_id,
             row_number() OVER (PARTITION BY qr.vec_id
                                ORDER BY {V.dot_sql_duckdb('qr.q', 'db.q')}
                                         DESC, db.vec_id) AS rk
      FROM queries qr JOIN quant db ON qr.vec_id <> db.vec_id
    ),
    exact AS (
      SELECT qr.vec_id AS query_id, db.vec_id AS cand_id,
             row_number() OVER (PARTITION BY qr.vec_id
                                ORDER BY {V.dot_sql_duckdb('qr.embedding',
                                                           'db.embedding')}
                                         DESC, db.vec_id) AS rk
      FROM queries qr JOIN quant db ON qr.vec_id <> db.vec_id
    )
    SELECT c.query_id,
           round(count(e.cand_id) / {_Q_INT8_TOPK}.0, 4) AS recall
    FROM (SELECT * FROM cand WHERE rk <= {_Q_INT8_TOPK}) c
      LEFT JOIN (SELECT * FROM exact WHERE rk <= {_Q_INT8_TOPK}) e
        ON c.query_id = e.query_id AND c.cand_id = e.cand_id
    GROUP BY c.query_id
    """,
)
def s_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column with an
    in-engine recall audit: vectors compress 4x (float32 -> int8,
    symmetric scale = 127/global-max-abs), the top-{_Q_INT8_TOPK}
    neighbors of {_Q_INT8_NQUERY} probe queries are computed from the
    QUANTIZED dot product, and the output is recall@{_Q_INT8_TOPK}
    against the exact float ranking — the compression/recall tradeoff
    measured inside the engine, the audit pattern s_ann_recall
    established for LSH/IVF.

    Quantized scores are exact integers (module docstring), so the
    ranking is engine-independent; the exact ranking sums the float
    dot in array order, identical in both engines.

    Plan: the scale factor is one scalar aggregate broadcast back; the
    {_Q_INT8_NQUERY}-query probe side broadcasts against the vector
    table (linear scan — the documented-exact baseline, same contract
    as s_cosine_topk); int8 arrays cut the scan's memory traffic 4x,
    which is the actual point at 100 TB — the same audit runs on an
    IVF-bucketed layout by swapping the candidate source."""
    emb = load_table(spark, sf_dir, "embeddings")
    scale = emb.agg(
        (
            F.lit(127.0)
            / F.max(
                F.array_max(
                    F.transform(
                        "embedding", lambda x: F.abs(x.cast("double"))
                    )
                )
            )
        ).alias("s")
    )
    quant = emb.crossJoin(F.broadcast(scale)).select(
        "vec_id",
        "embedding",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * F.col("s")).cast("long"),
        ).alias("q"),
    )
    queries = quant.filter(F.col("vec_id") < _Q_INT8_NQUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("embedding").alias("qe"),
    )
    pairs = quant.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    )
    qdot = F.aggregate(
        F.zip_with("qq", "q", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        qdot.alias("qscore"),
        V.dot(F.col("qe"), F.col("embedding")).alias("escore"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("qscore"), F.asc("cand_id")
    )
    we = Window.partitionBy("query_id").orderBy(
        F.desc("escore"), F.asc("cand_id")
    )
    ranked = scored.select(
        "query_id",
        "cand_id",
        F.row_number().over(wq).alias("qrk"),
        F.row_number().over(we).alias("erk"),
    )
    hits = ranked.filter(F.col("qrk") <= _Q_INT8_TOPK).groupBy("query_id").agg(
        F.round(
            F.sum(F.when(F.col("erk") <= _Q_INT8_TOPK, 1).otherwise(0))
            / float(_Q_INT8_TOPK),
            4,
        ).alias("recall")
    )
    return hits


@query(
    "q_data_profile",
    oracle="""
    SELECT 'o_custkey' AS col, CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(min(o_custkey) AS VARCHAR) AS min_s,
           CAST(max(o_custkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT),
           CAST(round(min(o_totalprice), 2) AS VARCHAR),
           CAST(round(max(o_totalprice), 2) AS VARCHAR)
    FROM orders
    """,
)
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the warehouse ``ANALYZE``/data-quality pass):
    per-column row count, null count, distinct count, and min/max as
    strings, over four orders columns of mixed type.  Doubles distinct-
    count on exact cents and min/max on rounded values so both engines
    see identical keys; numeric min/max render via a round-then-cast
    (Spark and DuckDB print bare doubles differently).

    Plan (r13 optimization): one GROUP-BY-VALUE branch per column,
    unioned.  The previous single-agg multi-distinct shape planned as
    Expand(x5 rows) -> Sort -> SortAggregate — string min/max in the
    aggregation buffer disqualifies hash aggregation, so the 5x
    expanded fact was SORTED (measured 4.3 s isolated at sf0.1).  Here
    each branch hash-aggregates by the column's value (map-side partial
    collapses to the per-partition distinct set before the exchange, so
    the shuffle carries |distinct|, not |rows|), and the string-buffer
    min/max runs only over the distinct-value frame.  Four
    single-column scans of a columnar format read the same bytes as
    one four-column scan, so the 100 TB cost is unchanged while the
    5x-row sort disappears (measured 4.3 s -> see OPTIMIZATION_r13.md;
    plan diff: Expand+2 SortAggregate sorts -> 4 parallel
    HashAggregate branches)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def profile(col: str, key: F.Column, min_max_rounded: bool) -> DataFrame:
        if min_max_rounded:
            # distinct key is exact cents, min/max render from the raw
            # double — carry per-key extrema through the group-by.
            g = o.groupBy(key.alias("k")).agg(
                F.count("*").alias("cnt"),
                F.min(col).alias("mn"),
                F.max(col).alias("mx"),
            )
            # Exact replication of the previous expression chain:
            # min -> cast string -> cast double -> round -> cast string.
            min_s = F.round(
                F.min("mn").cast("string").cast("double"), 2
            ).cast("string")
            max_s = F.round(
                F.max("mx").cast("string").cast("double"), 2
            ).cast("string")
        else:
            g = o.groupBy(key.alias("k")).agg(F.count("*").alias("cnt"))
            min_s = F.min("k").cast("string")
            max_s = F.max("k").cast("string")
        return g.agg(
            F.sum("cnt").alias("n"),
            F.coalesce(
                F.sum(F.when(F.col("k").isNull(), F.col("cnt"))), F.lit(0)
            ).alias("n_null"),
            F.count("k").alias("n_distinct"),
            min_s.alias("min_s"),
            max_s.alias("max_s"),
        ).select(
            F.lit(col).alias("col"),
            "n",
            "n_null",
            "n_distinct",
            "min_s",
            "max_s",
        )

    parts = [
        profile("o_custkey", F.col("o_custkey"), False),
        profile("o_orderstatus", F.col("o_orderstatus"), False),
        profile("o_orderpriority", F.col("o_orderpriority"), False),
        profile("o_totalprice", cents, True),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "q_skyline",
    oracle="""
    SELECT r.p_partkey, r.p_retailprice, CAST(r.p_size AS INT) AS p_size
    FROM part r
    WHERE NOT EXISTS (
      SELECT 1 FROM part s
      WHERE s.p_retailprice >= r.p_retailprice AND s.p_size >= r.p_size
        AND (s.p_retailprice > r.p_retailprice OR s.p_size > r.p_size)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (p_retailprice, p_size) — s dominates r iff s is >= on both
    dimensions and strictly > on at least one.  The multi-objective
    shortlist shape (price/quality, cost/recall, size/score) that a
    naive formulation computes as an O(n^2) dominance anti-join.

    Decomposition that scales: (1) per-x aggregation — for every
    distinct price, the max size at that price (one hash shuffle on x;
    rows at a price below its own max are dominated by x-equal rows);
    (2) the frontier recurrence on the AGGREGATED table — a price
    survives iff its max-size strictly exceeds every max-size at any
    higher price, i.e. a running-max window over distinct prices sorted
    descending.  That pass is a global window but runs on |distinct x|
    rows, not n (the classic sort-filter skyline, post-aggregation);
    (3) broadcast the surviving (x, ymax) pairs back to recover row
    identity.  At 100 TB step 2's input is bounded by the x-domain
    cardinality — if x is continuous, pre-bucket it (the
    grid-partitioned skyline) and run exact dominance only across
    bucket frontiers.  The oracle replays the quadratic NOT EXISTS
    definition (needn't scale, only agree)."""
    pt = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    xmax = pt.groupBy("p_retailprice").agg(F.max("p_size").alias("ymax"))
    w_run = (
        Window.orderBy(F.desc("p_retailprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_x = (
        xmax.withColumn("prev_max", F.max("ymax").over(w_run))
        .filter(
            F.col("prev_max").isNull() | (F.col("ymax") > F.col("prev_max"))
        )
        .select(F.col("p_retailprice").alias("fx"), F.col("ymax").alias("fy"))
    )
    return (
        pt.join(
            F.broadcast(frontier_x),
            (F.col("p_retailprice") == F.col("fx"))
            & (F.col("p_size") == F.col("fy")),
        )
        .select(
            "p_partkey",
            "p_retailprice",
            F.col("p_size").cast("int").alias("p_size"),
        )
    )


@query(
    "q_hll_partial_merge",
    oracle="""
    SELECT CAST(date_trunc('quarter', l_shipdate) AS TIMESTAMP) AS quarter,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS merged_ok
    FROM lineitem GROUP BY 1
    """,
)
def q_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch rollup (the Apache DataSketches pattern):
    per-month HLL sketches of distinct parts shipped, merged upward to
    quarters with hll_union_agg — the two-phase distinct-count
    architecture every warehouse runs at scale, where daily partials
    are materialized once and every coarser rollup merges kilobyte
    sketches instead of rescanning raw keys.  The month->quarter merge
    here IS that contract: the quarter estimate is computed only from
    the month sketches.

    Oracle strategy (the q_approx_distinct tolerance pattern): the
    sketch estimate is engine-specific, so the query emits the exact
    per-quarter distinct count plus a within-5%-of-exact boolean for
    the MERGED estimate; the oracle emits the exact count and literal
    TRUE.  Hash-green iff merging month sketches loses nothing beyond
    the HLL error bound."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_trunc("month", "l_shipdate").alias("month"),
        F.date_trunc("quarter", "l_shipdate").alias("quarter"),
        "l_partkey",
    )
    monthly = li.groupBy("quarter", "month").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    merged = monthly.groupBy("quarter").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = li.groupBy("quarter").agg(
        F.count_distinct("l_partkey").alias("exact_parts")
    )
    return exact.join(merged, "quarter").select(
        "quarter",
        "exact_parts",
        (
            F.abs(F.col("est") - F.col("exact_parts")) / F.col("exact_parts")
            < 0.05
        ).alias("merged_ok"),
    )


@query(
    "q_skew_diagnostics",
    oracle="""
    WITH kv AS (
      SELECT 'l_orderkey' AS key_name, CAST(l_orderkey AS BIGINT) AS v
      FROM lineitem
      UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
      UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem),
    cnt AS (
      SELECT key_name, v, count(*) AS c FROM kv GROUP BY 1, 2)
    SELECT key_name,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(c) AS BIGINT) AS max_freq,
           round(max(c) * count(*) * 1.0 / sum(c), 6) AS skew_ratio
    FROM cnt GROUP BY 1
    """,
)
def q_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report for every candidate shuffle key on the
    fact: row count, distinct keys, the hottest key's frequency, and
    the skew ratio (hottest / average group size) — the number that
    decides, BEFORE a 100 TB join is launched, whether a key needs
    salting (operators/skew.py), an AQE skew-split, or is safe as-is.
    The operational companion to q_salted_join: that query fixes skew,
    this one measures it.

    Plan: the fact scans ONCE — the three keys unpivot map-side into
    (key_name, value) rows feeding a single two-level aggregation
    (partial per-key counts combine before the exchange); the second
    aggregate runs on the |distinct keys| table.  No collect, no
    per-key job."""
    li = load_table(spark, sf_dir, "lineitem")
    kv = li.select(
        F.explode(
            F.create_map(
                F.lit("l_orderkey"), F.col("l_orderkey").cast("long"),
                F.lit("l_suppkey"), F.col("l_suppkey").cast("long"),
                F.lit("l_partkey"), F.col("l_partkey").cast("long"),
            )
        ).alias("key_name", "v")
    )
    cnt = kv.groupBy("key_name", "v").agg(F.count("*").alias("c"))
    return cnt.groupBy("key_name").agg(
        F.sum("c").alias("n_rows"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("max_freq"),
        F.round(
            F.max("c") * F.count("*") * F.lit(1.0) / F.sum("c"), 6
        ).alias("skew_ratio"),
    )


@query(
    "q_percentile_select",
    oracle="""
    WITH v AS (SELECT l_extendedprice AS x FROM lineitem WHERE x IS NOT NULL),
    c AS (SELECT count(*) AS n FROM v),
    ranked AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v),
    qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
    SELECT qs.q AS q,
           CAST(ceil(qs.q * c.n) AS BIGINT) AS k,
           round(ranked.x, 6) AS val
    FROM qs CROSS JOIN c
    JOIN ranked ON ranked.rn = CAST(ceil(qs.q * c.n) AS BIGINT)
    ORDER BY q
    """,
)
def q_percentile_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global order statistics (p50/p90/p99 of l_extendedprice, as
    the k = ceil(q*n)-th smallest VALUE) via operators/selection.py's
    iterative histogram narrowing — a plan shape no other registry query
    exercises: DRIVER-COORDINATED AGGREGATE-NARROWED SELECTION, where
    each round is one full scan collapsing map-side to <= |targets| x 64
    histogram rows, and nothing is ever globally sorted.  The existing
    q_exact_percentiles is the interpolated per-GROUP aggregate (Spark's
    percentile(), a per-group sort); this is the 100 TB path for exact
    global ranks, where a total sort is a full-data range shuffle but
    log_64(range) kilobyte-shuffle scans are cheap.  The oracle is the
    definitionally-exact row_number() formulation.  Result values are
    actual data values (no interpolation), so the hash compare is exact
    by construction."""
    from oem_gateway_spark.operators.selection import exact_order_statistics

    li = load_table(spark, sf_dir, "lineitem")
    stats = exact_order_statistics(li, "l_extendedprice", [0.5, 0.9, 0.99])
    return spark.createDataFrame(
        [(q, k, round(v, 6)) for q, k, v in stats],
        schema="q double, k long, val double",
    ).orderBy("q")
