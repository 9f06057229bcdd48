"""Training-data pipeline completions: train/test contamination checks,
duplicate-cluster labeling (connected components over near-dup pairs),
corpus vocabulary statistics, per-document distinctive terms, and kNN
label classification over embeddings.

Same oracle strategy as suite/llm.py: every primitive is an md5/integer
construction both engines replay exactly — no tolerances, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.functions import hashing as H
from oem_gateway_spark.operators import similarity as S
from oem_gateway_spark.operators.graph import connected_components
from oem_gateway_spark.suite.llm import (
    CORPUS_SQL,
    DOC_OFFSET,
    _ann_oracle,
    _corpus,
    _cosine_topk_oracle,
    _lsh_pairs_oracle,
)
from oem_gateway_spark.suite.registry import query

# ------------------------------------------------- train/test contamination

CONTAM_K = 8  # 8-word shingles: the standard decontamination n-gram size


@query(
    "d_contamination",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    toks AS (SELECT doc_id, {H.words_sql('text')} AS w FROM corpus),
    raw AS (SELECT doc_id,
                   unnest(list_distinct({H.shingles_sql('w', CONTAM_K)})) AS s
            FROM toks),
    sh AS (SELECT doc_id, md5(s) AS g FROM raw),
    test_sh AS (SELECT doc_id, g FROM sh WHERE doc_id >= {DOC_OFFSET}),
    train_g AS (SELECT DISTINCT g FROM sh WHERE doc_id < {DOC_OFFSET}),
    totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
               FROM test_sh GROUP BY doc_id),
    hits AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hit
             FROM test_sh t JOIN train_g USING (g) GROUP BY t.doc_id)
    SELECT totals.doc_id, n_grams, COALESCE(n_hit, 0) AS n_hit,
           COALESCE(n_hit, 0) > 0 AS contaminated
    FROM totals LEFT JOIN hits USING (doc_id)
    """,
)
def d_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination scan: an evaluation document is flagged
    when any of its 8-word shingles appears anywhere in the training
    corpus (the perturbed copies play the eval set; the originals the
    training set).  Joins on md5(shingle) so the exchange carries 128-bit
    keys, not raw text.

    Shape for 100 TB: the EVAL side is tiny by contract (benchmark suites
    are ~1e5 docs) — its distinct-gram set broadcasts, the training corpus
    streams map-side through the broadcast join probe with no shuffle, and
    only the matched grams (bounded by |eval shingles|) reach the per-doc
    count aggregation."""
    from oem_gateway_spark.operators.dedup import _own_cache

    corpus = _corpus(spark, sf_dir)
    # Dedupe raw shingles per doc map-side (array_distinct), THEN md5 on
    # the flat exploded column — the digest runs in whole-stage codegen,
    # not as an interpreted array lambda.  The gram table feeds THREE
    # consumers (eval totals, train side, the hit join): persist so the
    # shingle/md5 scan runs once (caller releases via release_caches).
    grams = (
        corpus.select(
            "doc_id",
            F.explode(
                F.array_distinct(H.shingles(H.words(F.col("text")), k=CONTAM_K))
            ).alias("s"),
        )
        .select("doc_id", F.md5("s").alias("g"))
        .persist()
    )
    test_sh = grams.filter(F.col("doc_id") >= DOC_OFFSET)
    # Scale shape: the TRAINING gram stream is never shuffled — it probes
    # the broadcast eval-gram set map-side (left_semi), and only the
    # matches (bounded by |eval grams|) reach a distinct.  A train-side
    # distinct-first would shuffle the full 100 TB gram set.
    test_g = test_sh.select("g").distinct()
    train_matched = (
        grams.filter(F.col("doc_id") < DOC_OFFSET)
        .select("g")
        .join(F.broadcast(test_g), on="g", how="left_semi")
        .distinct()
    )
    # Totals and hits in ONE aggregation pass: left-join the (small)
    # matched-gram set onto the eval grams and count rows vs non-null
    # flags — no second agg, no re-join of the two aggregates.
    flagged = test_sh.join(
        F.broadcast(train_matched.withColumn("_hit", F.lit(1))), on="g", how="left"
    )
    out = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.count("_hit").alias("n_hit"),
        (F.count("_hit") > 0).alias("contaminated"),
    )
    return _own_cache(out, grams)


# --------------------------------------------------- duplicate clustering


@query(
    "d_dup_clusters",
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
    )
    SELECT node AS doc_id, CAST(min(reached) AS BIGINT) AS cluster_id
    FROM walk GROUP BY node
    """,
)
def d_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the MinHash-LSH
    near-dup pair list (A~B, B~C collapse to one cluster even when A and
    C never share a band); cluster_id = min doc_id of the component, the
    canonical survivor a keep-first dedup would retain.

    The oracle walks reachability with a recursive CTE (needn't scale,
    only agree); the Spark side iterates min-label propagation on the
    sparse edge list — see ``operators/graph.py`` for the 100 TB story."""
    from oem_gateway_spark.operators.dedup import minhash_lsh_pairs, release_caches

    # The edge list feeds both union branches of the symmetrization —
    # persist it or the LSH band join runs twice.  Everything upstream can
    # be released as soon as connected_components returns: its result is
    # localCheckpoint-materialized, with no live lineage into the pairs.
    pairs = minhash_lsh_pairs(_corpus(spark, sf_dir)).persist()
    out = connected_components(pairs)
    release_caches(pairs)
    pairs.unpersist()
    return out


# ------------------------------------------------------- vocabulary stats


@query(
    "t_vocab_topk",
    oracle=f"""
    WITH toks AS (SELECT {H.words_sql('text')} AS w FROM documents),
    flat AS (SELECT unnest(w) AS token FROM toks),
    counts AS (SELECT token, CAST(count(*) AS BIGINT) AS n
               FROM flat GROUP BY token)
    SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 20
    """,
)
def t_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-20 tokens by total occurrences
    (count desc, token asc tiebreak).  The explode feeds a hash
    aggregate, so partial (map-side) aggregation collapses each
    partition to its distinct tokens before the one shuffle — the
    exchange carries vocabulary, not corpus, at any scale; the global
    top-k is a single tiny sort on the aggregated counts."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return (
        docs.select(F.explode(H.words(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@query(
    "t_rare_terms",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {H.words_sql('text')} AS w FROM documents),
    dt AS (SELECT DISTINCT doc_id, unnest(w) AS token FROM toks),
    df AS (SELECT token, CAST(count(*) AS BIGINT) AS doc_freq
           FROM dt GROUP BY token),
    ranked AS (
      SELECT dt.doc_id, dt.token, df.doc_freq,
             row_number() OVER (PARTITION BY dt.doc_id
                                ORDER BY df.doc_freq, dt.token) AS rnk
      FROM dt JOIN df USING (token))
    SELECT doc_id, token, doc_freq, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def t_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document distinctive terms: the 3 tokens with the LOWEST
    document frequency (IDF ranking by integer doc-counts — same ordering
    as TF-IDF's rarity axis with none of the float-log rounding that
    breaks cross-engine parity; ties break on the token).

    Shape: distinct (doc, token) -> vocabulary doc_freq (tiny, broadcast
    back) -> per-doc top-3 window.  The corpus shuffles once for the
    distinct; the doc_freq join is broadcast, and the window partitions
    by doc — no skew (every doc's partition is its own token count)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    dt = docs.select(
        "doc_id", F.explode(H.words(F.col("text"))).alias("token")
    ).distinct()
    df_counts = dt.groupBy("token").agg(F.count("*").alias("doc_freq"))
    rnk = Window.partitionBy("doc_id").orderBy("doc_freq", "token")
    return (
        dt.join(F.broadcast(df_counts), on="token")
        .withColumn("rnk", F.row_number().over(rnk).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "doc_freq", "rnk")
    )


# ------------------------------------------------- per-source mix controls

DOMAIN_CAP = 15  # max docs kept per source (anti-spam / domain balancing)
SHARD_TOKEN_BUDGET = 5000  # bpe tokens per training shard (within source)


@query(
    "d_domain_cap",
    oracle=f"""
    SELECT doc_id, source, CAST(rk AS INT) AS rk
    FROM (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)),
                                             doc_id) AS rk
          FROM documents)
    WHERE rk <= {DOMAIN_CAP}
    """,
)
def d_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most DOMAIN_CAP docs per source,
    chosen by md5-hash order — a deterministic uniform sample per domain
    (anti-spam / mix balancing: no domain may dominate the training set).
    Hash order, not doc_id order, so the kept set is unbiased w.r.t.
    crawl/insertion order and stable across runs and engines.

    One window over the source partition — at 100 TB sources are numerous
    (millions of domains), so the window parallelizes across them; a
    skewed mega-domain still only sorts ITS OWN rows, and AQE skew-split
    handles the exchange."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= DOMAIN_CAP)
        .select("doc_id", "source", "rk")
    )


@query(
    "d_shard_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST({{bpe}} AS BIGINT) AS bpe_tokens
      FROM documents),
    packed AS (
      SELECT doc_id, source, bpe_tokens,
             CAST(sum(bpe_tokens) OVER (PARTITION BY source
                      ORDER BY md5('shard:' || CAST(doc_id AS VARCHAR)), doc_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM toks)
    SELECT doc_id, source, bpe_tokens, cum_tokens,
           CAST((cum_tokens - 1) // {SHARD_TOKEN_BUDGET} AS INT) AS shard
    FROM packed
    """.replace("{bpe}", "len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))"),
)
def d_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: within each source, docs line up in
    deterministic md5 order and fill shards of SHARD_TOKEN_BUDGET BPE
    tokens by running sum (shard = (cum-1) div budget) — how a training
    pipeline materializes fixed-size data shards without a global sort.

    The running sum windows WITHIN source — parallel across sources, never
    the single-task global-order cumsum (the naive global packing is
    inherently sequential; per-source packing is the scale-correct frame,
    with a final tiny shard-renumber if globally unique ids are needed)."""
    from oem_gateway_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    w = (
        Window.partitionBy("source")
        .orderBy(
            F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            "doc_id",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "doc_id",
        "source",
        T.bpe_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )
    return toks.withColumn("cum_tokens", F.sum("bpe_tokens").over(w)).select(
        "doc_id",
        "source",
        "bpe_tokens",
        "cum_tokens",
        # integer `div`, not float floor-divide: exact at any magnitude
        F.expr(f"(cum_tokens - 1) div {SHARD_TOKEN_BUDGET}")
        .cast("int")
        .alias("shard"),
    )


# ------------------------------------------------------------- ANN quality


@query(
    "s_ann_recall",
    oracle=f"""
    WITH exact3 AS ({_cosine_topk_oracle(k=3)}),
    ann3 AS ({_ann_oracle(k=3)}),
    hits AS (
      SELECT exact3.query_id, CAST(count(ann3.neighbor_id) AS BIGINT) AS n_hit
      FROM exact3 LEFT JOIN ann3 USING (query_id, neighbor_id)
      GROUP BY exact3.query_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(n_hit) AS BIGINT) AS total_hits,
           round(sum(n_hit) / (3.0 * count(*)), 6) AS recall3
    FROM hits
    """,
)
def s_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the LSH ANN path against the exact brute-force top-3 —
    the engine auditing its own approximation (the number a user needs
    before trusting bucketed ANN at scale).  Both operators compose into
    one plan; the intersection joins on (query, neighbor) ids only, so the
    audit's cost is the two top-k's, not a new pairwise pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact3 = S.brute_force_topk(emb, queries, k=3).select(
        "query_id", "neighbor_id"
    )
    ann3 = S.lsh_ann_topk(emb, queries, k=3).select(
        "query_id", F.col("neighbor_id").alias("ann_neighbor")
    )
    hits = (
        exact3.join(
            ann3,
            (exact3["query_id"] == ann3["query_id"])
            & (exact3["neighbor_id"] == ann3["ann_neighbor"]),
            "left",
        )
        .groupBy(exact3["query_id"])
        .agg(F.count("ann_neighbor").alias("n_hit"))
    )
    return hits.agg(
        F.count("*").alias("n_queries"),
        F.sum("n_hit").alias("total_hits"),
        F.round(F.sum("n_hit") / (3.0 * F.count("*")), 6).alias("recall3"),
    )


# -------------------------------------------------------- kNN classification


@query(
    "s_knn_classify",
    oracle=f"""
    WITH nn AS ({_cosine_topk_oracle(k=5, stride=50)}),
    votes AS (
      SELECT nn.query_id, e.label, CAST(count(*) AS BIGINT) AS votes
      FROM nn JOIN embeddings e ON nn.neighbor_id = e.vec_id
      GROUP BY nn.query_id, e.label)
    SELECT query_id, label AS predicted_label, votes
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY votes DESC, label) AS r
          FROM votes)
    WHERE r = 1
    """,
)
def s_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label classification: every 50th vector is a query; its label
    is predicted as the majority label of its 5 exact-cosine nearest
    neighbors (ties -> smaller label).  Composition proof: the ANN top-k
    operator's output feeds a relational vote without materialization —
    one Catalyst plan.  The label lookup joins on vec_id against the
    (id, label) projection — at scale a broadcast of the label dimension
    or a co-bucketed join, never a shuffle of the vector payload."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    nn = S.brute_force_topk(emb, queries, k=5)
    labels = emb.select("vec_id", "label")
    votes = (
        nn.join(F.broadcast(labels), nn["neighbor_id"] == labels["vec_id"])
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("votes"))
    )
    pick = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), "label")
    return (
        votes.withColumn("r", F.row_number().over(pick))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )


# ---------------------------------------------------------- k-means training

_KM_K = 4
_KM_DIM = 64


def _km_dist_sql(vec: str, cent: str) -> str:
    """Squared L2 between a FLOAT[] column and a DOUBLE[] centroid list,
    folded in index order (DuckDB twin of clustering._dist_sq)."""
    return (
        f"list_aggregate(list_transform(range(1, {_KM_DIM + 1}), i -> "
        f"(CAST(({vec})[i] AS DOUBLE) - ({cent})[i]) * "
        f"(CAST(({vec})[i] AS DOUBLE) - ({cent})[i])), 'sum')"
    )


_KM_ORACLE = f"""
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         list_transform(range(1, {_KM_DIM + 1}),
                        i -> round(CAST(embedding[i] AS DOUBLE), 6)) AS cent
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_KM_K})
), a1 AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT e.vec_id, e.embedding, s.cluster,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_km_dist_sql('e.embedding', 's.cent')}, s.cluster) AS rn
    FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1
), c1 AS (
  SELECT cluster, list(m ORDER BY i) AS cent FROM (
    SELECT cluster, i, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
    FROM a1, unnest(range(1, {_KM_DIM + 1})) AS t(i)
    GROUP BY cluster, i) GROUP BY cluster
), a2 AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT e.vec_id, e.embedding, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_km_dist_sql('e.embedding', 'c.cent')}, c.cluster) AS rn
    FROM embeddings e CROSS JOIN c1 c) WHERE rn = 1
), c2 AS (
  SELECT cluster, list(m ORDER BY i) AS cent FROM (
    SELECT cluster, i, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
    FROM a2, unnest(range(1, {_KM_DIM + 1})) AS t(i)
    GROUP BY cluster, i) GROUP BY cluster
)
SELECT a2.cluster,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(min(a2.vec_id) AS BIGINT) AS first_vec,
       round(sqrt(list_aggregate(
         list_transform(any_value(c2.cent), x -> x * x), 'sum')), 4)
         AS centroid_norm
FROM a2 JOIN c2 ON a2.cluster = c2.cluster
GROUP BY a2.cluster
"""


@query("s_kmeans", oracle=_KM_ORACLE)
def s_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means training (operators/clustering.py): 2 Lloyd's iterations,
    k=4, deterministic seeds = the 4 lowest vec_ids.  Output per cluster:
    population, lowest member id, and the norm of the trained centroid —
    so the oracle (the same two iterations unrolled as CTEs, centroids
    rounded to 6 dp each round on both engines) verifies ASSIGNMENTS and
    CENTROID VALUES, not just convergence.

    The iterative-algorithm pattern: per-iteration cost is one corpus
    scan + a k x dim partial-aggregate exchange; centroids (a few KB)
    are the only driver round-trip.  This is the honest training loop
    behind similarity.py's IVF serving path."""
    from oem_gateway_spark.operators.clustering import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = kmeans_fit(emb, k=_KM_K, n_iter=2)
    norms = [
        (i, round(sum(v * v for v in c) ** 0.5, 4)) for i, c in enumerate(cents)
    ]
    norm_df = spark.createDataFrame(norms, ["cluster", "centroid_norm"])
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_points"),
            F.min("vec_id").alias("first_vec"),
        )
        .join(F.broadcast(norm_df), on="cluster")
        .select("cluster", "n_points", "first_vec", "centroid_norm")
    )


# ----------------------------------------------- unigram LM quality scoring

@query(
    "t_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({H.words_sql('text')}) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, token),
    freqs AS (SELECT token, CAST(sum(tf) AS BIGINT) AS n_w FROM tf GROUP BY token),
    total AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_total FROM freqs)
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           round(sum(tf.tf * -ln(freqs.n_w / CAST(total.n_total AS DOUBLE)))
                 / sum(tf.tf), 4) AS avg_neg_logprob
    FROM tf JOIN freqs USING (token), total
    GROUP BY tf.doc_id
    """,
)
def t_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: each document's mean per-token
    -ln p(token) under the corpus's OWN unigram distribution — the
    cheap proxy for perplexity-based quality filtering (CCNet-style:
    rank documents by LM score, drop the tail) with the LM trained and
    applied in one job.

    Scale: the corpus collapses to (doc, token, tf) FIRST (map-side
    combinable, one shuffle on (doc, token)); the vocabulary aggregate
    reduces that — the exchange after tokenization carries term
    frequencies, never raw token streams.  The vocab joins back
    broadcast here (bounded vocabulary); at a 100 TB corpus swap the
    broadcast for a shuffle join on token — AQE's skew split handles
    the stopword-heavy keys (documented, not needed at test scale).
    The scalar grand total rides the broadcast as a cross join of one
    row.

    The tf frame feeds THREE consumers (the probe, the vocab aggregate,
    and through it the grand total) — persisted once so the corpus
    tokenizes once, not three times (caller releases via
    operators.dedup.release_caches, same lifetime contract as the
    MinHash signatures)."""
    from oem_gateway_spark.operators.dedup import _own_cache

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tf = (
        docs.select("doc_id", F.explode(H.words(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    ).persist()
    freqs = tf.groupBy("token").agg(F.sum("tf").alias("n_w"))
    total = freqs.agg(F.sum("n_w").alias("n_total"))
    scored = (
        tf.join(F.broadcast(freqs), on="token")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("tf")
                    * -F.log(F.col("n_w") / F.col("n_total").cast("double"))
                )
                / F.sum("tf"),
                4,
            ).alias("avg_neg_logprob"),
        )
    )
    return _own_cache(scored, tf)


# ------------------------------------------------- corpus mixture weighting

@query(
    "d_mix_temperature",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    powered AS (SELECT *, pow(n_docs, 0.7) AS p FROM counts),
    z AS (SELECT sum(p) AS z FROM powered)
    SELECT source, n_docs, n_chars,
           round(p / z, 6) AS mix_weight,
           round(p / z * (SELECT sum(n_docs) FROM counts), 2) AS target_docs
    FROM powered, z
    """,
)
def d_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixture weights: per-source sampling
    weight proportional to count^alpha (alpha = 0.7) — the standard
    rebalancing that up-weights small high-quality sources relative to
    raw proportions (alpha=1 is natural sampling, alpha=0 uniform).
    Emits the weight and the implied per-source document budget for one
    epoch of the same total size.

    Scale: one aggregate collapses the corpus to |sources| rows;
    everything after (power, normalizer, budgets) is arithmetic on that
    tiny frame — the normalizing constant broadcasts as a one-row cross
    join, never a second corpus scan."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    powered = counts.withColumn("p", F.pow(F.col("n_docs"), F.lit(0.7)))
    z = powered.agg(
        F.sum("p").alias("z"), F.sum("n_docs").alias("grand_n")
    )
    return (
        powered.join(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_chars",
            F.round(F.col("p") / F.col("z"), 6).alias("mix_weight"),
            F.round(F.col("p") / F.col("z") * F.col("grand_n"), 2).alias(
                "target_docs"
            ),
        )
    )


# ------------------------------------------------ two-phase heavy hitters

@query(
    "d_heavy_hitters",
    oracle=f"""
    WITH dt AS (
      SELECT doc_id, unnest(list_distinct({H.words_sql('text')})) AS token
      FROM documents
    ),
    df AS (SELECT token, CAST(count(*) AS BIGINT) AS doc_freq
           FROM dt GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT token, doc_freq FROM df, n WHERE doc_freq > 0.01 * n_docs
    """,
)
def d_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: every token present in more than 1% of documents,
    with its EXACT document frequency — computed with the two-phase
    candidate pattern (per-partition Misra-Gries summaries -> candidate
    superset -> exact recount of candidates only), not a full-vocabulary
    shuffle.

    Why it scales: phase 1 never shuffles — each partition keeps a
    bounded 200-counter summary (mergeable-summaries MG: exact batch
    counts merged with subtract-the-(k+1)th-and-prune, all vectorized
    pandas — no per-token Python loop), and MG guarantees any token
    with partition frequency > n_p/(k+1) survives, so with k+1 > 1/s
    every global s-heavy hitter is some partition's candidate.  Phase 2
    recounts ONLY the candidate tokens (broadcast semi filter on the
    explode, so the counting exchange carries candidates, not
    vocabulary).  The final threshold makes the output exact and
    independent of MG arrival order.  Cost: two corpus scans, zero
    vocabulary-wide shuffles — at 100 TB that trade is decisively right
    (t_vocab_topk is the full-aggregation twin for bounded vocabs)."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    per_doc = docs.select(
        "doc_id", F.array_distinct(H.words(F.col("text"))).alias("toks")
    )
    tokens = per_doc.select(F.explode("toks").alias("token"))

    K = 200  # counters per partition; guarantee needs K+1 > 1/support

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            merged = pd.Series(counters, dtype="int64").add(
                pdf["token"].value_counts(), fill_value=0
            )
            if len(merged) > K:
                cut = merged.nlargest(K + 1).iloc[-1]
                merged = merged - cut
                merged = merged[merged > 0]
            counters = merged.astype("int64").to_dict()
        yield pd.DataFrame({"token": list(counters.keys())})

    candidates = tokens.mapInPandas(mg_partition, "token string").distinct()
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    return (
        tokens.join(F.broadcast(candidates), on="token", how="left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .join(F.broadcast(n_docs))
        .filter(F.col("doc_freq") > 0.01 * F.col("n_docs"))
        .select("token", "doc_freq")
    )


@query(
    "d_group_split",
    oracle="""
    WITH buck AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4))
               ::INTEGER AS doc_b,
             ('0x' || substr(md5('split:' || source), 1, 4))
               ::INTEGER AS grp_b
      FROM documents),
    labeled AS (
      SELECT doc_id, source,
             CASE WHEN doc_b < 52429 THEN 'train'
                  WHEN doc_b < 58982 THEN 'val' ELSE 'test' END AS by_doc,
             CASE WHEN grp_b < 52429 THEN 'train'
                  WHEN grp_b < 58982 THEN 'val' ELSE 'test' END AS by_group
      FROM buck)
    SELECT variant, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_groups
    FROM (
      SELECT 'by_doc' AS variant, by_doc AS split, source FROM labeled
      UNION ALL
      SELECT 'by_group', by_group, source FROM labeled
    ) GROUP BY 1, 2
    """,
)
def d_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split with a GROUP-LEAKAGE guard: the split label
    comes from a deterministic hash bucket (16-bit md5 prefix,
    80/10/10), computed two ways — per document (the naive recipe) and
    per GROUP (source/domain — the correct one when near-duplicate or
    same-author documents must never straddle the eval boundary).
    Reported per (variant, split): doc and distinct-group counts.  The
    leakage witness is in the group totals: summed over splits,
    by_group counts each source once (every group lives in exactly one
    split) while by_doc counts most sources in ALL THREE (the leak:
    same-group documents on both sides of the boundary).

    Deterministic everywhere: md5 prefixes are engine-identical, the
    80/10/10 boundary is an integer compare, no RNG.  At 100 TB this
    is one map pass + one (variant, split) aggregate — the group hash
    needs no join because the group key is ON the row; a group table
    with its own metadata would broadcast."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    bucket16 = lambda col: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit("split:"), col)), 1, 4), 16, 10
    ).cast("int")
    label = lambda b: (  # noqa: E731
        F.when(b < 52429, F.lit("train"))
        .when(b < 58982, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    labeled = docs.select(
        "source",
        label(bucket16(F.col("doc_id").cast("string"))).alias("by_doc"),
        label(bucket16(F.col("source"))).alias("by_group"),
    )
    both = labeled.select(
        F.lit("by_doc").alias("variant"), F.col("by_doc").alias("split"), "source"
    ).unionByName(
        labeled.select(
            F.lit("by_group").alias("variant"),
            F.col("by_group").alias("split"),
            "source",
        )
    )
    return both.groupBy("variant", "split").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("source").alias("n_groups"),
    )
