"""Round-6 additions: exact set-similarity JOIN via prefix filtering and
Merkle-style snapshot reconciliation.

Both target plan shapes no existing registry query covers (VERDICT r5 #8):

- ``d_setsim_prefix_join``: an exact-threshold similarity JOIN whose
  candidate generation is recall-LOSSLESS (prefix-filtering theorem) —
  the deterministic counterpart to MinHash/SimHash's probabilistic
  candidates, and a true join where ``d_ngram_jaccard`` only verifies
  pre-supplied pairs.
- ``q_merkle_reconcile``: hierarchical digest comparison between two
  table snapshots — the row-level diff join runs only on buckets whose
  order-independent digests disagree, where ``q_snapshot_diff`` joins
  both snapshots in full.
- ``q_kmv_intersect``: a mergeable ORDER-STATISTIC sketch (k minimum
  values) estimating distinct-count INTERSECTIONS — the multiset
  operation HLL's union-only sketch cannot answer; md5 determinism
  makes the estimate itself exactly oracle-able.
- ``q_dpp_prune``: dynamic partition pruning — runtime dim values
  injected into a hive-partitioned fact scan's PartitionFilters, the
  one Catalyst physical-optimization lever the registry didn't witness.
- ``q_bloom_prune``: runtime bloom-filter join pruning — the ROW-level
  counterpart to DPP's directory-level pruning: InjectRuntimeFilter
  drops fact rows that cannot join BEFORE the shuffle via
  ``might_contain`` on the join key.

Reference parity: the reference gateway has no analytics engine; these
extend the §2.6 engine surface (SURVEY.md) for the LLM-pipeline brief
(near-dup curation; snapshot drift audits between pipeline runs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.functions import hashing as H
from oem_gateway_spark.functions import text as T
from oem_gateway_spark.operators.dedup import _own_cache
from oem_gateway_spark.plans.explain import innermost_join_leaf_names
from oem_gateway_spark.suite.llm import CORPUS_SQL, _corpus
from oem_gateway_spark.suite.registry import query, register_conf_witness

# Jaccard threshold as an exact rational (7/10): every prefix-length and
# length-filter bound below is INTEGER arithmetic, so Spark and DuckDB
# can never disagree by a float ulp on which tokens are "in the prefix".
_SIM_NUM, _SIM_DEN = 7, 10


@query(
    "d_setsim_prefix_join",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    toks AS (SELECT doc_id,
                    list_distinct(
                      {H.shingles_sql(T.word_tokens_sql('text'))}) AS toks
             FROM corpus),
    grams AS (SELECT doc_id, unnest(toks) AS token FROM toks),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS s
              FROM grams GROUP BY doc_id),
    freq AS (SELECT token, CAST(count(*) AS BIGINT) AS f
             FROM grams GROUP BY token),
    ordered AS (
      SELECT g.doc_id, g.token, sz.s,
             row_number() OVER (PARTITION BY g.doc_id
                                ORDER BY fr.f, g.token) AS pos
      FROM grams g JOIN freq fr USING (token) JOIN sizes sz USING (doc_id)),
    prefix AS (
      SELECT doc_id, token, s FROM ordered
      WHERE pos <= s - (({_SIM_NUM} * s + {_SIM_DEN} - 1) // {_SIM_DEN}) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM prefix a JOIN prefix b USING (token)
      WHERE a.doc_id < b.doc_id
        AND {_SIM_DEN} * least(a.s, b.s) >= {_SIM_NUM} * greatest(a.s, b.s)),
    inter AS (
      SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
      FROM cand c
      JOIN grams ga ON ga.doc_id = c.id_a
      JOIN grams gb ON gb.doc_id = c.id_b AND gb.token = ga.token
      GROUP BY c.id_a, c.id_b),
    scored AS (
      SELECT i.id_a, i.id_b,
             round(i.i * 1.0 / (sa.s + sb.s - i.i), 6) AS jaccard
      FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                   JOIN sizes sb ON sb.doc_id = i.id_b)
    SELECT id_a, id_b, jaccard FROM scored
    WHERE jaccard >= {_SIM_NUM} * 1.0 / {_SIM_DEN}
    """,
)
def d_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity JOIN (all pairs with 3-word-shingle Jaccard
    >= 0.7) via PREFIX FILTERING: each doc's shingles are ordered by
    ascending global frequency and only the first ``s - ceil(0.7*s) +
    1`` (its RAREST shingles) enter the inverted candidate index.
    Shingle sets (not bare word sets) are the unit: the testdata's
    small vocabulary makes word SETS collide wholesale (146k natural
    word-set pairs at sf0.001 — quadratic output), while 3-shingles
    are near-unique per doc, so matches are the constructed
    copy/suffix near-dups — the same unit MinHash uses.

    New plan shape (r5 VERDICT #8): recall-LOSSLESS candidate pruning
    for an exact-threshold similarity join — if J(a,b) >= t then, with
    the length filter ``10*min(sa,sb) >= 7*max(sa,sb)`` (pairs failing
    it have J <= min/max < t), the intersection is >= ceil(t*sa), so a
    shares at least one of its prefix tokens with b (missing all of
    them caps the intersection at ``ceil(t*sa) - 1``) — the prefix-
    filtering theorem (Chaudhuri et al. SSJoin / Xiao et al. PPJoin,
    public literature).  Every near-dup query to date is either
    probabilistic-candidate (MinHash bands, SimHash bands, LSH buckets)
    or verify-given-pairs (d_ngram_jaccard); this is the deterministic
    exact join, and its oracle re-derives the same algorithm
    declaratively in SQL.

    All threshold arithmetic is integer (7/10 as a rational: prefix
    length uses ``(7*s + 9) // 10``), so the two engines cannot
    disagree on prefix membership; the final jaccard is a ratio of
    integers — the same IEEE division on both sides.

    Scale: the prefix explode carries ~0.3 of the token stream; the
    candidate join buckets on PREFIX tokens, which are each doc's
    rarest — hot tokens land in a prefix only when a doc has nothing
    rarer, so bucket sizes stay small by construction (the PPJoin
    insight; the residual hot-bucket risk is the same one the LSH
    mega-bucket valve documents).  The token-frequency table is
    vocabulary-sized (<< corpus) and broadcast; verification joins the
    deduped candidate list back to per-doc token arrays and intersects
    map-side via array_intersect."""
    corpus = _corpus(spark, sf_dir)
    toks = (
        corpus.select(
            "doc_id",
            F.array_distinct(
                H.shingles(T.word_tokens(F.col("text")))
            ).alias("toks"),
        )
        .withColumn("s", F.size("toks").cast("long"))
        .persist()  # feeds freq, the ordered prefix, and BOTH verify sides
    )
    return _own_cache(prefix_filter_join(toks), toks)


def prefix_filter_join(
    toks: DataFrame, num: int = _SIM_NUM, den: int = _SIM_DEN
) -> DataFrame:
    """All (id_a < id_b, jaccard) pairs with set-Jaccard >= num/den over
    ``toks`` (columns: doc_id, toks array<string> DISTINCT, s = size as
    long) — the prefix-filtering engine behind d_setsim_prefix_join,
    factored out so the recall-losslessness property test can drive it
    over adversarial synthetic sets against a brute-force reference."""
    grams = toks.select("doc_id", "s", F.explode("toks").alias("token"))
    freq = grams.groupBy("token").agg(F.count("*").alias("f"))
    w = Window.partitionBy("doc_id").orderBy("f", "token")
    prefix_len = (
        F.col("s")
        - F.expr(f"({num} * s + {den} - 1) div {den}")
        + F.lit(1)
    )
    # The candidate self-join keys on xxhash64(token), not the token
    # string: 3-word shingles average ~20-40 bytes, the hash is 8 — the
    # join's shuffle width drops ~4x.  Recall stays PROVABLY lossless:
    # the prefix ORDER (f, token) and the per-doc prefix length are
    # computed on true tokens, so the theorem's guarantee "J >= t =>
    # the docs share a prefix TOKEN" still holds, a shared token always
    # shares its hash, and a cross-token hash collision can only MERGE
    # buckets (extra candidates, removed by the exact verify below).
    prefix = (
        grams.join(F.broadcast(freq), "token")
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= prefix_len)
        .select("doc_id", "s", "pos", F.xxhash64("token").alias("tk"))
    )
    a = prefix.select(
        F.col("doc_id").alias("id_a"),
        F.col("s").alias("sa"),
        F.col("pos").alias("pa"),
        "tk",
    )
    b = prefix.select(
        F.col("doc_id").alias("id_b"),
        F.col("s").alias("sb"),
        F.col("pos").alias("pb"),
        "tk",
    )
    # PPJoin POSITIONAL filter (r14, guide §2.3/§3 — prune before the
    # expensive stage): J >= num/den forces an overlap of at least
    # alpha = ceil(num*(sa+sb)/(num+den)); for the FIRST token the pair
    # shares in the global (f, token) order — which the prefix theorem
    # already places in both prefixes — every shared token sits at or
    # after its position, so overlap <= 1 + min(sa - pa, sb - pb).  A
    # joined row failing that bound cannot be the pair's first-shared-
    # token row, and a true pair always SURVIVES via that row, so
    # recall stays lossless (Xiao et al.'s PPJoin, the same public
    # algorithm the prefix length comes from; integer arithmetic, so
    # engines cannot disagree).  Hash collisions on tk only ever ADD
    # rows, never remove a genuinely shared token's row.  Measured at
    # sf0.1: distinct verify candidates 315,477 -> 99,184 (3.2x), so
    # the array-carrying verify joins and the exact array_intersect run
    # on a third of the rows.
    alpha = F.expr(f"({num} * (sa + sb) + {num + den - 1}) div {num + den}")
    cand = (
        a.join(b, "tk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(den * F.least("sa", "sb") >= num * F.greatest("sa", "sb"))
        .filter(
            1 + F.least(F.col("sa") - F.col("pa"), F.col("sb") - F.col("pb"))
            >= alpha
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ta = toks.select(
        F.col("doc_id").alias("id_a"),
        F.col("toks").alias("ta"),
        F.col("s").alias("sa"),
    )
    tb = toks.select(
        F.col("doc_id").alias("id_b"),
        F.col("toks").alias("tb"),
        F.col("s").alias("sb"),
    )
    i = F.size(F.array_intersect("ta", "tb")).cast("long")
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(i * 1.0 / (F.col("sa") + F.col("sb") - i), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= num * 1.0 / den)
    )


_MERKLE_BUCKETS = 64


@query(
    "q_merkle_reconcile",
    oracle="""
    WITH a AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
    b AS (
      SELECT k, CASE WHEN k % 97 = 0 THEN p + 1.5 ELSE p END AS p
      FROM a WHERE k % 101 <> 0
      UNION ALL
      SELECT k + 30000000, p * 0.5 FROM a WHERE k % 103 = 0),
    j AS (SELECT a.k AS ka, b.k AS kb, a.p AS pa, b.p AS pb
          FROM a FULL OUTER JOIN b ON a.k = b.k)
    SELECT CAST(coalesce(ka, kb) AS BIGINT) AS o_orderkey,
           CASE WHEN kb IS NULL THEN 'only_a'
                WHEN ka IS NULL THEN 'only_b'
                ELSE 'changed' END AS status,
           floor(pa * 100 + 0.5) / 100 AS price_a,
           floor(pb * 100 + 0.5) / 100 AS price_b
    FROM j WHERE kb IS NULL OR ka IS NULL OR pa <> pb
    """,
)
def q_merkle_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation via HIERARCHICAL DIGESTS (the Merkle /
    anti-entropy pattern): snapshot B is A (orders) with deterministic
    drift injected — keys %97 repriced (+1.5), %101 deleted, %103
    mirrored to a new key at half price — and the report lists every
    drifted key as only_a / only_b / changed.

    New plan shape (r5 VERDICT #8): the row-level full-outer diff runs
    ONLY on rows whose BUCKET disagrees — each side first aggregates
    map-side to |buckets| rows (bucket -> xor of row digests + count;
    xor is the order-independent, overflow-free combiner), the two tiny
    digest tables join to find mismatched buckets, and that bucket list
    (a driver scalar, <= 64 ints) prunes both row streams as a literal
    IN filter BEFORE the expensive wide-row join.
    q_snapshot_diff full-outer-joins both snapshots in
    their entirety; at 100 TB with 1% drift the Merkle pass reads both
    snapshots once for kilobyte digest tables, then joins only the
    drifted buckets' rows (with hive-style bucketed layouts the prune
    becomes file-level pruning — no second full scan).

    The digests are Spark-internal (xxhash64 over normalized columns:
    price as integer cents, date as a formatted string) and never need
    cross-engine parity: the ORACLE diffs the snapshots directly — the
    bucket pruning is lossless (an equal bucket has equal xor+count;
    a missed diff needs a 64-bit xor collision AND an equal row count),
    so the pruned diff equals the direct diff.  Output prices round to
    cents via ``floor(x*100 + 0.5)/100`` — pure IEEE double ops, so the
    engines cannot disagree at half-cent boundaries (``p * 0.5`` of an
    odd-cent price IS such a boundary; library round( ,2) flipped a
    penny between Spark and DuckDB at sf0.01)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_orderkey").alias("k"),
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").alias("p"),
        "o_orderdate",
        "o_orderpriority",
    )
    b = a.filter(F.col("k") % 101 != 0).withColumn(
        "p",
        F.when(F.col("k") % 97 == 0, F.col("p") + 1.5).otherwise(F.col("p")),
    )
    inserts = a.filter(F.col("k") % 103 == 0).select(
        (F.col("k") + 30000000).alias("k"),
        "o_custkey",
        "o_orderstatus",
        (F.col("p") * 0.5).alias("p"),
        "o_orderdate",
        "o_orderpriority",
    )
    b = b.unionByName(inserts)

    def digested(df: DataFrame) -> DataFrame:
        return df.select(
            "k",
            "p",
            F.pmod(F.xxhash64("k"), F.lit(_MERKLE_BUCKETS)).alias("bucket"),
            F.xxhash64(
                "o_custkey",
                "o_orderstatus",
                F.round(F.col("p") * 100).cast("long"),
                F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
                "o_orderpriority",
            ).alias("digest"),
        )

    da, db = digested(a), digested(b)
    ha = da.groupBy("bucket").agg(
        F.bit_xor("digest").alias("xa"), F.count("*").alias("ca")
    )
    hb = db.groupBy("bucket").agg(
        F.bit_xor("digest").alias("xb"), F.count("*").alias("cb")
    )
    # The drifted-bucket list is <= _MERKLE_BUCKETS ints — a driver
    # scalar (same tier as the k-means centroid collect).  Collecting it
    # (a) runs the digest pass ONCE — as a broadcast-join input Spark
    # re-derives the whole digest subtree per pruned side, doubling the
    # snapshot scans — and (b) turns the prune into a literal IN filter,
    # which a production bucketed/partitioned layout elides into static
    # file pruning (the digest pass reads kilobyte footers, the row join
    # reads only drifted buckets' files).
    bad = [
        r[0]
        for r in ha.join(hb, "bucket", "full_outer")
        .filter(
            F.col("xa").isNull()
            | F.col("xb").isNull()
            | (F.col("xa") != F.col("xb"))
            | (F.col("ca") != F.col("cb"))
        )
        .select("bucket")
        .collect()
    ]
    pa = da.filter(F.col("bucket").isin(bad)).select(
        F.col("k").alias("ka"), F.col("p").alias("pa"), F.col("digest").alias("dga")
    )
    pb = db.filter(F.col("bucket").isin(bad)).select(
        F.col("k").alias("kb"), F.col("p").alias("pb"), F.col("digest").alias("dgb")
    )
    j = pa.join(pb, pa.ka == pb.kb, "full_outer")
    status = (
        F.when(F.col("kb").isNull(), F.lit("only_a"))
        .when(F.col("ka").isNull(), F.lit("only_b"))
        .when(F.col("dga") != F.col("dgb"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    def cents(c: Column) -> Column:
        return F.floor(c * 100 + 0.5) / 100

    return (
        j.select(
            F.coalesce("ka", "kb").alias("o_orderkey"),
            status.alias("status"),
            cents(F.col("pa")).alias("price_a"),
            cents(F.col("pb")).alias("price_b"),
        )
        .filter(F.col("status") != "same")
    )


_KMV_K = 128


@query(
    "q_kmv_intersect",
    oracle=f"""
    WITH d AS (SELECT DISTINCT o_orderpriority AS seg,
                      md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders),
    counts AS (SELECT seg, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY seg),
    r AS (SELECT seg, h,
                 row_number() OVER (PARTITION BY seg ORDER BY h) AS rn
          FROM d),
    sk AS (SELECT seg, list_sort(list(h)) AS sk FROM r
           WHERE rn <= {_KMV_K} GROUP BY seg),
    ex AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
                  CAST(count(*) AS BIGINT) AS exact_inter
           FROM d a JOIN d b ON a.h = b.h AND a.seg < b.seg GROUP BY 1, 2),
    pr AS (SELECT sa.seg AS seg_a, sb.seg AS seg_b, sa.sk AS ska,
                  sb.sk AS skb, ca.n AS n_a, cb.n AS n_b
           FROM sk sa JOIN sk sb ON sa.seg < sb.seg
           JOIN counts ca ON ca.seg = sa.seg
           JOIN counts cb ON cb.seg = sb.seg),
    m AS (SELECT seg_a, seg_b, n_a, n_b, ska, skb,
                 (list_sort(list_distinct(list_concat(ska, skb))))[1:{_KMV_K}]
                   AS ku
          FROM pr),
    sc AS (SELECT seg_a, seg_b, n_a, n_b,
                  CAST(len(ku) AS BIGINT) AS kl,
                  CAST(len(list_intersect(list_intersect(ku, ska), skb))
                       AS BIGINT) AS num
           FROM m)
    SELECT s.seg_a, s.seg_b, s.n_a, s.n_b,
           coalesce(e.exact_inter, 0) AS exact_inter,
           CAST((s.num * (s.n_a + s.n_b)) // (s.kl + s.num) AS BIGINT)
             AS est_inter,
           round(s.num * 1.0 / s.kl, 6) AS est_jaccard
    FROM sc s LEFT JOIN ex e USING (seg_a, seg_b)
    """,
)
def q_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-customer INTERSECTION between every pair of order
    priorities, estimated from KMV (k-minimum-values) sketches and
    audited against the exact count.

    New plan shape (r5 VERDICT #8): a mergeable ORDER-STATISTIC sketch.
    q_hll_partial_merge's HLL rollup is union-only — HLL cannot answer
    "how many distinct customers are in BOTH segments"; KMV can: merge
    two sketches by re-taking the k smallest of their union, estimate
    Jaccard as the fraction of those k that appear in both input
    sketches, and convert via |A∩B| = J/(1+J) * (|A|+|B|) (Beyer et
    al., "On synopses for distinct-value estimation under multiset
    operations", public literature).

    Determinism is the whole trick for the oracle: the hash is md5, so
    the k-min sketch — and therefore the ESTIMATE, not just the exact
    audit column — is a pure function of the data; and the estimate
    arithmetic stays in integers (J = num/kl as a rational:
    est = num*(n_a+n_b) div (kl+num)), so both engines produce
    bit-identical rows with no tolerance band.

    Scale: the sketch build is the scalable side — dedup (seg, hash)
    combines map-side into one shuffle, the per-segment k-min is the
    top-k-per-group window (at extreme cardinality a custom partial
    min-k aggregate replaces the window; the sketch MERGE tier is
    already kilobyte arrays either way).  The pair stage runs on
    |segments|^2/2 sketch rows — driver-scale.  The exact_inter column
    is the audit baseline (the expensive hash self-join the sketch
    replaces at 100 TB), kept here the way d_minhash_accuracy keeps
    true jaccard."""
    o = load_table(spark, sf_dir, "orders")
    # d feeds four consumers (counts, the sketch window, both exact-audit
    # sides); sk feeds both pair sides.  Persist both or the dedup
    # subtree replans once per consumer (caller releases the caches).
    d = (
        o.select(
            F.col("o_orderpriority").alias("seg"),
            F.md5(F.col("o_custkey").cast("string")).alias("h"),
        )
        .dropDuplicates(["seg", "h"])
        .persist()
    )
    counts = d.groupBy("seg").agg(F.count("*").alias("n"))
    w = Window.partitionBy("seg").orderBy("h")
    sk = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("seg")
        .agg(F.sort_array(F.collect_list("h")).alias("sk"))
        .join(counts, "seg")
        .persist()
    )
    a = sk.select(
        F.col("seg").alias("seg_a"), F.col("sk").alias("ska"),
        F.col("n").alias("n_a"),
    )
    b = sk.select(
        F.col("seg").alias("seg_b"), F.col("sk").alias("skb"),
        F.col("n").alias("n_b"),
    )
    ku = F.slice(
        F.sort_array(F.array_union(F.col("ska"), F.col("skb"))), 1, _KMV_K
    )
    pairs = (
        a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
        .withColumn("ku", ku)
        .withColumn("kl", F.size("ku").cast("long"))
        .withColumn(
            "num",
            F.size(
                F.array_intersect(
                    F.array_intersect(F.col("ku"), F.col("ska")),
                    F.col("skb"),
                )
            ).cast("long"),
        )
    )
    da = d.select(F.col("seg").alias("seg_a"), "h")
    db = d.select(F.col("seg").alias("seg_b"), "h")
    ex = (
        da.join(db, "h")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count("*").alias("exact_inter"))
    )
    out = (
        pairs.join(F.broadcast(ex), ["seg_a", "seg_b"], "left")
        .select(
            "seg_a",
            "seg_b",
            "n_a",
            "n_b",
            F.coalesce("exact_inter", F.lit(0).cast("long")).alias(
                "exact_inter"
            ),
            F.expr("(num * (n_a + n_b)) div (kl + num)").alias("est_inter"),
            F.round(F.col("num") * 1.0 / F.col("kl"), 6).alias("est_jaccard"),
        )
    )
    return _own_cache(out, d, sk)


def _dpp_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """Hive-partitioned copy of orders (partitionBy o_orderpriority)
    under per-PID scratch — the layout dynamic partition pruning needs.
    Written once per process; dead-owner dirs reaped by PID liveness
    (the bucketed-table discipline, cleaning_extra.py)."""
    import os

    from oem_gateway_spark.streaming.rollup import pid_scoped_dir
    from oem_gateway_spark.suite.streaming_batch import _source_fp

    safe = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    # Orders fingerprint added r7 (the shared-helper migration): without
    # it a testdata regeneration would leave this partitioned replica
    # stale while the oracle reads the fresh file.
    fp = _source_fp(sf_dir, table="orders")
    path = pid_scoped_dir("/root/repo/.scratch/dpp", f"orders_{safe}_{fp}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load_table(spark, sf_dir, "orders").write.mode(
            "overwrite"
        ).partitionBy("o_orderpriority").parquet(path)
    return path


@query(
    "q_dpp_prune",
    oracle="""
    WITH dim AS (
      SELECT o_orderpriority AS pri FROM (
        SELECT o_orderpriority, count(*) AS n,
               row_number() OVER (ORDER BY count(*), o_orderpriority) AS rk
        FROM orders GROUP BY o_orderpriority)
      WHERE rk <= 2)
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS revenue_cents
    FROM orders o JOIN dim ON o.o_orderpriority = dim.pri
    GROUP BY o.o_orderpriority
    """,
)
def q_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is a hive-partitioned
    orders layout, the dim side is the 2 least-common priorities —
    knowable only at RUNTIME (a rank over an aggregate, opaque to
    static pruning) — and Spark must inject the dim's values into the
    fact scan's PartitionFilters (`dynamicpruningexpression`), reading
    2 of 5 partition directories instead of all of them.

    New plan surface (r5 VERDICT #8): every other physical-optimization
    showcase in the registry witnesses a different lever — q6 static
    pushdown, q3/q5 broadcast, q_bucketed_join co-located layout, the
    AQE confs session-wide; none exercises runtime partition pruning,
    THE scan-reduction mechanism for 100 TB star joins on partitioned
    lakehouse tables (a date-partitioned fact joined to a filtered date
    dim prunes years of data before I/O).  The plan test pins the
    dynamicpruning expression in the scan.

    The dim's global rank runs on the 5-row aggregated priority table
    (bounded by the partition-key domain, q_skyline's argument);
    revenue sums INTEGER cents (the order-independent money
    discipline).  Oracle: the same join semantics on the plain table —
    pruning must never change results, only I/O."""
    fact = spark.read.parquet(_dpp_orders_path(spark, sf_dir))
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.asc("n"), F.asc("o_orderpriority"))
    dim = (
        o.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select(F.col("o_orderpriority").alias("pri"))
    )
    return (
        fact.join(dim, fact.o_orderpriority == dim.pri)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5)
            ).alias("revenue_cents"),
        )
    )


@query(
    "q_bloom_prune",
    oracle="""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 2
    GROUP BY p.p_brand
    """,
)
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: lineitem joins a selectively
    filtered part (p_size <= 2, runtime-opaque selectivity) with
    broadcast disabled, and Catalyst's InjectRuntimeFilter builds a
    bloom filter from the dim's join keys and applies
    ``might_contain(xxhash64(l_partkey))`` to the FACT SCAN — rows that
    cannot join are dropped before the shuffle, not after it.

    New plan surface: the row-level counterpart to q_dpp_prune.  DPP
    prunes whole partition DIRECTORIES via partition-column filters;
    the bloom filter prunes ROWS on non-partition join keys — together
    they are Spark's two runtime scan-reduction levers, and the
    registry now witnesses both.  At 100 TB this is the difference
    between shuffling the full fact table and shuffling the ~selectivity
    fraction that can actually join (a 2% dim filter keeps ~2% of fact
    shuffle bytes, minus bloom false positives).

    The query lowers the app-side scan-size threshold (10GB default —
    right for production, unreachable at test scale) and disables
    broadcast so the shuffle-join injection path executes; BOTH confs
    are in session.RUNTIME_CONF_KEYS, so the registry wrapper resets
    them on the next query call — the mutation cannot leak across
    queries.  A bloom filter has no false negatives, so results are
    identical to the plain join (the oracle); the plan test pins
    might_contain + bloom_filter_agg in the optimized plan."""
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 2)
    out = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
    )
    # Verify eagerly that InjectRuntimeFilter actually fired (the frame is
    # lazy; a conf race would otherwise surface as a silent plan change,
    # not an error).  The optimized plan is a cached lazy val, so this
    # forces it exactly once.
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    if "might_contain" not in optimized:
        raise RuntimeError(
            "q_bloom_prune: InjectRuntimeFilter did not fire — "
            "bloom-filter conf was reset between build and plan time?"
        )
    # The confs deliberately stay mutated until the next registry build
    # (the wrapper's ensure_runtime_conf resets them): PHYSICAL planning
    # and AQE's runtime re-optimization read the session conf at ACTION
    # time, so restoring here would let the small dim broadcast and the
    # executed plan would be a BroadcastHashJoin with the bloom probe as
    # pure overhead — the witness this query exists for (shuffle join
    # whose fact rows are bloom-pruned BEFORE the exchange) would
    # silently stop executing (caught by an r7 code review after an
    # eager-restore attempt).  Call sites must therefore execute this
    # frame BEFORE building any other registry query — bench.py and the
    # driver both do (build -> action -> next query).  The leak is
    # bounded to that one gap; test_plans pins both the conf lifecycle
    # and the SortMergeJoin in the executed plan, and the registry's
    # conf-witness check (registry.register_conf_witness) makes an
    # out-of-order call site fail loudly at its next build (r7 ADVICE).
    register_conf_witness(spark, "q_bloom_prune")
    return out


# ---------------------------------------------------------- q_cbo_join_reorder

# Catalog twins with column statistics: CBO needs ANALYZEd tables (plain
# parquet scans carry size-only estimates), so the three join inputs are
# written once per (sf_dir, source fingerprint, pid) as EXTERNAL tables
# under per-PID scratch and ANALYZE ... FOR COLUMNS'd.  Only the columns
# the query touches are materialized.
_CBO_TABLES = [
    ("lineitem", ["l_orderkey", "l_extendedprice"]),
    ("orders", ["o_orderkey", "o_custkey", "o_orderpriority"]),
    ("customer", ["c_custkey", "c_mktsegment"]),
]


def _cbo_tables(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    import os

    from oem_gateway_spark.streaming.rollup import reap_dead_owner_dirs
    from oem_gateway_spark.suite.streaming_batch import _source_fp

    base = "/root/repo/.scratch/cbo"
    reap_dead_owner_dirs(base)
    safe = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    pid = os.getpid()
    names: dict[str, str] = {}
    for t, cols in _CBO_TABLES:
        fp = _source_fp(sf_dir, table=t).replace("-", "_")
        name = f"cbo_{t}_{safe}_{fp}_pid{pid}"
        names[t] = name
        if not spark.catalog.tableExists(name):
            (
                load_table(spark, sf_dir, t)
                .select(*cols)
                .write.mode("overwrite")
                .option("path", os.path.join(base, name))
                .saveAsTable(name)
            )
            spark.sql(
                f"ANALYZE TABLE {name} COMPUTE STATISTICS "
                f"FOR COLUMNS {', '.join(cols)}"
            )
    return names


@query(
    "q_cbo_join_reorder",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderpriority
    """,
)
def q_cbo_join_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based join reordering: the SQL text joins the two FACTS
    first (lineitem x orders) and the selective dim (customer filtered
    to one mktsegment) last; with table/column statistics (ANALYZE) and
    spark.sql.cbo.joinReorder on, Catalyst rewrites the join tree to
    (orders x filtered-customer) first — the selective semi-reduction
    runs BEFORE the expensive fact-fact join touches it, cutting its
    probe side ~5x at any scale.

    New engine surface: the last classical optimizer lever the
    physical-optimization showcase family lacked — static pushdown
    (q6), broadcast (q3/q5), bucketing (q_bucketed_join), AQE
    (session-wide), DPP (q_dpp_prune), runtime bloom pruning
    (q_bloom_prune), and now STATS-DRIVEN LOGICAL REORDERING.  At
    100 TB a star query's join order is the difference between
    shuffling the fact once against a reduced key set and shuffling it
    against everything; catalogs carry these statistics precisely so
    the optimizer, not the query author, picks the order.

    The builder VERIFIES the reorder fired (the filtered dim's
    relation must precede the fact in the optimized tree) and the
    same leak-until-next-build conf discipline as q_bloom_prune
    applies: both cbo confs are in RUNTIME_CONF_KEYS, reset by the
    wrapper on the next registry build; call sites execute this frame
    before building another query.  Reordering never changes results —
    the oracle is the same join over the raw views."""
    names = _cbo_tables(spark, sf_dir)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    out = spark.sql(f"""
      SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS revenue_cents
      FROM {names['lineitem']} l
      JOIN {names['orders']} o ON l.l_orderkey = o.o_orderkey
      JOIN {names['customer']} c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY o.o_orderpriority""")
    # Walk the optimized-plan TREE (r7 ADVICE: table names also appear in
    # pushed-filter / file-listing annotations of the plan STRING, so
    # substring positions can pass or fail for unrelated reasons): after the
    # reorder, the bottom-most join must be (orders x filtered customer) —
    # its leaf relations contain the customer table and NOT lineitem.
    inner_leaves = " | ".join(innermost_join_leaf_names(out))
    if names["customer"] not in inner_leaves or names["lineitem"] in inner_leaves:
        raise RuntimeError(
            "q_cbo_join_reorder: join reorder did not fire — the bottom-most "
            f"join reads [{inner_leaves}] instead of (orders x customer) "
            "(stats missing or cbo conf reset between build and plan time?)"
        )
    register_conf_witness(spark, "q_cbo_join_reorder")
    return out
