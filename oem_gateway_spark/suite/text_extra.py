"""Corpus-analysis extras for training-data pipelines: intra-document
repetition, corpus-wide boilerplate n-grams, PII scrubbing, and
Gopher-style word-level quality rules.

These are the remaining hygiene passes a pre-training pipeline runs after
dedup/quality gating (repetitious docs and boilerplate n-grams are the
classic web-scrape failure modes; PII scrubbing is a compliance pass).
All rules are JVM built-in expressions with DuckDB twins built from the
same constants (functions/text.py conventions); per-doc ops are pure map
work, corpus ops are explode + partial-agg shuffles keyed well below the
doc count — both shapes hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.functions import hashing as H
from oem_gateway_spark.suite.registry import query

# Deterministic PII injection: the synthetic corpus has no emails/phones, so
# both engines append the SAME fake PII to a doc_id-selected subset; the
# scrub operator is then measurably non-trivial.
PII_EMAIL = " contact alice.smith@example-site.org for details"
PII_PHONE = " or call 555-0142 9am-5pm"
EMAIL_REGEX = "[a-z0-9.-]+@[a-z0-9.-]+"
PHONE_REGEX = "[0-9]{3}-[0-9]{4}"


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, spread across cores.  Testdata ships ONE parquet file =
    one input split, which would serialize the CPU-bound tokenize/shingle
    map work onto a single core; the (cheap: raw text only) repartition
    stands in for the many-split layout a real 100 TB corpus arrives in —
    on a cluster, file splits already provide this and the repartition
    is unnecessary (same note as llm._corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.repartition(spark.sparkContext.defaultParallelism)


@query(
    "t_repetition",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {H.words_sql('text')} AS w FROM documents
    ), grams AS (
      SELECT doc_id, unnest({H.shingles_sql('w', 2)}) AS g FROM toks
    ), counts AS (
      SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(max(c) AS BIGINT) AS top_count,
           round(max(c) / sum(c), 6) AS top_ratio
    FROM counts GROUP BY doc_id
    """,
)
def t_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: the fraction of a doc's word bigrams
    taken by its single most frequent bigram (near 1.0 = degenerate
    repetitious text, a standard pre-training removal rule).

    Shape: ZERO shuffle.  The doc's mode-bigram count is a per-row array
    fold — sort the bigram array, then a linear run-length fold
    (aggregate HOF, all codegen) — so the whole query fuses with the
    parquet scan.  The explode + two-level-agg twin (what the oracle
    runs) shuffles every (doc_id, bigram) pair twice; at sf0.1 the fold
    is ~6x faster, and at 100 TB it's the difference between a map-only
    pass and shuffling the tokenized corpus."""
    docs = _docs_spread(spark, sf_dir)
    grams = F.array_sort(H.shingles(H.words(F.col("text")), 2))
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc.best, run).alias("best")
        )

    return docs.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_bigrams"),
        F.aggregate(grams, init, step, lambda a: a.best).alias("top_count"),
    ).withColumn("top_ratio", F.round(F.col("top_count") / F.col("n_bigrams"), 6))


@query(
    "t_boilerplate_ngrams",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {H.words_sql('text')} AS w FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, unnest({H.shingles_sql('w', 8)}) AS g FROM toks
    ), freq AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_docs FROM grams GROUP BY g
      HAVING count(*) >= 3
    )
    SELECT g, n_docs FROM freq ORDER BY n_docs DESC, g LIMIT 20
    """,
)
def t_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide boilerplate detection: 8-grams appearing in >= 3
    DISTINCT documents, top-20 by document frequency (ties broken by gram
    text for determinism).  This is the n-gram side of boilerplate
    removal — headers/footers/licenses shared across scraped pages.

    Shape: ONE shuffle.  Per-doc dedup happens map-side via
    array_distinct BEFORE the explode (identical semantics to a
    (doc_id, gram) DISTINCT, minus its full shuffle of the exploded
    corpus), so the only exchange is the gram-count aggregation — which
    partial-combines map-side.  The final top-20 is a TakeOrdered (no
    global sort materialization).  Contrast with d_contamination, which
    probes a specific benchmark set instead of ranking the whole
    corpus."""
    docs = _docs_spread(spark, sf_dir)
    grams = docs.select(
        F.explode(F.array_distinct(H.shingles(H.words(F.col("text")), 8))).alias("g")
    )
    freq = (
        grams.groupBy("g")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
    )
    return freq.orderBy(F.desc("n_docs"), F.asc("g")).limit(20)


@query(
    "t_pii_scrub",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 7 = 0 THEN '{PII_EMAIL}' ELSE '' END
               || CASE WHEN doc_id % 11 = 0 THEN '{PII_PHONE}' ELSE '' END
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_REGEX}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_REGEX}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{EMAIL_REGEX}', '<EMAIL>', 'g'),
                              '{PHONE_REGEX}', '<PHONE>', 'g')) AS scrub_fp
    FROM injected
    """,
)
def t_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: count and redact email/phone patterns, emitting
    the md5 of the scrubbed text (so the oracle verifies the exact
    redacted bytes, not just the counts).  The synthetic corpus carries no
    PII, so both engines first inject identical fake PII into a
    deterministic doc_id subset.

    Pure map operator — regex count + replace fuse into the scan's
    codegen stage; at 100 TB this pipelines with ingest at IO speed."""
    docs = _docs_spread(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(PII_EMAIL)).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(PII_PHONE)).otherwise(F.lit("")),
        ).alias("text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_REGEX, "<EMAIL>"),
        PHONE_REGEX,
        "<PHONE>",
    )
    return injected.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_REGEX), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_REGEX), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrub_fp"),
    )


# Chunking geometry: 50-word chunks, 40-word stride (10-word overlap) — the
# fixed-context packing shape LLM pre-training uses.  n_chunks =
# max(1, ceil((n_words - overlap) / stride)) covers every word; short docs
# yield exactly one (possibly short) chunk.
CHUNK_SIZE = 50
CHUNK_STRIDE = 40
CHUNK_OVERLAP = CHUNK_SIZE - CHUNK_STRIDE


@query(
    "t_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {H.words_sql('text')} AS w FROM documents
    ), ix AS (
      SELECT doc_id, w,
             unnest(generate_series(0,
               CAST(greatest(1, ceil((len(w) - {CHUNK_OVERLAP}) / {CHUNK_STRIDE}.0))
                    AS INT) - 1)) AS chunk_id
      FROM toks
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(list_slice(w, chunk_id * {CHUNK_STRIDE} + 1,
                               chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE})) AS INT)
             AS n_tokens,
           md5(array_to_string(
               list_slice(w, chunk_id * {CHUNK_STRIDE} + 1,
                          chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' '))
             AS chunk_fp
    FROM ix
    """,
)
def t_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking with overlap: split each doc into 50-word chunks
    on a 40-word stride (10 words shared between neighbors), emitting the
    chunk's token count and an md5 fingerprint of its exact text (so the
    oracle verifies chunk CONTENT, not just counts).  This is the
    sequence-packing precursor: fixed-size training contexts cut from
    variable-length documents without losing cross-boundary n-grams.

    Shape: tokenize once per doc, explode only the chunk INDEX (a tiny int
    array), slice the token array per index — the text itself is never
    duplicated pre-explode, and no shuffle happens at all: chunking fuses
    with the scan, so at 100 TB it streams through at IO speed and the
    output can be written partitioned by shard directly."""
    docs = _docs_spread(spark, sf_dir)
    w = H.words(F.col("text"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(w) - F.lit(CHUNK_OVERLAP)) / F.lit(CHUNK_STRIDE)).cast("int"),
    )
    toks = docs.select("doc_id", w.alias("w"), n_chunks.alias("n_chunks"))
    ix = toks.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
    )
    chunk = F.expr(f"slice(w, chunk_id * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})")
    return ix.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )


# Synthetic URL grammar for d_url_canonical: the corpus has no URLs, so both
# engines derive the SAME messy URL from (doc_id, source) — mixed-case
# scheme/host, optional www., optional trailing slash, tracking params in
# two positions — and must agree on the canonical form.
_URL_TRACK_RE = "utm_[a-z]+=[^&]*"


@query(
    "d_url_canonical",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://'
               || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
               || source || '.Example.COM/articles/' || (doc_id % 37)
               || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
               || CASE WHEN doc_id % 2 = 0
                       THEN '?utm_source=feed&id=' || (doc_id % 97)
                       WHEN doc_id % 7 = 0
                       THEN '?id=' || (doc_id % 97) || '&utm_campaign=x'
                       ELSE '' END
               AS url
      FROM documents
    ), canon AS (
      SELECT doc_id, url,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://[^/]*'))
                                    || substr(url, length(regexp_extract(url, '^[A-Za-z]+://[^/]*')) + 1),
                     '^(https?://)www\\.', '\\1'),
                   '{_URL_TRACK_RE}', '', 'g'),
                 '\\?&', '?'),
               '&$', ''), '/\\?', '?') AS c0
      FROM raw
    ), cleaned AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(c0, '\\?$', ''), '/$', '') AS canonical_url
      FROM canon
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id
    FROM cleaned GROUP BY canonical_url
    """,
)
def d_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the crawl-side twin of content dedup:
    scheme/host lowercased, ``www.`` stripped, tracking params
    (``utm_*``) removed, dangling ``?``/``&`` and trailing slash dropped;
    docs then grouped by canonical URL (keep-first representative =
    min doc_id).  The corpus ships no URLs, so both engines synthesize the
    same messy URL per doc first (grammar above) — the operator under test
    is the canonicalizer.

    Shape: pure map (regex chain fuses with the scan) + one hash
    aggregation on the canonical key.  At 100 TB URL-level dedup runs
    BEFORE content dedup because it needs no text shuffle at all — only
    the (short) canonical URL column ever reaches an exchange."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
            F.col("source"),
            F.lit(".Example.COM/articles/"),
            (F.col("doc_id") % 37).cast("string"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit("?utm_source=feed&id="), (F.col("doc_id") % 97).cast("string")
                ),
            )
            .when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit("?id="),
                    (F.col("doc_id") % 97).cast("string"),
                    F.lit("&utm_campaign=x"),
                ),
            )
            .otherwise(F.lit("")),
        ).alias("url"),
    )
    prefix = F.regexp_extract(F.col("url"), "^[A-Za-z]+://[^/]*", 0)
    rejoined = F.concat(
        F.lower(prefix), F.expr("substring(url, length(regexp_extract(url, '^[A-Za-z]+://[^/]*', 0)) + 1)")
    )
    c = F.regexp_replace(rejoined, r"^(https?://)www\.", "$1")
    c = F.regexp_replace(c, _URL_TRACK_RE, "")
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, "&$", "")
    c = F.regexp_replace(c, r"/\?", "?")
    c = F.regexp_replace(c, r"\?$", "")
    c = F.regexp_replace(c, "/$", "")
    return (
        raw.select("doc_id", "url", c.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("url").alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


@query(
    "t_gopher_quality",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {H.words_sql('text')} AS w, text FROM documents
    ), stats AS (
      SELECT doc_id,
             CAST(len(w) AS INT) AS n_words,
             round(list_aggregate(list_transform(w, x -> length(x)), 'sum')
                   / len(w), 4) AS mean_word_len,
             CAST(list_aggregate(list_transform(w, x -> length(x)), 'max')
                  AS INT) AS max_word_len,
             round(len(list_filter(w, x -> regexp_full_match(x, '[0-9]+')))
                   / len(w), 6) AS digit_frac
      FROM toks
    )
    SELECT doc_id, n_words, mean_word_len, max_word_len, digit_frac,
           (n_words >= 20 AND mean_word_len >= 3 AND mean_word_len <= 10
            AND digit_frac <= 0.2) AS passes
    FROM stats
    """,
)
def t_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style word-level quality rules (mean/max word length in
    range, bounded digit-token fraction, minimum length) with a combined
    pass flag — the repetition and line rules live in t_repetition /
    t_quality_score.  Pure map work over the token array: no shuffle,
    fuses with the scan."""
    docs = _docs_spread(spark, sf_dir)
    w = H.words(F.col("text"))
    lens = F.transform(w, lambda x: F.length(x))
    stats = docs.select(
        "doc_id",
        F.size(w).cast("int").alias("n_words"),
        F.round(
            F.aggregate(lens, F.lit(0), lambda a, x: a + x) / F.size(w), 4
        ).alias("mean_word_len"),
        F.array_max(lens).cast("int").alias("max_word_len"),
        F.round(
            F.size(F.filter(w, lambda x: x.rlike("^[0-9]+$"))) / F.size(w), 6
        ).alias("digit_frac"),
    )
    return stats.select(
        "*",
        (
            (F.col("n_words") >= 20)
            & (F.col("mean_word_len") >= 3)
            & (F.col("mean_word_len") <= 10)
            & (F.col("digit_frac") <= 0.2)
        ).alias("passes"),
    )


@query(
    "d_chunk_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {H.words_sql('text')} AS w FROM documents
    ), ix AS (
      SELECT doc_id, w,
             unnest(generate_series(0,
               CAST(greatest(1, ceil((len(w) - {CHUNK_OVERLAP}) / {CHUNK_STRIDE}.0))
                    AS INT) - 1)) AS chunk_id
      FROM toks
    ), chunks AS (
      SELECT doc_id, chunk_id,
             md5(array_to_string(
                 list_slice(w, chunk_id * {CHUNK_STRIDE} + 1,
                            chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' '))
               AS chunk_fp
      FROM ix
    ), ranked AS (
      SELECT doc_id, chunk_id, chunk_fp,
             row_number() OVER (PARTITION BY chunk_fp
                                ORDER BY doc_id, chunk_id) AS rn
      FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           round(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS keep_ratio
    FROM ranked GROUP BY doc_id
    """,
)
def d_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup (the C4/paragraph-dedup pattern at chunk
    granularity): every 50-word chunk is fingerprinted corpus-wide and
    only its FIRST occurrence (lowest doc_id, then chunk_id) survives;
    per doc, the kept-chunk count and ratio — low keep_ratio = the doc is
    mostly text that already exists elsewhere, the span-level signal that
    whole-doc dedup misses (boilerplate embedded in otherwise-unique
    pages).

    Shape: chunk fingerprints shuffle ONCE on chunk_fp for the
    keep-first window, then once on doc_id for the per-doc rollup — both
    keyed exchanges carry (ids + 128-bit fp), never text.  At 100 TB this
    is exactly how paragraph dedup runs: fingerprint spans map-side,
    window on the fp, aggregate survivors."""
    docs = _docs_spread(spark, sf_dir)
    from pyspark.sql.window import Window

    w = H.words(F.col("text"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(w) - F.lit(CHUNK_OVERLAP)) / F.lit(CHUNK_STRIDE)).cast("int"),
    )
    toks = docs.select("doc_id", w.alias("w"), n_chunks.alias("n_chunks"))
    ix = toks.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
    )
    chunk = F.expr(f"slice(w, chunk_id * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})")
    chunks = ix.select(
        "doc_id", "chunk_id", F.md5(F.array_join(chunk, " ")).alias("chunk_fp")
    )
    keep_first = Window.partitionBy("chunk_fp").orderBy("doc_id", "chunk_id")
    ranked = chunks.withColumn("rn", F.row_number().over(keep_first))
    kept = F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        kept.alias("n_kept"),
        F.round(kept * 1.0 / F.count("*"), 6).alias("keep_ratio"),
    )


@query(
    "d_weighted_sample",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len({H.words_sql('text')}) AS n_words
      FROM documents
    )
    SELECT doc_id, CAST(n_words AS INT) AS n_words
    FROM scored
    WHERE CAST('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 1000
          < least(n_words, 500)
    """,
)
def d_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling: each doc's inclusion probability
    is proportional to its length (capped at 50%) — upsampling long,
    information-dense documents in a training mix, reproducibly.  Same
    md5-threshold primitive as q_stratified_sample with a per-row weight
    instead of per-stratum rates: hash(doc) mod 1000 < weight.  No RNG
    state, replay/retry-stable, pure map filter that fuses with the
    scan."""
    from oem_gateway_spark.functions.hashing import hash32

    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(H.words(F.col("text")))
    scored = docs.select("doc_id", n_words.cast("int").alias("n_words"))
    bucket = hash32(F.col("doc_id").cast("string"), "wsamp") % 1000
    return scored.filter(bucket < F.least(F.col("n_words"), F.lit(500)))


@query(
    "pipeline_data_prep_v2",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 7 = 0 THEN '{PII_EMAIL}' ELSE '' END
               || CASE WHEN doc_id % 11 = 0 THEN '{PII_PHONE}' ELSE '' END
               AS text
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{EMAIL_REGEX}')) AS INT)
               + CAST(len(regexp_extract_all(text, '{PHONE_REGEX}')) AS INT)
               AS n_pii,
             regexp_replace(regexp_replace(text, '{EMAIL_REGEX}', '<EMAIL>', 'g'),
                            '{PHONE_REGEX}', '<PHONE>', 'g') AS text
      FROM injected
    ),
    stats AS (
      SELECT doc_id, n_pii, md5(text) AS fp,
             {{words}} AS w
      FROM scrubbed
    ),
    gated AS (
      SELECT doc_id, n_pii, fp, CAST(len(w) AS INT) AS n_words
      FROM stats
      WHERE len(w) >= 20
        AND list_aggregate(list_transform(w, x -> length(x)), 'sum')
            / len(w) BETWEEN 3 AND 10
        AND len(list_filter(w, x -> regexp_full_match(x, '[0-9]+')))
            / len(w) <= 0.2
    ),
    dedup AS (
      SELECT doc_id, n_pii, n_words,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM gated
    )
    SELECT doc_id, n_pii, n_words,
           CAST(greatest(1, ceil((n_words - {CHUNK_OVERLAP}) * 1.0
                                 / {CHUNK_STRIDE})) AS INT) AS n_chunks
    FROM dedup WHERE rn = 1
    """.replace("{words}", H.words_sql("text")),
)
def pipeline_data_prep_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep, second generation — the round-4
    gate set composed into ONE Catalyst plan: PII inject (test fixture)
    -> scrub (count + redact) -> Gopher word-quality gates on the
    SCRUBBED text -> exact dedup keep-first on the scrubbed fingerprint
    -> per-survivor chunk budget (the t_chunking geometry).

    Everything up to dedup is pure map work fused with the scan (regex,
    token arrays, gates); the ONLY exchange in the whole pipeline is the
    fingerprint window's hash shuffle — at 100 TB the pipeline streams
    the corpus once and shuffles (doc_id, fp, 3 ints), never text.
    Chunk counts come from the closed-form geometry formula, not an
    explode, so the output stays one row per surviving doc."""
    from pyspark.sql.window import Window

    docs = _docs_spread(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(PII_EMAIL)).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(PII_PHONE)).otherwise(F.lit("")),
        ).alias("text"),
    )
    scrub_text = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_REGEX, "<EMAIL>"),
        PHONE_REGEX,
        "<PHONE>",
    )
    n_pii = (
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_REGEX), F.lit(0)))
        + F.size(F.regexp_extract_all("text", F.lit(PHONE_REGEX), F.lit(0)))
    ).cast("int")
    scrubbed = injected.select(
        "doc_id", n_pii.alias("n_pii"), scrub_text.alias("text")
    )
    w = H.words(F.col("text"))
    lens = F.transform(w, lambda x: F.length(x))
    mean_len = F.aggregate(lens, F.lit(0), lambda a, x: a + x) / F.size(w)
    digit_frac = F.size(F.filter(w, lambda x: x.rlike("^[0-9]+$"))) / F.size(w)
    stats = scrubbed.select(
        "doc_id",
        "n_pii",
        F.md5("text").alias("fp"),
        F.size(w).cast("int").alias("n_words"),
        mean_len.alias("_mean_len"),
        digit_frac.alias("_digit_frac"),
    )
    gated = stats.filter(
        (F.col("n_words") >= 20)
        & F.col("_mean_len").between(3, 10)
        & (F.col("_digit_frac") <= 0.2)
    )
    keep_first = Window.partitionBy("fp").orderBy("doc_id")
    survivors = (
        gated.withColumn("_rn", F.row_number().over(keep_first))
        .filter(F.col("_rn") == 1)
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("n_words") - CHUNK_OVERLAP) * 1.0 / CHUNK_STRIDE),
    ).cast("int")
    return survivors.select(
        "doc_id", "n_pii", "n_words", n_chunks.alias("n_chunks")
    )


_BPE_WALK = """
walk{k}(word, i, out) AS (
  SELECT word, 1, CAST([] AS VARCHAR[]) FROM chars{k}
  UNION ALL
  SELECT w.word,
         CASE WHEN w.i < len(c.s) AND c.s[w.i] = m.x AND c.s[w.i + 1] = m.y
              THEN w.i + 2 ELSE w.i + 1 END,
         w.out || CASE WHEN w.i < len(c.s) AND c.s[w.i] = m.x AND c.s[w.i + 1] = m.y
                       THEN [c.s[w.i] || c.s[w.i + 1]] ELSE [c.s[w.i]] END
  FROM walk{k} w JOIN chars{k} c USING (word) CROSS JOIN m{k} m
  WHERE w.i <= len(c.s)
),
chars{k1} AS (SELECT w.word, c.wc, w.out AS s
              FROM walk{k} w JOIN chars{k} c USING (word)
              WHERE w.i = len(c.s) + 1)"""

_BPE_PAIRS = """
p{k} AS (SELECT s[i] AS x, s[i + 1] AS y, wc
         FROM chars{k}, unnest(range(1, len(s))) AS u(i)),
m{k} AS (SELECT x, y, n FROM (SELECT x, y, CAST(sum(wc) AS BIGINT) AS n
                              FROM p{k} GROUP BY x, y
                              ORDER BY n DESC, x, y LIMIT 1))"""


@query(
    "t_bpe_train",
    oracle=f"""
    WITH RECURSIVE
    toks AS (SELECT unnest({H.words_sql('text')}) AS word FROM documents),
    wcs AS (SELECT word, CAST(count(*) AS BIGINT) AS wc FROM toks GROUP BY word),
    chars1 AS (SELECT word, wc,
                      list_transform(range(1, length(word) + 1),
                                     i -> substr(word, i, 1)) AS s
               FROM wcs),
    {_BPE_PAIRS.format(k=1)},
    {_BPE_WALK.format(k=1, k1=2)},
    {_BPE_PAIRS.format(k=2)},
    {_BPE_WALK.format(k=2, k1=3)},
    total AS (SELECT CAST(sum(len(s) * wc) AS BIGINT) AS n_symbols_after
              FROM chars3)
    SELECT 1 AS rank, m1.x AS lhs, m1.y AS rhs, m1.n AS pair_count,
           total.n_symbols_after
    FROM m1, total
    UNION ALL
    SELECT 2, m2.x, m2.y, m2.n, total.n_symbols_after FROM m2, total
    """,
)
def t_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, two merge steps (operators/bpe.py): count
    frequency-weighted adjacent symbol pairs over the word dictionary,
    take the deterministic argmax, greedily merge it everywhere (codegen
    fold, exact non-overlapping left-to-right semantics), repeat.  The
    output is the learned merge table plus the post-merge corpus symbol
    count — every value integer/string-exact against the oracle's
    recursive-CTE replay of the same loop (no tolerance anywhere).

    Scale: iteration state is the VOCABULARY (distinct words x counts),
    not the corpus — the corpus is read once for word counts; each merge
    step is one pair-aggregate exchange over the dictionary plus a
    map-only rewrite; the driver holds exactly one (pair, count) row per
    step (same driver contract as clustering.kmeans_fit)."""
    from oem_gateway_spark.operators import bpe as B
    from oem_gateway_spark.operators.dedup import _own_cache

    docs = _docs_spread(spark, sf_dir)
    # the dictionary feeds every loop action (pair counts per step + the
    # final symbol total): persist it so the corpus tokenizes ONCE — the
    # at-scale contract (count words over 100 TB once, iterate on the
    # vocabulary-sized dictionary).  Caller releases via release_caches.
    wcs = (
        docs.select(F.explode(H.words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    ).persist()
    merges = B.bpe_train(wcs, n_merges=2)
    # re-derive the merged dictionary (map-only) for the symbol total
    words = wcs.withColumn("s", B.chars_of("word"))
    for _rank, x, y, _n in merges:
        words = B.apply_merge(words, x, y)
    total = words.agg(
        F.sum(F.size("s") * F.col("wc")).alias("n_symbols_after")
    )
    rows = spark.createDataFrame(
        [(r, x, y, n) for r, x, y, n in merges],
        "rank int, lhs string, rhs string, pair_count bigint",
    )
    return _own_cache(rows.join(F.broadcast(total)), wcs)
