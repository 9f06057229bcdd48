"""Data-cleaning suite, cycle 5: fuzzy entity matching with blocking —
the edit-distance resolution step every ingestion pipeline runs against
a canonical dimension, expressed as a BLOCKED join (never all-pairs).

Determinism: levenshtein is integer-valued and identically defined in
Spark and DuckDB; the argmin tiebreak is lexicographic on the candidate
name, so the chosen match cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.registry import query


@query(
    "q_fuzzy_match",
    oracle="""
    WITH clean AS (SELECT DISTINCT p_name FROM part),
    dirty AS (
      SELECT substr(p_name, 1, 1) || substr(p_name, 3) AS dirty_name,
             split_part(p_name, ' ', -1) AS block_key
      FROM clean
    ), blocked AS (
      SELECT d.dirty_name, c.p_name AS cand,
             levenshtein(d.dirty_name, c.p_name) AS dist,
             row_number() OVER (PARTITION BY d.dirty_name
                                ORDER BY levenshtein(d.dirty_name, c.p_name),
                                         c.p_name) AS rk
      FROM dirty d JOIN clean c
        ON d.block_key = split_part(c.p_name, ' ', -1)
    )
    SELECT dirty_name, cand AS best_match, CAST(dist AS INT) AS dist
    FROM blocked WHERE rk = 1
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: corrupted part names (second character
    deterministically dropped — the typo model) matched back to the
    canonical name list by minimum edit distance WITHIN BLOCKS keyed on
    the name's last token.

    The blocking key is chosen to be provably robust to the corruption
    model (the dropped character never touches the last word), so
    blocking loses zero recall while cutting the comparison space from
    |dirty| x |clean| to the block sizes — the always-applicable
    entity-resolution scale pattern: at 100 TB you block on whatever
    the corruption cannot reach (zip code, normalized domain, sorted
    token signature), and the quadratic edit-distance work only happens
    inside blocks.  The argmin per dirty name is a row_number window
    with a lexicographic tiebreak.

    Plan: both sides derive from one distinct-names aggregate; the
    blocked join shuffles on the block key; levenshtein evaluates only
    on block-local pairs; the final window partitions by dirty name."""
    clean = load_table(spark, sf_dir, "part").select("p_name").distinct()
    last_word = F.element_at(F.split(F.col("p_name"), " "), -1)
    dirty = clean.select(
        F.concat(
            F.substring("p_name", 1, 1), F.expr("substr(p_name, 3)")
        ).alias("dirty_name"),
        last_word.alias("block_key"),
    )
    cand = clean.select(
        F.col("p_name").alias("cand"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("c_block"),
    )
    blocked = dirty.join(cand, F.col("block_key") == F.col("c_block")).select(
        "dirty_name",
        "cand",
        F.levenshtein("dirty_name", "cand").alias("dist"),
    )
    w = Window.partitionBy("dirty_name").orderBy(F.asc("dist"), F.asc("cand"))
    return (
        blocked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("dirty_name", F.col("cand").alias("best_match"), F.col("dist").cast("int").alias("dist"))
    )


@query(
    "q_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over PRE-BUCKETED tables: lineitem and orders
    both saved bucketed+sorted on the order key (16 buckets, one file
    per bucket), so the sort-merge join reads co-located buckets with
    ZERO exchange — the shuffle moves to WRITE time, paid once,
    amortized over every subsequent join on that key.  This is the
    single biggest lever for a 100 TB star/snowflake layout
    (test_bucketed_join_no_shuffle pins the exchange count at 1 — the
    final aggregation only).  The SMJ's partition-local sorts remain
    (Spark 3+ ignores bucket sort order by default,
    spark.sql.legacy.bucketedTableScan.outputOrdering restores the
    elision); they are in-partition, exchange-free, and spill-aware —
    the cheap half of the join.

    The bucketed copies rewrite once per session (the in-memory
    catalog forgets table metadata between sessions; the bench's
    repeat passes reuse them via tableExists).  Table names and paths
    are PER-PROCESS: two concurrent sessions writing one shared path
    corrupt each other's bucket files mid-read (observed as a flaky
    oracle mismatch under parallel pytest runs); dead-owner dirs are
    reaped by PID liveness, same discipline as the rollup-store GC."""
    import os

    from oem_gateway_spark.streaming.rollup import reap_dead_owner_dirs

    safe = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    pid = os.getpid()
    # Naming and GC via the shared per-process scratch discipline
    # (streaming/rollup.py::reap_dead_owner_dirs — the four hand-rolled
    # copies had started to diverge; code-review r7).
    li_t, o_t = f"bkt_lineitem_{safe}_pid{pid}", f"bkt_orders_{safe}_pid{pid}"
    base = "/root/repo/.scratch/bucketed"
    reap_dead_owner_dirs(base)
    if not spark.catalog.tableExists(li_t):
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount")
            # repartition on the bucket hash first: one writer task per
            # bucket -> ONE file per bucket -> the reader trusts the
            # per-bucket sortBy order and elides the SMJ sorts too.
            .repartition(16, F.col("l_orderkey"))
            .write.bucketBy(16, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(base, li_t))
            .mode("overwrite")
            .saveAsTable(li_t)
        )
    if not spark.catalog.tableExists(o_t):
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .repartition(16, F.col("o_orderkey"))
            .write.bucketBy(16, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(base, o_t))
            .mode("overwrite")
            .saveAsTable(o_t)
        )
    # merge hint: at test SFs the orders side fits the broadcast
    # threshold and Spark would pick BHJ, silently bypassing the
    # bucketed path this query exists to prove; at 100 TB neither side
    # broadcasts and SMJ is what the planner picks unhinted.
    li = spark.table(li_t).hint("merge")
    o = spark.table(o_t).hint("merge")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


@query(
    "t_length_profile",
    oracle="""
    WITH prof AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             round(quantile_cont(n_chars, 0.1), 4) AS p10,
             round(quantile_cont(n_chars, 0.5), 4) AS p50,
             round(quantile_cont(n_chars, 0.9), 4) AS p90
      FROM documents GROUP BY source
    )
    SELECT p.source, p.n_docs, p.p10, p.p50, p.p90,
           CAST(sum(CASE WHEN d.n_chars < p.p10 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below_p10
    FROM prof p JOIN documents d ON d.source = p.source
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def t_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length percentile profile (p10/p50/p90 exact
    interpolated percentiles) plus the count of docs under the source's
    own p10 — the curation pass that decides per-source length cutoffs
    before filtering (outlier-length docs are boilerplate or
    truncation artifacts; a GLOBAL cutoff over-prunes short-form
    sources, hence per-source).

    Plan: exact grouped percentiles sort within each source group (one
    user-key shuffle); the below-p10 count decorrelates to a join of
    the per-source thresholds back onto documents — at 100 TB swap
    approx_percentile in with the identical plan (q_mad_outliers'
    note).  The oracle's correlated subquery is the agreement form,
    not the plan."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    prof = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.1)"), 4).alias("p10"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90"),
    )
    below = (
        docs.join(F.broadcast(prof.select("source", "p10")), "source")
        .filter(F.col("n_chars") < F.col("p10"))
        .groupBy("source")
        .agg(F.count("*").alias("n_below_p10"))
    )
    return (
        prof.join(below, "source", "left")
        .select(
            "source",
            "n_docs",
            "p10",
            "p50",
            "p90",
            F.coalesce(F.col("n_below_p10"), F.lit(0))
            .cast("long")
            .alias("n_below_p10"),
        )
    )
