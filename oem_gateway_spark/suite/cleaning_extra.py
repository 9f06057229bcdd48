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
