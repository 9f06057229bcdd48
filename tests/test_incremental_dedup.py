"""Incremental exact dedup: batch-at-a-time ingestion against a
fingerprint store must agree with a from-scratch dedup of everything."""

from __future__ import annotations

from pyspark.sql import functions as F

from oem_gateway_spark.functions import text as T
from oem_gateway_spark.operators.dedup import (
    exact_dedup_increment,
    exact_dedup_keep_min,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_incremental_equals_full_dedup(spark):
    # batch 1: ids 0-5 with an internal duplicate pair (1,4)
    b1 = _docs(spark, [
        (0, "alpha beta"), (1, "dup text"), (2, "gamma"),
        (3, "delta"), (4, "dup text"), (5, "epsilon"),
    ])
    # batch 2: new content, a dup of batch-1 content, an internal dup pair
    b2 = _docs(spark, [
        (10, "zeta"), (11, "dup text"), (12, "alpha beta"),
        (13, "fresh doc"), (14, "fresh doc"),
    ])
    s1 = exact_dedup_keep_min(b1).withColumn(
        "content_hash", T.fingerprint(F.col("text"))
    )
    store = s1.select("content_hash")
    inc = exact_dedup_increment(b2, store)
    # batch-2 survivors: only genuinely-new content, first id within batch
    assert sorted(r["doc_id"] for r in inc.collect()) == [10, 13]
    # union of (batch-1 survivors, incremental survivors) == full dedup
    full = exact_dedup_keep_min(b1.unionByName(b2))
    merged = sorted(
        [r["doc_id"] for r in s1.collect()] + [r["doc_id"] for r in inc.collect()]
    )
    assert merged == sorted(r["doc_id"] for r in full.collect())


def test_increment_on_empty_store(spark):
    b = _docs(spark, [(1, "x"), (2, "x"), (3, "y")])
    store = b.limit(0).select(
        T.fingerprint(F.col("text")).alias("content_hash")
    )
    got = sorted(r["doc_id"] for r in exact_dedup_increment(b, store).collect())
    assert got == [1, 3]
