"""Round-9 operator: the RocksDB state-store provider witness.

New ENGINE SURFACE (not a new plan shape): every stateful streaming twin
so far ran on Spark's default HDFS-backed in-memory state store, whose
working set lives on the executor JVM heap.  At 100 TB the state store
is the binding resource for the ``stream_*`` family — key cardinality,
not input size, bounds it — and the production answer is the
``RocksDBStateStoreProvider`` that ships with OSS Spark (native RocksDB
via bundled JNI, state spills to local SSD, changelog/zip checkpointing
to the checkpoint location).  This module re-runs the versioned-LWW
upsert twin under that provider against the SAME DuckDB oracle: the
provider swap must be invisible in the results while the run itself
proves the provider was live (RocksDB custom metrics in the query
progress, asserted by tests/test_round9_ops.py).

Reference: the gateway (SURVEY.md ~l.120) has no state store at all —
its only state is the in-memory send buffer (oemgatewaybuffer.py
~l.40); this is §2.6 engine-beyond-reference surface.
"""

from __future__ import annotations

import os
from itertools import count

from pyspark.sql import DataFrame, SparkSession

from oem_gateway_spark.suite.patterns_extra import (
    UPSERT_LWW_ORACLE,
    _upsert_changelog_stream,
    _upsert_final_state,
)
from oem_gateway_spark.suite.registry import query

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_SEQ = count()

# Custom state-store metrics from the most recent stream_upsert_rocksdb
# run (rocksdb* keys iff the provider was actually live) — module-level
# so the pytest can assert the witness without re-plumbing the query
# handle through the registry's (spark, sf_dir) -> DataFrame signature.
LAST_STATE_METRICS: dict[str, int] = {}


@query("stream_upsert_rocksdb", oracle=UPSERT_LWW_ORACLE)
def stream_upsert_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream_upsert_latest pipeline (out-of-order LWW register via
    applyInPandasWithState) executed on the ROCKSDB state store.

    The provider conf is read at STREAM START, so it is set just before
    ``start()`` and restored after ``awaitTermination()`` — the swap is
    scoped to this one streaming query, and the restore runs in a
    ``finally`` so a failed run can't leak the provider into the
    session (the registry's conf-hygiene discipline; this is NOT a
    conf-leak witness like q_bloom_prune — the provider affects only
    the stream started inside the guarded window, not later planning).
    The query progress's custom metrics are captured into
    LAST_STATE_METRICS; rocksdb* keys there are the proof the provider
    was live (the default HDFS provider reports loadedMapCache* keys
    instead).  Results must hash-equal the same oracle as the default-
    provider twin: state-store choice is an execution detail, never a
    semantics change."""
    prev = None
    try:
        prev = spark.conf.get(_PROVIDER_KEY)
    except Exception:
        prev = None
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    # Same state-partition scoping as the other stateful twins
    # (streaming_batch._run_to_table): the replay is kilobytes per
    # batch, but RocksDB opens a NATIVE store per partition per batch
    # and uploads a snapshot per commit — at the session's 32
    # partitions that machinery was the whole 21 s wall (r9 sweep).
    part_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(part_key)
    spark.conf.set(part_key, "8")
    try:
        out = _upsert_changelog_stream(spark, sf_dir)
        name = f"rocksdb_upsert_{os.getpid()}_{next(_SEQ)}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.lastProgress or {}
        ops = progress.get("stateOperators") or []
        LAST_STATE_METRICS.clear()
        if ops:
            LAST_STATE_METRICS.update(ops[0].get("customMetrics") or {})
        log = spark.table(name)
    finally:
        spark.conf.set(part_key, prev_parts)
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)
    return _upsert_final_state(log)
