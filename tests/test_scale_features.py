"""Scale-path features that only matter beyond toy sizes, proven locally:
RocksDB-backed streaming state (state larger than executor heap) and
runtime bloom-filter injection (semi-join reduction of a shuffled fact).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.plans import explain_str

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


def test_rocksdb_state_store_counter_deltas(spark, scratch):
    """The stateful operators run unchanged on the RocksDB state store —
    the 100 TB state story: keyed state spills to local disk instead of
    being bounded by executor heap (HDFSBackedStateStore keeps every key
    in memory).  Same counter-to-rate chain as
    test_counter_deltas_across_batches, same results, different store."""
    from oem_gateway_spark.streaming.state import counter_deltas

    inp = os.path.join(scratch, "in")
    os.makedirs(inp)
    with open(os.path.join(inp, "b1.txt"), "w") as f:
        f.write("10,1,1000,100.0\n10,2,2000,103.0\n11,3,1500,50.0\n")
    with open(os.path.join(inp, "b2.txt"), "w") as f:
        f.write("10,4,3000,110.0\n11,5,2500,57.0\n")

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", "1")
            .load(inp)
        )
        parts = F.split("value", ",")
        parsed = raw.select(
            parts[0].cast("int").alias("node"),
            parts[1].cast("long").alias("event_id"),
            parts[2].cast("long").alias("ts_ms"),
            parts[3].cast("double").alias("value"),
        )
        out = counter_deltas(parsed, timeout_minutes=None)
        q = (
            out.writeStream.format("memory")
            .queryName("rocksdb_deltas_test")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = {
            r["event_id"]: r["delta"]
            for r in spark.table("rocksdb_deltas_test").collect()
        }
        assert rows[1] is None
        assert rows[2] == 3.0
        assert rows[3] is None
        assert rows[4] == 7.0  # state crossed the batch boundary in RocksDB
        assert rows[5] == 7.0
    finally:
        spark.conf.set(key, old)


def test_runtime_bloom_filter_injection(spark):
    """Runtime bloom-filter (semi-join reduction): when a selective build
    side can't broadcast, the optimizer injects a bloom filter of its join
    keys into the probe-side scan — the fact rows that cannot match are
    dropped BEFORE the shuffle.  At 100 TB this is the difference between
    shuffling the whole fact table and shuffling the matching slice."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    o = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_totalprice") > 400000)  # selective build side
        .select("o_orderkey")
    )
    confs = {
        # force the shuffle-join path and make the size guards pass at
        # fixture scale (prod defaults: 10 MB creation / 10 GB probe side)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).agg(
            F.round(F.sum("l_extendedprice"), 4).alias("rev")
        )
        text = explain_str(joined)
        assert "might_contain" in text, text
        # and the filtered join still computes (sanity)
        assert joined.collect()[0]["rev"] is not None
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
