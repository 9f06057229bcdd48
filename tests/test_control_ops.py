"""Tests for the SURVEY §2.5 control/misc operators: radio commands (C3),
time broadcast (C4), repeater TX (R2), metrics (C6), and the custom
stateful operator (applyInPandasWithState)."""

from __future__ import annotations

import os
import shutil

import pytest

SCRATCH = "/root/repo/.scratch"


@pytest.fixture()
def scratch(request):
    d = os.path.join(SCRATCH, request.node.name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_radio_command_grammar():
    from oem_gateway_spark.sources import radio_control as RC

    assert RC.frequency_command("8") == "8b"  # 868 MHz (ref C3)
    assert RC.group_command(210) == "210g"
    assert RC.baseid_command(15) == "15i"
    assert RC.time_broadcast_command(7, 5) == "00,07,05,00,s"
    for bad in ("5", "433"):
        with pytest.raises(ValueError):
            RC.frequency_command(bad)
    with pytest.raises(ValueError):
        RC.group_command(251)
    with pytest.raises(ValueError):
        RC.baseid_command(0)


def test_radio_control_apply_and_time_tick():
    from oem_gateway_spark.sources.radio_control import RadioControl

    written: list[str] = []
    now = [1000.0]
    rc = RadioControl(write=written.append, sendtimeinterval=30, clock=lambda: now[0])
    assert rc.apply_settings(frequency="4", group=210, baseid=15) == [
        "4b",
        "210g",
        "15i",
    ]
    assert written == ["4b", "210g", "15i"]

    # C4: first tick sends, ticks within the interval do not, after it does
    cmd = rc.tick()
    assert cmd is not None and cmd.endswith(",s") and cmd.startswith("00,")
    assert rc.tick() is None
    now[0] += 31
    assert rc.tick() is not None
    assert len(written) == 5


def test_repeater_sink_tx(spark):
    from oem_gateway_spark.sinks.repeater import RepeaterSink

    tx: list[str] = []
    sink = RepeaterSink(write=tx.append, order_col="line_id")
    df = spark.createDataFrame(
        [(2, "10 5 6"), (1, "10 1 2")], "line_id long, line string"
    )
    sink.process_batch(df, 0)
    # ordered by line_id, CRLF framed (ref serial write)
    assert tx == ["10 1 2\r\n", "10 5 6\r\n"]
    assert sink.sent == 2


def test_observe_metrics_and_listener(spark, scratch):
    """C6: observed per-batch frame/reject counters + listener stats."""
    import time

    from oem_gateway_spark.functions import frames as FR
    from oem_gateway_spark.streaming.observability import (
        GatewayMetricsListener,
        with_frame_metrics,
    )

    inp = os.path.join(scratch, "in")
    os.makedirs(inp)
    with open(os.path.join(inp, "f.txt"), "w") as f:
        f.write("10 1 2\n> info\n11 3\nbad x\n")

    listener = GatewayMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.format("text").load(inp).withColumnRenamed("value", "line")
        )
        classified = FR.classify_frames(stream).drop("toks")
        observed = with_frame_metrics(classified)
        q = (
            observed.writeStream.format("memory")
            .queryName("obs_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events arrive asynchronously
        deadline = time.time() + 30
        while time.time() < deadline:
            s = listener.stats.get("obs_test")
            if s and s.observed.get("n_frames"):
                break
            time.sleep(0.5)
        s = listener.stats["obs_test"]
        assert s.observed["n_frames"] == 4
        assert s.observed["n_rejected"] == 2  # info + non-numeric
        assert s.rows == 4
    finally:
        spark.streams.removeListener(listener)


def test_apply_in_pandas_with_state_running_stats(spark, scratch):
    """Custom stateful op: per-node running counters across micro-batches
    (applyInPandasWithState, update mode, processing-time timeout)."""
    from pyspark.sql import functions as F

    from oem_gateway_spark.streaming.state import node_running_stats

    inp = os.path.join(scratch, "in")
    os.makedirs(inp)
    with open(os.path.join(inp, "b1.txt"), "w") as f:
        f.write("10,1.5\n10,2.5\n11,4.0\n")
    with open(os.path.join(inp, "b2.txt"), "w") as f:
        f.write("10,1.0\n")

    raw = spark.readStream.format("text").option("maxFilesPerTrigger", "1").load(inp)
    parsed = raw.select(
        F.split("value", ",")[0].cast("int").alias("node"),
        F.split("value", ",")[1].cast("double").alias("value"),
        F.current_timestamp().alias("ingest_ts"),
    )
    stats = node_running_stats(parsed)
    q = (
        stats.writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("state_test").collect()
    # final (latest) emission per node reflects the running totals
    latest = {}
    for r in rows:
        latest[r["node"]] = (r["n_frames"], r["sum_value"])
    assert latest[10] == (3, 5.0)
    assert latest[11] == (1, 4.0)
