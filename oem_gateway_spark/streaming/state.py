"""Stateful streaming ops (M4): watermarked windows, session windows,
within-watermark dedup, stream-stream joins.

These helpers take any readings-shaped stream (event-time column + keys)
and return streaming DataFrames.  State-size discipline for 100 TB:
every stateful op carries a watermark so the state store evicts; window
state is O(open windows x keys); dedup state is O(keys within watermark);
stream-stream join state is bounded by both sides' watermarks + the join
time-range condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per key."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col(key_col),
            "n",
            "total",
        )
    )


def sliding_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window counts (each row lands in len/slide
    windows via Expand — state per open window)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len, slide).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), F.col(key_col), "n")
    )


def session_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based, merging) per key; end = last event + gap."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; state evicts beyond it.  (The
    unbounded dropDuplicates would grow state forever at 100 TB.)"""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def node_running_stats(
    stream: DataFrame,
    key_col: str = "node",
    value_col: str = "value",
    ts_col: str = "ingest_ts",
    timeout_minutes: int = 60,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (the
    flatMapGroupsWithState equivalent): per-node lifetime counters the
    gateway's node registry would keep — frames seen, value sum, last-seen
    epoch — emitted as an update row per node per micro-batch.

    State is one small tuple per node (bounded: node ids are a finite
    device population); a processing-time timeout expires nodes silent for
    ``timeout_minutes`` (state-store hygiene at scale).
    """
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("node", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("sum_value", DoubleType()),
            StructField("last_seen_ms", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_frames", LongType()),
            StructField("sum_value", DoubleType()),
            StructField("last_seen_ms", LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (node,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            last = max(last, int(pdf[ts_col].astype("int64").max() // 1_000_000))
        state.update((n, total, last))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "node": [node],
                "n_frames": [n],
                "sum_value": [total],
                "last_seen_ms": [last],
            }
        )

    return (
        stream.selectExpr(
            f"CAST({key_col} AS INT) AS node",
            f"{value_col}",
            f"{ts_col}",
        )
        .groupBy("node")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join on key within a time interval.  Both sides
    watermarked; the interval condition lets the engine purge join state."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {interval}"))
    )
    return lw.alias("l").join(rw.alias("r"), cond)
