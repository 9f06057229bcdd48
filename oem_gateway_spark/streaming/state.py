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
    timeout_minutes: int | None = 60,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (the
    flatMapGroupsWithState equivalent): per-node lifetime counters the
    gateway's node registry would keep — frames seen, value sum, last-seen
    epoch — emitted as an update row per node per micro-batch.

    State is one small tuple per node (bounded: node ids are a finite
    device population); a processing-time timeout expires nodes silent for
    ``timeout_minutes`` (state-store hygiene at scale).

    ``timeout_minutes=None`` disables the timeout (NoTimeout).  Required
    for bounded availableNow replays: with ProcessingTimeTimeout the
    operator's shouldRunAnotherBatch keeps scheduling no-data batches to
    fire pending timeouts, so the trigger never terminates.  Live
    pipelines (continuous triggers) keep the default.
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
            # Explicit ns cast first: Arrow may deliver datetime64[us] or
            # [ns] depending on version; int64-of-ns // 1e6 is always ms.
            ts_ns = pd.to_datetime(pdf[ts_col]).astype("datetime64[ns]").astype("int64")
            last = max(last, int(ts_ns.max() // 1_000_000))
        state.update((n, total, last))
        if timeout_minutes is not None:
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
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if timeout_minutes is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
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


def counter_deltas(
    stream: DataFrame,
    key_col: str = "node",
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    id_col: str = "event_id",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Counter-to-rate conversion on the protobuf-free stateful API
    (applyInPandasWithState): per key, every row emits its value delta vs
    the previous row — cumulative meter readings become per-interval
    consumption (the reference's energy-counter domain).  The first row
    ever seen per key emits NULL.

    Semantics twin of :func:`node_counter_deltas` (transformWithState,
    blocked by the missing protobuf runtime — see its docstring).  Rows
    sort by (ts_ms, id) within a batch for a deterministic delta chain;
    state carries the max-(ts_ms, id) row per key so deltas stay correct
    across micro-batch boundaries.  State is one tuple per key (bounded
    by the device population).  ``timeout_minutes=None`` (NoTimeout) for
    bounded availableNow replays — see :func:`node_running_stats`.
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
            StructField("event_id", LongType()),
            StructField("ts_ms", LongType()),
            StructField("value", DoubleType()),
            StructField("delta", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_value", DoubleType()), StructField("last_ts", LongType())]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (node,) = key
        if state.hasTimedOut:
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        # selectExpr below normalizes column names before the state op,
        # so the canonical names are always in scope here.
        pdf = pdf.sort_values(
            ["ts_ms", "event_id"], kind="stable", ignore_index=True
        )
        values = pdf["value"].astype(float)
        deltas = values.diff()
        if state.exists:
            deltas.iloc[0] = values.iloc[0] - state.get[0]
        state.update((float(values.iloc[-1]), int(pdf["ts_ms"].iloc[-1])))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        # NaN (the very first row per key) must reach Spark as NULL, not
        # the double NaN — object dtype keeps None through Arrow.
        out_delta = deltas.astype(object).where(deltas.notna(), None)
        yield pd.DataFrame(
            {
                "node": node,
                "event_id": pdf["event_id"],
                "ts_ms": pdf["ts_ms"],
                "value": values,
                "delta": out_delta,
            }
        )

    return (
        stream.selectExpr(
            f"CAST({key_col} AS INT) AS node",
            f"CAST({id_col} AS LONG) AS event_id",
            f"CAST({ts_ms_col} AS LONG) AS ts_ms",
            f"CAST({value_col} AS DOUBLE) AS value",
        )
        .groupBy("node")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if timeout_minutes is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


def locf_fill(
    stream: DataFrame,
    key_col: str = "node",
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    id_col: str = "event_id",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Stateful LOCF (last-observation-carried-forward) on a stream: per
    key, NULL readings are filled with the latest preceding non-null
    value, INCLUDING across micro-batch boundaries — the state carries
    one last-good value per key, so a gap at the head of a batch repairs
    from the previous batch's tail (the batch twin, q_locf_fill, can
    only look within its own frame; this is the operator a live
    telemetry pipeline needs).  Rows before a key's first observation
    stay NULL.

    Rows sort by (ts_ms, id) within each batch; correctness across
    batches requires the source to deliver time-ordered batches (true
    for replayed time-partitioned files and for any watermarked
    upstream).  State per key is a single float — bounded by the key
    population.  ``timeout_minutes=None`` (NoTimeout) for bounded
    availableNow replays — see :func:`node_running_stats`."""
    import math
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
            StructField("event_id", LongType()),
            StructField("ts_ms", LongType()),
            StructField("filled", DoubleType()),
        ]
    )
    # NaN = "no observation yet" (state tuples cannot hold None)
    state_schema = StructType([StructField("last_good", DoubleType())])

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (node,) = key
        if state.hasTimedOut:
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(
            ["ts_ms", "event_id"], kind="stable", ignore_index=True
        )
        v = pdf["value"].astype(float)
        filled = v.ffill()
        last_good = float("nan")
        if state.exists:
            last_good = state.get[0]
        if not math.isnan(last_good):
            # any NaN surviving ffill is a leading gap: repair from state
            filled = filled.fillna(last_good)
        tail = filled.iloc[-1] if len(filled) else float("nan")
        new_last = last_good if pd.isna(tail) else float(tail)
        state.update((new_last,))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        out = filled.astype(object).where(filled.notna(), None)
        yield pd.DataFrame(
            {
                "node": node,
                "event_id": pdf["event_id"],
                "ts_ms": pdf["ts_ms"],
                "filled": out,
            }
        )

    return (
        stream.selectExpr(
            f"CAST({key_col} AS INT) AS node",
            f"CAST({id_col} AS LONG) AS event_id",
            f"CAST({ts_ms_col} AS LONG) AS ts_ms",
            f"CAST({value_col} AS DOUBLE) AS value",
        )
        .groupBy("node")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if timeout_minutes is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


def node_counter_deltas(
    stream: DataFrame,
    key_col: str = "node",
    value_col: str = "value",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Counter-to-rate conversion via ``transformWithStateInPandas`` —
    Spark 4's StatefulProcessor/ValueState successor to
    applyInPandasWithState: per node, each frame emits its delta vs the
    node's previous value, so cumulative meter readings (the reference's
    energy-counter domain) become per-interval consumption.  The first
    frame ever seen for a node emits a NULL delta.

    State per node is ONE (last_value, last_ts_ms) tuple — bounded by the
    device population, not the stream; rows within a micro-batch are
    ordered by timestamp before differencing, and the carried state stores
    the max-ts row so deltas stay correct across micro-batch boundaries.

    ENVIRONMENT SEAM (see README): transformWithState's Python state
    server speaks protobuf; this container ships no ``google.protobuf``,
    so the operator raises NotImplementedError here and the e2e test
    skips.  :func:`node_running_stats` (applyInPandasWithState) covers the
    same per-key-state ground on the older, protobuf-free API.
    """
    from collections.abc import Iterator

    import pandas as pd

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment seam
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf runtime "
            "(google.protobuf), absent in this container; use "
            "node_running_stats (applyInPandasWithState) instead"
        ) from exc

    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.streaming.stateful_processor import StatefulProcessorHandle

    out_schema = (
        "node INT, ts_ms LONG, value DOUBLE, delta DOUBLE"
    )

    class CounterDeltas(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState(
                "last", "last_value DOUBLE, last_ts_ms LONG"
            )

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            (node,) = key
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values("ts_ms", kind="stable", ignore_index=True)
            prev = self._last.get() if self._last.exists() else None
            values = pdf["value"].astype(float)
            deltas = values.diff()
            if prev is not None:
                deltas.iloc[0] = values.iloc[0] - prev[0]
            self._last.update((float(values.iloc[-1]), int(pdf["ts_ms"].iloc[-1])))
            yield pd.DataFrame(
                {
                    "node": node,
                    "ts_ms": pdf["ts_ms"],
                    "value": values,
                    "delta": deltas,
                }
            )

        def close(self) -> None:
            pass

    prepared = stream.selectExpr(
        f"CAST({key_col} AS INT) AS node",
        f"CAST(unix_millis(CAST({ts_col} AS TIMESTAMP)) AS LONG) AS ts_ms",
        f"CAST({value_col} AS DOUBLE) AS value",
    )
    return prepared.groupBy("node").transformWithStateInPandas(
        statefulProcessor=CounterDeltas(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )


def ewma_stream(
    stream: DataFrame,
    key_col: str = "node",
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    id_col: str = "event_id",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Stateful EWMA (alpha = 0.5) on a stream: per key, every row emits
    ewma_t = 0.5*x_t + 0.5*ewma_{t-1}, seeded at the first reading and
    carried ACROSS micro-batch boundaries (state = one double per key).

    With alpha = 0.5 every decay weight is an exact power of two, and
    the per-row recurrence is provably bit-identical to the batch
    twin's scaled-window form (q_ewma_halflife): scaling by 2^k is
    exact and commutes with each addition's rounding, so
    fl(acc + x*2^(t-1)) * 2^-t == fl(0.5*ewma_prev + 0.5*x) by
    induction.  The two implementations can therefore share ONE SQL
    oracle with no tolerance — the unified-dialect contract the
    streaming suite is built on.

    State is O(1) per key; ``timeout_minutes=None`` for bounded
    availableNow replays (see node_running_stats).
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
            StructField("event_id", LongType()),
            StructField("ts_ms", LongType()),
            StructField("ewma", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("last_ewma", DoubleType())])

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (node,) = key
        if state.hasTimedOut:
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(
            ["ts_ms", "event_id"], kind="stable", ignore_index=True
        )
        prev = state.get[0] if state.exists else None
        out = []
        # Explicit sequential recurrence: fl(0.5*x + 0.5*prev) each row —
        # the exact operation order the bit-equality proof relies on
        # (vectorized shortcuts like pandas .ewm() have their own
        # accumulation internals and void the guarantee).
        for x in pdf["value"].astype(float):
            prev = x if prev is None else 0.5 * x + 0.5 * prev
            out.append(prev)
        state.update((float(prev),))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "node": node,
                "event_id": pdf["event_id"],
                "ts_ms": pdf["ts_ms"],
                "ewma": out,
            }
        )

    return (
        stream.selectExpr(
            f"CAST({key_col} AS INT) AS node",
            f"CAST({id_col} AS LONG) AS event_id",
            f"CAST({ts_ms_col} AS LONG) AS ts_ms",
            f"CAST({value_col} AS DOUBLE) AS value",
        )
        .groupBy("node")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if timeout_minutes is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


def session_assign_stream(
    stream: DataFrame,
    gap_ms: int = 1_800_000,
    key_col: str = "node",
    ts_ms_col: str = "ts_ms",
    id_col: str = "event_id",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Streaming session ASSIGNMENT: every event is labeled with the
    start timestamp of the inactivity-gap session it belongs to
    (a new session opens when the gap since the key's previous event
    exceeds ``gap_ms``), with the open session carried across
    micro-batch boundaries.

    New state shape for the CUSTOM-state twin family: a MERGING
    INTERVAL — (last_ts_ms, session_start_ms) — where the existing
    applyInPandasWithState twins carry a scalar recurrence
    (ewma_stream), a scalar carry (locf_fill), a bounded ordered
    collection (topk_admission_stream), or per-key counters
    (node_running_stats).  The ENGINE-MANAGED session_window
    aggregation is witnessed separately (suite stream_session); this
    hand-holds the same merging semantics and ASSIGNS rather than
    aggregates — per-event output (the form that labels events for
    joining back, which no built-in session operator emits), equal to
    the batch gaps-and-islands twin ROW FOR ROW with pure integer-ms
    arithmetic — an exact shared oracle, no tolerance.

    State is O(1) per key (two longs); ``timeout_minutes=None`` for
    bounded availableNow replays (see node_running_stats).
    """
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("node", IntegerType()),
            StructField("event_id", LongType()),
            StructField("ts_ms", LongType()),
            StructField("session_start_ms", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ms", LongType()),
            StructField("sess_start_ms", LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (node,) = key
        if state.hasTimedOut:
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(
            ["ts_ms", "event_id"], kind="stable", ignore_index=True
        )
        last_ms, sess_start = (
            (int(state.get[0]), int(state.get[1])) if state.exists else (None, None)
        )
        starts = []
        for ts in pdf["ts_ms"].astype("int64"):
            ts = int(ts)
            if last_ms is None or ts - last_ms > gap_ms:
                sess_start = ts
            last_ms = ts
            starts.append(sess_start)
        state.update((last_ms, sess_start))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "node": node,
                "event_id": pdf["event_id"].astype("int64"),
                "ts_ms": pdf["ts_ms"].astype("int64"),
                "session_start_ms": starts,
            }
        )

    return (
        # Normalize ALL column names to constants before the state op
        # (the sibling helpers' convention).
        stream.selectExpr(
            f"CAST({key_col} AS INT) AS node",
            f"CAST({id_col} AS LONG) AS event_id",
            f"CAST({ts_ms_col} AS LONG) AS ts_ms",
        )
        .groupBy("node")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if timeout_minutes is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


def topk_admission_stream(
    stream: DataFrame,
    k: int = 5,
    key_col: str = "node",
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    id_col: str = "event_id",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Online per-key top-k admission: each arriving row is tested
    against the running top-``k`` readings for its key — ``admitted``
    iff fewer than ``k`` earlier readings beat it (strictly greater
    value, ties to the earlier event id) — then folded into the state.

    State is a BOUNDED ORDERED COLLECTION (the k best (value, id) pairs,
    at most k elements per key forever), a different state shape from
    the scalar-state smoothers (ewma_stream, locf_fill) and the
    unbounded-dict counters (node_running_stats): insertion + truncate
    keeps exactly the prefix top-k, because a discarded element was
    outside the top-k of its prefix and the top-k only improves, so it
    can never re-enter.  That invariant is what makes the streaming
    answer equal the batch prefix-rank twin row for row.
    """
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("node", IntegerType()),
            StructField("event_id", LongType()),
            StructField("admitted", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("vals", ArrayType(DoubleType())),
            StructField("ids", ArrayType(LongType())),
        ]
    )

    def beats(va: float, ia: int, vb: float, ib: int) -> bool:
        """(va, ia) outranks (vb, ib): greater value, earlier id on ties."""
        return va > vb or (va == vb and ia < ib)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (node,) = key
        if state.hasTimedOut:
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(
            ["ts_ms", "event_id"], kind="stable", ignore_index=True
        )
        if state.exists:
            vals, ids = list(state.get[0]), list(state.get[1])
        else:
            vals, ids = [], []
        top = list(zip(vals, ids))
        admitted = []
        for x, eid in zip(pdf["value"].astype(float), pdf["event_id"]):
            eid = int(eid)
            n_better = sum(1 for v, i in top if beats(v, i, x, eid))
            admitted.append(n_better < k)
            top.append((x, eid))
            top.sort(key=lambda p: (-p[0], p[1]))
            del top[k:]
        state.update(([v for v, _ in top], [i for _, i in top]))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "node": node,
                "event_id": pdf["event_id"].astype("int64"),
                "admitted": admitted,
            }
        )

    return (
        # Normalize ALL column names to constants before the state op
        # (the sibling helpers' convention — ADVICE r6: keeping {id_col}/
        # {value_col} here made any non-default id_col KeyError inside
        # the UDF's hardcoded sort).
        stream.selectExpr(
            f"CAST({key_col} AS INT) AS node",
            f"CAST({id_col} AS LONG) AS event_id",
            f"CAST({ts_ms_col} AS LONG) AS ts_ms",
            f"CAST({value_col} AS DOUBLE) AS value",
        )
        .groupBy("node")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if timeout_minutes is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


def upsert_latest_stream(
    stream: DataFrame,
    key_col: str = "node",
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    id_col: str = "event_id",
    timeout_minutes: int | None = None,
    output_mode: str = "update",
) -> DataFrame:
    """Streaming LAST-WRITE-WINS upsert store: per key, keep the reading
    with the greatest event time seen SO FAR — the CDC-apply /
    key-value-materialization state shape, fed by an OUT-OF-ORDER
    replay (the suite's other custom twins all replay in time order, so
    none of them ever witnesses a late arrival being REJECTED by the
    state).

    Update rule per arriving row (batch rows processed in (ts, id)
    order): the row replaces the state iff its ts_ms is STRICTLY
    greater than the stored one — a late (out-of-order) arrival leaves
    the state untouched, and ``n_updates`` counts accepted writes only,
    so the count is observable evidence the rejection actually happened
    (it differs from the per-key row count exactly when late data
    arrived).  Emits one row per (key, batch) WHEN the state changed:
    (node, last_event_id, last_ts_ms, last_value, n_updates) — an
    upsert changelog, downstream-consumable as a keyed compact-on-read
    table.  State is O(1) per key: three longs and a double.

    New state shape for the twin family: a VERSIONED LWW REGISTER —
    vs scalar recurrence (ewma), scalar carry (locf), merging interval
    (session_assign), bounded ordered collection (topk), counters
    (running_stats).  At 100 TB this is Structured Streaming's
    canonical dedup-to-latest materialization: state is keys x O(1),
    partitioned by the grouping key, with RocksDB state store +
    PROCESSING-TIME TTL (timeout_minutes maps to
    GroupStateTimeout.ProcessingTimeTimeout — wall-clock expiry, NOT
    event-time; a slow replay with a timeout set can expire live keys
    mid-stream, which is why the registry twin passes None) bounding
    the working set.
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
            StructField("last_event_id", LongType()),
            StructField("last_ts_ms", LongType()),
            StructField("last_value", DoubleType()),
            StructField("n_updates", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ts_ms", LongType()),
            StructField("last_id", LongType()),
            StructField("last_value", DoubleType()),
            StructField("n_updates", LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (node,) = key
        if state.hasTimedOut:
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(
            ["ts_ms", "event_id"], kind="stable", ignore_index=True
        )
        if state.exists:
            last_ts, last_id, last_val, n_upd = state.get
            last_ts, last_id, n_upd = int(last_ts), int(last_id), int(n_upd)
            last_val = float(last_val)
        else:
            last_ts, last_id, last_val, n_upd = -1, -1, float("nan"), 0
        before = n_upd
        for ts, eid, val in zip(
            pdf["ts_ms"].astype("int64"),
            pdf["event_id"].astype("int64"),
            pdf["value"].astype("float64"),
        ):
            if int(ts) > last_ts:
                last_ts, last_id, last_val = int(ts), int(eid), float(val)
                n_upd += 1
        state.update((last_ts, last_id, last_val, n_upd))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if n_upd == before:  # pure-late batch: changelog stays silent
            return
        yield pd.DataFrame(
            {
                "node": [node],
                "last_event_id": [last_id],
                "last_ts_ms": [last_ts],
                "last_value": [last_val],
                "n_updates": [n_upd],
            }
        )

    return (
        # Normalize ALL column names to constants before the state op
        # (the sibling helpers' convention).
        stream.selectExpr(
            f"CAST({key_col} AS INT) AS node",
            f"CAST({id_col} AS LONG) AS event_id",
            f"CAST({ts_ms_col} AS LONG) AS ts_ms",
            f"CAST({value_col} AS DOUBLE) AS value",
        )
        .groupBy("node")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            # The emitted row set is UDF-determined either way; the operator
            # mode only constrains which QUERY output modes Spark admits —
            # "update" for the memory-sink twins, "append" for the
            # exactly-once FILE sink the kill/resume witness rides
            # (FileStreamSink admits append only).
            outputMode=output_mode,
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if timeout_minutes is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )
