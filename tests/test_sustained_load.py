"""Sustained-rate streaming e2e (VERDICT r4 #8): the reference's actual
job — TCP frames through the full P1-P6 parse chain into a sink —
load-tested end to end rather than per-operator.

A local TCP server paces ~10k frames/s for ~60 s at a 200 ms trigger
(the reference's tick); the test asserts ZERO lost and ZERO duplicated
frames via exact count/sum/sum-of-squares invariants over an embedded
sequence number (a drop or dup cannot preserve all three), that rejects
are accounted exactly, and that the drain completes promptly after the
sender stops (the query kept up — state/backlog stayed bounded).

The reference gateway's ceiling on this dataflow is ~5 frames/s per
listener (BASELINE.md: one read() per 0.2 s tick); measured numbers
land in SCALE.md §2.
"""

from __future__ import annotations

import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

RATE = 10_000  # frames/s the server paces
DURATION_S = 60  # send window
N_FRAMES = RATE * DURATION_S
INFO_EVERY = 100  # every 100th line is an info frame (reject path)


def _frame(seq: int) -> str:
    if seq % INFO_EVERY == INFO_EVERY - 1:
        return f"> info {seq}"
    return f"{seq % 32} {seq} {seq % 7} 1.5"


def _serve(listener: socket.socket, done_sending: threading.Event,
           drained: threading.Event, stats: dict) -> None:
    conn, _ = listener.accept()
    try:
        sent = 0
        tick = RATE // 10  # frames per 100 ms slot
        t0 = time.perf_counter()
        next_slot = t0
        while sent < N_FRAMES:
            n = min(tick, N_FRAMES - sent)
            payload = "\n".join(_frame(sent + i) for i in range(n)) + "\n"
            conn.sendall(payload.encode())
            sent += n
            next_slot += 0.1
            delay = next_slot - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
        stats["send_wall"] = time.perf_counter() - t0
        done_sending.set()
        # hold the connection open until the reader has drained;
        # closing early would end the stream mid-flight.
        drained.wait(timeout=180)
    finally:
        conn.close()


@pytest.mark.slow
def test_sustained_socket_rate_no_loss_no_dup(spark):
    from oem_gateway_spark.functions import frames as FR
    from oem_gateway_spark.sources.frames_source import socket_frame_stream

    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind(("localhost", 0))
    listener.listen(1)
    port = listener.getsockname()[1]

    done_sending, drained = threading.Event(), threading.Event()
    stats: dict = {}
    server = threading.Thread(
        target=_serve, args=(listener, done_sending, drained, stats),
        daemon=True,
    )
    server.start()

    # One query, one connection: parse + reject accounting happen inside
    # foreachBatch on the same micro-batch, so the two tallies can never
    # observe different slices of the stream.
    totals = {"n": 0, "sum": 0, "sumsq": 0, "rejects": 0, "batches": 0}

    def account(bdf, batch_id: int) -> None:
        parsed = FR.parse_serial_frames(bdf)
        # long arithmetic: the sums stay exact integers (sum of squares
        # ~7e16 exceeds double's 2^53 exact range but fits a long)
        seq = F.element_at("values", 1).cast("long")
        row = parsed.agg(
            F.count("*").alias("n"),
            F.sum(seq).alias("s"),
            F.sum(seq * seq).alias("s2"),
        ).collect()[0]
        rej = FR.dead_letter(bdf).count()
        totals["n"] += row["n"] or 0
        totals["sum"] += row["s"] or 0
        totals["sumsq"] += row["s2"] or 0
        totals["rejects"] += rej
        totals["batches"] += 1

    src = socket_frame_stream(spark, "localhost", port)
    q = (
        src.writeStream.foreachBatch(account)
        .trigger(processingTime="200 milliseconds")
        .queryName("sustained-load")
        .start()
    )
    t_start = time.perf_counter()
    try:
        assert done_sending.wait(timeout=DURATION_S + 120), "sender stalled"
        t_sent = time.perf_counter()
        # Drain bound: if the pipeline kept up, the tail flushes within
        # a few trigger intervals — 30 s is generous vs ambient load.
        expect_valid = N_FRAMES - N_FRAMES // INFO_EVERY
        deadline = t_sent + 30
        while time.perf_counter() < deadline:
            if totals["n"] + totals["rejects"] >= N_FRAMES:
                break
            time.sleep(0.5)
        t_drained = time.perf_counter()
    finally:
        drained.set()
        q.stop()
        listener.close()

    valid_seqs = [s for s in range(N_FRAMES) if s % INFO_EVERY != INFO_EVERY - 1]
    assert totals["n"] == expect_valid, (totals, N_FRAMES)
    assert totals["rejects"] == N_FRAMES // INFO_EVERY, totals
    # exact no-loss/no-dup invariants over the embedded sequence number
    assert totals["sum"] == sum(valid_seqs), totals
    assert totals["sumsq"] == sum(s * s for s in valid_seqs), totals
    assert t_drained - t_sent < 30, "drain exceeded bound — pipeline fell behind"

    wall = t_drained - t_start
    print(
        f"SUSTAINED-LOAD: {N_FRAMES} frames in {wall:.1f}s wall "
        f"(send {stats.get('send_wall', 0):.1f}s, "
        f"drain {t_drained - t_sent:.1f}s, {totals['batches']} batches, "
        f"{N_FRAMES / wall:.0f} frames/s e2e)"
    )
