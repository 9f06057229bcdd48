"""Multi-listener UNION-ALL scale path, load-tested e2e (VERDICT r5 #5).

The single-listener ceiling is measured at >=100k frames/s with the
documented scale path beyond being N listeners merged by the gateway's
implicit UNION ALL (R1; SCALE.md §2).  This test PROVES that chain: four
TCP servers each pace 12.5k frames/s (~50k/s aggregate) into four socket
sources merged with unionByName into ONE streaming query, and the exact
count/sum/sum-of-squares invariants hold PER SOURCE — a lost, duplicated,
or cross-wired frame on any listener cannot preserve all three.  Each
source also carries its share of info-frame rejects, accounted exactly.
"""

from __future__ import annotations

import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

N_SOURCES = 4
RATE_PER_SOURCE = 12_500  # frames/s each -> ~50k/s aggregate
DURATION_S = 20
N_PER_SOURCE = RATE_PER_SOURCE * DURATION_S
INFO_EVERY = 100  # every 100th line per source is an info frame


def _frame(src: int, seq: int) -> str:
    if seq % INFO_EVERY == INFO_EVERY - 1:
        return f"> info {src} {seq}"
    # values[1] = seq, values[2] = source id (the cross-wire detector)
    return f"{seq % 32} {seq} {src} 1.5"


def _serve(listener: socket.socket, src: int, done: threading.Event,
           drained: threading.Event, stats: dict) -> None:
    conn, _ = listener.accept()
    try:
        sent = 0
        tick = RATE_PER_SOURCE // 10  # frames per 100 ms slot
        t0 = time.perf_counter()
        next_slot = t0
        while sent < N_PER_SOURCE:
            n = min(tick, N_PER_SOURCE - sent)
            payload = "\n".join(_frame(src, sent + i) for i in range(n)) + "\n"
            conn.sendall(payload.encode())
            sent += n
            next_slot += 0.1
            delay = next_slot - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
        stats[src] = time.perf_counter() - t0
        done.set()
        drained.wait(timeout=180)
    finally:
        conn.close()


@pytest.mark.slow
def test_union_all_multi_listener_no_loss_no_dup(spark):
    from oem_gateway_spark.functions import frames as FR
    from oem_gateway_spark.sources.frames_source import socket_frame_stream

    listeners, ports = [], []
    for _ in range(N_SOURCES):
        ls = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        ls.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        ls.bind(("localhost", 0))
        ls.listen(1)
        listeners.append(ls)
        ports.append(ls.getsockname()[1])

    done_events = [threading.Event() for _ in range(N_SOURCES)]
    drained = threading.Event()
    stats: dict = {}
    threads = [
        threading.Thread(
            target=_serve, args=(listeners[i], i, done_events[i], drained, stats),
            daemon=True,
        )
        for i in range(N_SOURCES)
    ]
    for t in threads:
        t.start()

    # R1's fan-in: one DataFrame from N listeners via unionByName, one
    # query — parse + per-source tallies see the same micro-batch slice.
    src_df = socket_frame_stream(spark, "localhost", ports[0])
    for p in ports[1:]:
        src_df = src_df.unionByName(socket_frame_stream(spark, "localhost", p))

    per_src = {
        i: {"n": 0, "sum": 0, "sumsq": 0} for i in range(N_SOURCES)
    }
    totals = {"rejects": 0, "batches": 0}

    def account(bdf, batch_id: int) -> None:
        parsed = FR.parse_serial_frames(bdf)
        seq = F.element_at("values", 1).cast("long")
        src = F.element_at("values", 2).cast("int")
        rows = (
            parsed.groupBy(src.alias("src"))
            .agg(
                F.count("*").alias("n"),
                F.sum(seq).alias("s"),
                F.sum(seq * seq).alias("s2"),
            )
            .collect()
        )
        for r in rows:
            acc = per_src[r["src"]]
            acc["n"] += r["n"] or 0
            acc["sum"] += r["s"] or 0
            acc["sumsq"] += r["s2"] or 0
        totals["rejects"] += FR.dead_letter(bdf).count()
        totals["batches"] += 1

    q = (
        src_df.writeStream.foreachBatch(account)
        .trigger(processingTime="200 milliseconds")
        .queryName("multi-listener-load")
        .start()
    )
    t_start = time.perf_counter()
    try:
        for i, ev in enumerate(done_events):
            assert ev.wait(timeout=DURATION_S + 120), f"sender {i} stalled"
        t_sent = time.perf_counter()
        expect_valid = N_PER_SOURCE - N_PER_SOURCE // INFO_EVERY
        deadline = t_sent + 30
        drained_ok = False
        while time.perf_counter() < deadline:
            got = sum(a["n"] for a in per_src.values()) + totals["rejects"]
            if got >= N_SOURCES * N_PER_SOURCE:
                drained_ok = True
                break
            time.sleep(0.5)
        t_drained = time.perf_counter()
    finally:
        drained.set()
        q.stop()
        for ls in listeners:
            ls.close()

    # Flag the drain bound on the POLL OUTCOME, not wall arithmetic: the
    # old `t_drained - t_sent < 30` was unreachable when the union fell
    # behind (count asserts fired first) and could fail spuriously when
    # the last rows landed between the final poll and the deadline
    # (review r6).
    assert drained_ok, (
        "drain exceeded bound — union fell behind",
        {k: a["n"] for k, a in per_src.items()},
        totals,
    )
    valid_seqs = [
        s for s in range(N_PER_SOURCE) if s % INFO_EVERY != INFO_EVERY - 1
    ]
    want_sum, want_sumsq = sum(valid_seqs), sum(s * s for s in valid_seqs)
    for i in range(N_SOURCES):
        acc = per_src[i]
        assert acc["n"] == expect_valid, (i, acc)
        assert acc["sum"] == want_sum, (i, acc)
        assert acc["sumsq"] == want_sumsq, (i, acc)
    assert totals["rejects"] == N_SOURCES * (N_PER_SOURCE // INFO_EVERY), totals

    wall = t_drained - t_start
    n_total = N_SOURCES * N_PER_SOURCE
    print(
        f"MULTI-LISTENER: {N_SOURCES}x{N_PER_SOURCE} frames in {wall:.1f}s "
        f"wall ({totals['batches']} batches, {n_total / wall:.0f} frames/s "
        f"aggregate e2e)"
    )
