#!/usr/bin/env python
"""Full-registry execution sweep: run EVERY registered query at a given
scale factor (noop sink, no oracle) and report wall times, failures, and
anything slower than a threshold.

    python tools/sweep.py [--sf /root/testdata/sf0.1] [--slow 10]

The bench (bench.py) times a curated headline subset; this sweeps the
whole registry — it exists because scale cliffs hide in queries the
bench doesn't watch (it found d_ngram_jaccard's interpreted-HOF
quadratic: 351 s at sf0.1 for a query the bench never timed, fixed to
3 s).  Run it once per round after correctness is green.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--slow", type=float, default=10.0)
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated query names: sweep just these (late-round "
        "additions after the full sweep already ran)",
    )
    args = ap.parse_args()

    from oem_gateway_spark import get_spark
    from oem_gateway_spark.operators.dedup import release_caches
    from oem_gateway_spark.suite import REGISTRY

    # validate --only BEFORE paying the session + warmup cold-start
    only = {n.strip() for n in args.only.split(",") if n.strip()}
    unknown = only - REGISTRY.keys()
    if unknown:
        sys.exit(f"--only names not in registry: {sorted(unknown)}")

    spark = get_spark(app_name="registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup (excluded from timings): without it the first
    # registry entry eats the cold-start and reads ~2x its real wall
    # (r5: q_reachability 14.6 s cold-first vs 6.2 s clean).  Warm on
    # args.sf so --sf pointed anywhere still works; never fatal.
    try:
        REGISTRY["q1_pricing_summary"].fn(spark, args.sf).write.format(
            "noop"
        ).mode("overwrite").save()
        # Streaming machinery warms separately from batch (state-store
        # + micro-batch executor init), and the RocksDB provider warms
        # separately AGAIN (JNI library load + native store creation,
        # ~3 s once per JVM — r9 measured the rocksdb twin 6.8 s cold /
        # 3.9 s warm on a quiet host).  Warm both at sf0.001 so the
        # cost is machinery, not data; per-query walls then measure
        # steady state instead of whoever runs first paying the init.
        REGISTRY["stream_tumbling"].fn(
            spark, "/root/testdata/sf0.001"
        ).write.format("noop").mode("overwrite").save()
        REGISTRY["stream_upsert_rocksdb"].fn(
            spark, "/root/testdata/sf0.001"
        ).write.format("noop").mode("overwrite").save()
    except Exception as e:  # noqa: BLE001 - warmup must not kill the sweep
        print(f"warmup skipped: {type(e).__name__}", flush=True)
    slow, failed = [], []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            release_caches(df)
            dt = time.perf_counter() - t0
            print(f"{name} {dt:.2f}s", flush=True)
            if dt > args.slow:
                slow.append((name, round(dt, 2)))
        except Exception as e:  # noqa: BLE001 - sweep must finish
            failed.append(name)
            print(f"{name} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    # Retry-on-slow (r9): the host carries ambient multi-tenant load, and
    # the streaming twins are LATENCY-bound (sequential micro-batches), so
    # a single ambient spike reads as a >threshold row — the same query
    # measures 3-6 s on a quiet host (sweeps 5-7 straddled three DIFFERENT
    # twins across three runs, the ambient signature; the quiet isolated
    # walls are committed in SURVEY).  One re-run, keep the min: an
    # ambient one-off clears, a real regression stays slow both times.
    still_slow = []
    for name, first_dt in slow:
        t0 = time.perf_counter()
        try:
            df = REGISTRY[name].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            release_caches(df)
            dt = min(first_dt, time.perf_counter() - t0)
        except Exception:  # noqa: BLE001 - keep the first measurement
            dt = first_dt
        print(f"{name} retry -> {dt:.2f}s", flush=True)
        if dt > args.slow:
            still_slow.append((name, round(dt, 2)))
    print(f"SWEEP DONE slow>{args.slow}s:", still_slow, "failed:", failed)
    if failed:
        sys.exit(1)  # scripted/CI callers must see failures in the status


if __name__ == "__main__":
    main()
