#!/usr/bin/env python
"""Isolated min-of-3 per-query adjudication at matched spin (the r11
protocol, SURVEY §7.1g(1)): re-measure a handful of flagged queries OUTSIDE
the full bench so the 32-core self-load of 114 back-to-back queries can't
inflate the walls under adjudication.

    python tools/adjudicate.py stream_topk_admission d_semdedup_centroid ...

Prints one JSON blob: this boot's spin ruler, each query's isolated
min-of-3 wall, the three raw walls, and the raw / spin-normalized ratios
against BENCH_BASELINE.json's recorded row.  The protocol's verdict rule:
a flag CLEARS if the isolated normalized ratio is inside the 2x bar (and
the full-bench inflation is therefore self-load, not code); it STANDS if
the slowdown reproduces isolated, which makes it a profiling target.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    targets = sys.argv[1:]
    if not targets:
        sys.exit("usage: adjudicate.py <query> [<query> ...]")

    from bench import _cpu_calibration

    calib = _cpu_calibration()
    load_start = list(os.getloadavg())

    from oem_gateway_spark import get_spark
    from oem_gateway_spark.operators.dedup import release_caches
    from oem_gateway_spark.suite import REGISTRY

    unknown = [t for t in targets if t not in REGISTRY]
    if unknown:
        sys.exit(f"not in registry: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    # Same warmups as bench.py/sweep.py: JVM codegen, micro-batch executor
    # machinery, and the RocksDB JNI load each warm separately; without
    # them the first measured query pays a one-time init that is not the
    # engine (r5/r9 findings).
    for warm, sf in (
        ("q1_pricing_summary", sf_dir),
        ("stream_tumbling", "/root/testdata/sf0.001"),
        ("stream_upsert_rocksdb", "/root/testdata/sf0.001"),
    ):
        REGISTRY[warm].fn(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()

    base = None
    try:
        with open(os.path.join(HERE, "BENCH_BASELINE.json")) as f:
            base = json.load(f)
    except OSError:
        pass
    base_spin = (
        base["load_context"]["cpu_calibration"]["spin_1t_sec"] if base else None
    )
    spin_ratio = (
        round(calib["spin_1t_sec"] / base_spin, 4) if base_spin else None
    )

    out: dict[str, dict] = {}
    for name in targets:
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            release_caches(df)
        best = min(walls)
        row: dict = {"min_of_3": best, "walls": walls}
        if base and name in base.get("queries", {}):
            b = base["queries"][name]
            row["baseline"] = b
            row["ratio_raw"] = round(best / b, 3)
            if spin_ratio:
                row["ratio_spin_normalized"] = round(best / b / spin_ratio, 3)
        out[name] = row

    print(
        json.dumps(
            {
                "protocol": "isolated-min-of-3",
                "sf_dir": sf_dir,
                "spin_1t_sec": calib["spin_1t_sec"],
                "baseline_spin_1t_sec": base_spin,
                "spin_ratio": spin_ratio,
                "loadavg_start": load_start,
                "loadavg_end": list(os.getloadavg()),
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
