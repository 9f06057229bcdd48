"""Round-7 regression tests: the r6 ADVICE findings.

- topk_admission_stream must honor non-default column-name parameters
  (ADVICE r6: the pandas sort/state logic hardcoded 'event_id'/'value'
  while selectExpr kept the caller's names, so any non-default id_col
  crashed with KeyError inside the streaming UDF).
- exact_order_statistics' final collect must stay bounded (distinct-value
  histogram + hard cap) even when the narrowing loop exhausts max_iters
  on near-identical-value data.
- the oracle harness must flag int-vs-float dtype mismatches (the driver
  hash is dtype-sensitive; q_dpp_prune failed r6 on exactly this).
"""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_topk_admission_stream_renamed_columns(spark):
    """Running the operator on a stream with entirely non-default column
    names must produce row-identical output to the default-named run."""
    from oem_gateway_spark.streaming import state as ST
    from oem_gateway_spark.suite.quality_extra import _ordered_event_replay
    from oem_gateway_spark.suite.streaming_batch import _run_to_table

    base = _ordered_event_replay(spark, SF)
    expected = _run_to_table(
        ST.topk_admission_stream(
            base,
            k=3,
            key_col="user_id",
            value_col="value",
            ts_ms_col="ts_ms",
            id_col="event_id",
        ),
        mode="update",
    ).toPandas()

    renamed = _ordered_event_replay(spark, SF).selectExpr(
        "user_id AS sensor",
        "event_id AS reading_id",
        "ts_ms AS observed_ms",
        "value AS amplitude",
    )
    got = _run_to_table(
        ST.topk_admission_stream(
            renamed,
            k=3,
            key_col="sensor",
            value_col="amplitude",
            ts_ms_col="observed_ms",
            id_col="reading_id",
        ),
        mode="update",
    ).toPandas()

    key = ["node", "event_id"]
    expected = expected.sort_values(key, ignore_index=True)
    got = got.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(got, expected)


def test_selection_final_collect_bounded_on_pileup(spark):
    """max_iters=0 forces every target through the final-collect path on
    a massive duplicate pileup; the distinct-value histogram keeps the
    driver transfer at |distinct| rows and still answers exactly."""
    from pyspark.sql import functions as F

    from oem_gateway_spark.operators.selection import exact_order_statistics

    # 10k rows but only 3 distinct values: a raw-row final collect would
    # pull all 10k; the distinct histogram pulls 3.
    df = spark.range(10_000).select(
        (F.col("id") % 3).cast("double").alias("x")
    )
    got = exact_order_statistics(
        df, "x", [0.25, 0.5, 0.99], max_iters=0, collect_cap=8
    )
    # sorted x = [0.0]*3334 + [1.0]*3333 + [2.0]*3333
    assert [v for _, _, v in got] == [0.0, 1.0, 2.0]


def test_selection_final_collect_hard_cap_raises(spark):
    """Adversarial case — many DISTINCT values and no narrowing — must
    fail loudly, not silently collect a driver-OOM-scale result."""
    from pyspark.sql import functions as F

    from oem_gateway_spark.operators.selection import exact_order_statistics

    df = spark.range(10_000).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(RuntimeError, match="final collect exceeded"):
        exact_order_statistics(df, "x", [0.5], max_iters=0, collect_cap=8)


def test_oracle_harness_flags_int_float_dtype_mismatch():
    from tests.oracle_harness import compare

    a = pd.DataFrame({"k": ["x"], "v": pd.array([75770367473], dtype="int64")})
    b = pd.DataFrame({"k": ["x"], "v": pd.array([75770367473.0], dtype="float64")})
    errs = compare(a, b, "dtype_case")
    assert errs and "dtype mismatch" in errs[0]
    # equal dtypes with equal values still pass
    assert compare(a, a.copy(), "same") == []


def test_reap_dead_owner_dirs(tmp_path):
    """The shared scratch GC: dead-PID dirs reaped, live-PID and young
    legacy dirs kept, stale legacy dirs reaped — and the returned path
    is scoped to this process."""
    import os
    import time

    from oem_gateway_spark.streaming.rollup import pid_scoped_dir

    base = str(tmp_path / "scratch")
    live = os.path.join(base, f"x_sf0_001_pid{os.getpid()}")
    dead = os.path.join(base, "x_sf0_001_pid999999999")
    legacy_young = os.path.join(base, "x_sf0_001")  # SF digits, no pid
    legacy_old = os.path.join(base, "y_sf0_01")
    for d in (live, dead, legacy_young, legacy_old):
        os.makedirs(d)
    old = time.time() - 25 * 3600
    os.utime(legacy_old, (old, old))

    got = pid_scoped_dir(base, "new_store")
    assert got == os.path.join(base, f"new_store_pid{os.getpid()}")
    assert os.path.exists(live)            # owner alive
    assert not os.path.exists(dead)        # owner dead -> reaped
    # legacy names must never parse their SF digits as a PID
    assert os.path.exists(legacy_young)    # younger than 24h -> kept
    assert not os.path.exists(legacy_old)  # stale crash leftover -> reaped


def test_interval_union_matches_brute_force(spark):
    """Triangulate q_interval_union with a BRUTE-FORCE merge: the oracle
    and the Spark plan share the gaps-and-islands formulation, so a
    shared blind spot there would pass the driver; this check merges
    the same intervals with the textbook sort-and-sweep in plain
    Python."""
    import duckdb

    from oem_gateway_spark.suite.incremental_extra import (
        _IU_SLICE,
        _IU_UNIT_MS,
    )
    from oem_gateway_spark.suite.registry import REGISTRY

    got = {
        r["user_id"]: (r["n_islands"], r["covered_ms"])
        for r in REGISTRY["q_interval_union"].fn(spark, SF).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS s,
                   CAST(epoch_ms(ts) AS BIGINT)
                     + (event_id % 7 + 1) * {_IU_UNIT_MS} AS e
            FROM read_parquet('{SF}/events.parquet')
            WHERE user_id % {_IU_SLICE} = 0"""
    ).fetchall()
    per: dict[int, list[tuple[int, int]]] = {}
    for u, s, e in rows:
        per.setdefault(u, []).append((s, e))
    for u, iv in per.items():
        merged: list[list[int]] = []
        for s, e in sorted(iv):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        expect = (len(merged), sum(e - s for s, e in merged))
        assert got[u] == expect, (u, got[u], expect)
    assert set(got) == set(per)


def test_session_assign_matches_brute_force(spark):
    """Same triangulation for the streaming session assignment: replay
    the slice's events per user in plain Python with the 6h-gap rule
    and compare every event's assigned session start."""
    import duckdb

    from oem_gateway_spark.suite.incremental_extra import _SESSION_GAP_MS
    from oem_gateway_spark.suite.registry import REGISTRY

    got = {
        (r["node"], r["event_id"]): r["session_start_ms"]
        for r in REGISTRY["stream_session_assign"].fn(spark, SF).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
            FROM read_parquet('{SF}/events.parquet')
            WHERE user_id % 50 = 0
            ORDER BY user_id, ts_ms, event_id"""
    ).fetchall()
    last: dict[int, int] = {}
    start: dict[int, int] = {}
    n = 0
    for u, eid, ts in rows:
        if u not in last or ts - last[u] > _SESSION_GAP_MS:
            start[u] = ts
        last[u] = ts
        assert got[(u, eid)] == start[u], (u, eid, got[(u, eid)], start[u])
        n += 1
    assert n == len(got)
