#!/usr/bin/env python
"""Benchmark the headline suite at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line (driver contract).

Each query materializes through the noop sink — full computation, zero
driver-transfer cost, so timings measure the engine, not toPandas.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    # gateway parity (text parse/decode chain over 600k frames)
    "g_parse_serial",
    "g_rfm2pi_decode",
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_window_running_sum",
    "q_sessionize",
    "q_range_join",
    # streaming (batch window family)
    "w_tumbling",
    "w_session",
    # LLM ops
    "d_exact_dedup_survivors",
    "d_exact_dedup_increment",
    "d_minhash_lsh_pairs",
    "d_contamination",
    "d_dup_clusters",
    "d_simhash_pairs",
    "d_simhash_hamming_k",
    "t_text_stats",
    "t_repetition",
    "t_boilerplate_ngrams",
    "t_pii_scrub",
    "t_gopher_quality",
    "t_chunking",
    "d_url_canonical",
    "q_salted_join",
    "q_window_time_range",
    "q10_returned_items",
    "q18_large_orders",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q17_small_quantity_revenue",
    "q21_sole_blame_suppliers",
    "t_unigram_logprob",
    "t_bpe_train",
    "d_heavy_hitters",
    "q_scd2_apply",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q15_top_supplier",
    "t_tfidf_top_terms",
    "d_pagerank",
    "q_data_profile",
    "q_resample_interpolate",
    "q_mad_outliers",
    "d_triangles",
    "q_cohort_retention",
    "d_cluster_survivors",
    "d_minhash_containment",
    "q_linreg_per_node",
    "d_lsh_recall_by_class",
    "q_reachability",
    "d_ngram_jaccard",
    "q_fuzzy_match",
    "q_bucketed_join",
    "s_quantize_int8",
    "s_kmeans",
    "s_cosine_topk",
    "s_ann_lsh_topk",
    "s_ivf_ann_topk",
    "s_ivf_nprobe",
    "pipeline_data_prep",
    "pipeline_data_prep_v2",
    # round-5 additions
    "q_skyline",
    "q_hll_partial_merge",
    "d_semdedup_centroid",
    "d_group_split",
    "q_skew_diagnostics",
    # round-6 additions
    "q_merge_upsert",
    "q_shortest_path_bounded",
    "stream_topk_admission",
    "d_setsim_prefix_join",
    "q_merkle_reconcile",
    "q_kmv_intersect",
    "q_dpp_prune",
    "q_percentile_select",
    "q_bloom_prune",
    # round-7 additions
    "q_ivm_delta",
    "q_cdc_changelog",
    "q_bitmap_distinct",
    "q_interval_union",
    "stream_session_assign",
    "d_incremental_minhash",
    "q_schema_evolution",
    "q_time_weighted_avg",
    "q_variant_shred",
    "q_cbo_join_reorder",
    # round-8 additions
    "q_sequence_pattern",
    "q_null_safe_join",
    "q_binned_theta_join",
    "d_dedup_rewrite",
    "u_sql_udf",
    "stream_upsert_latest",
    "q_multi_format_union",
    "g_framelog_batch",
    "q_hierarchy_resolve",
    # round-9 additions
    "stream_upsert_rocksdb",
    "q_recursive_cte",
    # round-10 additions
    "stream_upsert_resume",
    # r10 language surfaces
    "q_pipe_syntax",
    "q_collated_group",
    "q_xml_extract",
    "q_param_sql",
    "u_map_in_arrow",
    "stream_state_reader",
    "q_orc_roundtrip",
    # round-11 additions
    "stream_state_reader_rocksdb",
    "g_serial_stream_replay",
    "g_framelog_sink_stream",
    "q_sql_script",
    "g_framelog_pushdown",
    # round-12 additions
    "g_framelog_stream_partitioned",
    "stream_stream_full_outer_join",
    "stream_stream_left_semi_join",
    "u_udtf_analyze",
    # round-13 additions
    "stream_stream_full_outer_rocksdb",
    "stream_join_then_window",
    "stream_window_then_window",
    "u_udtf_table_partition",
    "u_udtf_analyze_table",
    "u_sql_table_function",
    "u_arrow_udf",
    "q_try_arithmetic",
    "q_session_variable",
    "s_jl_projection",
    "stream_dedup_then_window",
    "u_apply_in_arrow",
    "stream_observe_metrics",
    "u_pandas_udf_iter",
    "u_pandas_udf_window",
    "w_session_dynamic",
]


def _git_head(here: str) -> str | None:
    """HEAD commit of the checkout that produced this run — the secondary
    round disambiguator (r9 ADVICE: once a round adds no headline queries,
    the set-equality refusal below would otherwise make the env var
    mandatory forever).  None when git is unavailable."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", here, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        )
        return out.stdout.strip() or None
    except Exception:
        return None


def _code_changed_since(here: str, old_head: str) -> bool | None:
    """Whether MEASURED-BEHAVIOR SOURCE (oem_gateway_spark/** or bench.py
    itself) changed between ``old_head`` and the current HEAD.  The
    recorded git_head is taken DURING the bench run, i.e. before the
    artifact itself (and any round-closing docs) are committed — so on a
    same-round rerun HEAD has always advanced past it and head inequality
    alone proves nothing (r10 review finding: the escape hatch fired on
    every post-close rerun and would mislabel a next-round artifact from
    unchanged code).  The path test is a whitelist of what the bench
    actually executes, not a blacklist of artifacts (r10 ADVICE: the old
    anything-but-.md/.json rule let a tests-only or tools-only commit
    re-arm full-artifact writing from an unchanged engine — the exact
    mislabeling the guard exists to prevent).  None when git can't answer
    (treat as unknown -> allow, preserving the old behavior)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", here, "diff", "--name-only", f"{old_head}..HEAD"],
            capture_output=True, text=True, timeout=10,
        )
        if out.returncode != 0:
            return None
        names = [n.strip() for n in out.stdout.splitlines() if n.strip()]
        return any(
            n == "bench.py" or n.startswith("oem_gateway_spark/")
            for n in names
        )
    except Exception:
        return None


def _cpu_calibration() -> dict:
    """Fixed-work CPU probe embedded in the artifact so walls are
    comparable ACROSS BOOTS, not just across ambient-load states.  The
    r10 discovery that motivates this: a quiet-loadavg run (start 0.26)
    measured every query — including code-untouched ones — uniformly
    ~1.4x slower than the r9 artifact, through the min-of-3 sweep that
    already removes cold-cache and warmup effects.  Loadavg cannot see
    hypervisor-level slowness (a different physical host, CPU steal,
    frequency caps), so the artifact carries its own ruler: the seconds
    a fixed single-threaded integer loop takes on THIS boot.  Judges
    divide walls by (spin_1t_sec / a reference spin) to separate "the
    engine regressed" from "the box is slower".  ~1 s cost, measured
    before the Spark session exists."""
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    spin = round(time.perf_counter() - t0, 4)
    model = None
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    import platform

    return {
        "spin_1t_sec": spin,
        "cpu_model": model,
        "n_cpus": os.cpu_count(),
        # The spin loop measures the CPython interpreter as much as the
        # host (r10 ADVICE: a Python build change between rounds shifts
        # spin_1t_sec with zero hardware change); recording the
        # interpreter lets a judge tell interpreter drift from host drift.
        "python": platform.python_version(),
        "python_impl": platform.python_implementation(),
    }


def _baseline_comparison(
    here: str, timings: dict[str, float], calib: dict
) -> dict | None:
    """Self-comparison against the DESIGNATED calibrated baseline
    (BENCH_BASELINE.json — one fastest-available-boot full artifact,
    committed once; r10 VERDICT #2: without it every judge re-litigates
    whether a wall moved because the engine changed or the box did).

    Emits both the raw wall ratio and the spin-normalized ratio
    (raw / (this_spin / baseline_spin)) over the baseline's recorded
    query set.  null when the baseline file is absent, lacks a spin
    ruler, or recorded a query this run didn't time (the same
    'null, never a silent partial sum' contract as the per-round
    comparable walls).  ``spin_ratio > 1`` reads 'this boot is slower
    than the baseline boot'; ``wall_ratio_spin_normalized`` is the
    engine-attributable residue a judge should grade."""
    path = os.path.join(here, "BENCH_BASELINE.json")
    try:
        with open(path) as f:
            base = json.load(f)
        base_queries: dict[str, float] = base["queries"]
        base_spin = base["load_context"]["cpu_calibration"]["spin_1t_sec"]
        # Shape-dependent arithmetic stays INSIDE the guard (r11 review:
        # a hand-edited baseline with "queries" as a list passed the
        # loads above, then sum(.values()) raised AFTER the full timed
        # run, losing the artifact — exactly the crash the null
        # contract exists to prevent).
        missing = set(base_queries) - timings.keys()
        if missing or not base_spin:
            return None
        base_wall = round(sum(base_queries.values()), 3)
        this_wall = round(sum(timings[q] for q in base_queries), 3)
        spin = calib.get("spin_1t_sec")
        spin_ratio = round(spin / base_spin, 4) if spin else None
        raw = round(this_wall / base_wall, 4) if base_wall else None
    except (OSError, KeyError, ValueError, TypeError, AttributeError):
        return None
    return {
        "baseline_round": base.get("round"),
        "baseline_git_head": base.get("git_head"),
        "baseline_wall": base_wall,
        "baseline_spin_1t_sec": base_spin,
        "this_wall_over_baseline_set": this_wall,
        "spin_ratio": spin_ratio,
        "wall_ratio_raw": raw,
        "wall_ratio_spin_normalized": (
            round(raw / spin_ratio, 4) if raw and spin_ratio else None
        ),
    }


def _await_quiet_host(quiet: float) -> None:
    """Optionally hold the bench start until the 1-min loadavg drops under
    the quiet threshold (r9 VERDICT #3: every committed full artifact so
    far was measured under ambient load; a sub-threshold run end-to-end
    gives later rounds a noise-free subtraction base).  Opt-in via
    SPARK_GRAFT_QUIET_WAIT_SECS so the driver's unattended per-round run
    never blocks; when the wait expires the run proceeds WITH A WARNING —
    the artifact's embedded load_context stays the ground truth."""
    raw_wait = os.environ.get("SPARK_GRAFT_QUIET_WAIT_SECS", "0") or "0"
    try:
        wait = float(raw_wait)
    except ValueError:
        # Same env-var bug class as SPARK_GRAFT_BENCH_ROUND (r9 ADVICE):
        # a malformed value must never abort the run before the contract
        # line prints.  Warn and skip the quiet wait.
        print(
            "bench: ignoring malformed SPARK_GRAFT_QUIET_WAIT_SECS="
            f"{raw_wait!r}; starting without a quiet wait",
            file=sys.stderr,
        )
        wait = 0.0
    deadline = time.monotonic() + wait
    cur = os.getloadavg()[0]
    while cur > quiet and time.monotonic() < deadline:
        print(
            f"bench: 1-min loadavg {cur:.2f} > quiet threshold {quiet}; "
            "waiting for a quiet window...",
            file=sys.stderr,
        )
        time.sleep(min(30.0, max(1.0, deadline - time.monotonic())))
        cur = os.getloadavg()[0]
    if cur > quiet:
        print(
            f"bench: starting under ambient load (1-min loadavg {cur:.2f} "
            f"> {quiet}); walls include neighbor noise — see load_context",
            file=sys.stderr,
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # Host load at bench start (sampled again at the end): the r8 judge
    # found the committed artifact was an ambient-load run while the quiet
    # run lived only in prose — embedding the context makes every future
    # wall comparison self-describing (quiet host on this box idles ~0.5).
    QUIET_THRESHOLD = 2.0
    _await_quiet_host(QUIET_THRESHOLD)
    load_start = list(os.getloadavg())
    cpu_calibration = _cpu_calibration()

    from oem_gateway_spark import get_spark
    from oem_gateway_spark.suite import REGISTRY

    spark = get_spark(app_name="oem-gateway-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest sf (excluded from timings).
    REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    # Best-of-3: this host carries ambient load from other tenants (same
    # code measured 17s..25s wall across runs in round 4); min-of-three
    # measures the engine, not the neighbors.
    from oem_gateway_spark.operators.dedup import release_caches

    timings: dict[str, float] = {}
    for _pass in range(3):
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            release_caches(df)  # drop operator-owned persisted blocks

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # The headline list grows as operators land; this subtotal covers the
    # 17 queries BENCH_r02 timed, so round-over-round wall comparison stays
    # apples-to-apples as new ops join the wall.
    R2_COMPARABLE = {
        "g_parse_serial", "g_rfm2pi_decode", "q1_pricing_summary",
        "q3_shipping_priority", "q5_local_supplier_volume",
        "q_window_running_sum", "q_sessionize", "q_range_join",
        "w_tumbling", "w_session", "d_exact_dedup_survivors",
        "d_minhash_lsh_pairs", "t_text_stats", "s_cosine_topk",
        "s_ann_lsh_topk", "s_ivf_ann_topk", "pipeline_data_prep",
    }
    r2_wall = round(
        sum(t for q, t in timings.items() if q in R2_COMPARABLE), 3
    )

    # Same discipline one generation later (VERDICT r4 #6, r5 #6): the
    # query sets BENCH_r04 / BENCH_r05 timed, frozen by name, so future
    # rounds compare either wall with one subtraction even as the
    # headline list grows.  null (not 0.0) when an artifact is absent —
    # a missing baseline must never read as an infinite speedup.
    def _comparable_wall(artifact: str) -> float | None:
        here_ = os.path.dirname(os.path.abspath(__file__))
        # Prefer the repo's own complete copy of that round's bench output
        # (BENCH_full_rNN.json, written below): the driver's BENCH_rNN.json
        # keeps only a tail substring, and from r6 on that tail TRUNCATES
        # THE HEAD of the queries dict, so brace-recovery fails and the
        # wall correctly (but unnecessarily) nulls.
        full = os.path.join(here_, artifact.replace("BENCH_r", "BENCH_full_r"))
        try:
            with open(full) as f:
                names = set(json.load(f)["queries"])
            if names - timings.keys():
                return None
            return round(sum(t for q, t in timings.items() if q in names), 3)
        except (OSError, KeyError, ValueError, TypeError):
            pass
        path = os.path.join(here_, artifact)
        try:
            with open(path) as f:
                data = json.load(f)
            parsed = data.get("parsed")
            if parsed is not None:
                names = set(parsed["queries"])
            else:
                # BENCH_r05.json ships parsed=null (the driver's own JSON
                # parse hit its tail truncation) but the queries object
                # survives intact inside the 'tail' string — recover it by
                # brace matching so the r5 wall doesn't silently go null.
                tail = data.get("tail", "")
                m = re.search(r'"queries":\s*\{', tail)
                if not m:
                    return None
                start, depth, names = m.end() - 1, 0, None
                for i in range(start, len(tail)):
                    if tail[i] == "{":
                        depth += 1
                    elif tail[i] == "}":
                        depth -= 1
                        if depth == 0:
                            names = set(json.loads(tail[start : i + 1]))
                            break
                if names is None:
                    return None
            # The wall is only comparable when EVERY query the old round
            # timed was timed this run too: if one is later dropped or
            # renamed from HEADLINE, a partial sum would silently shrink
            # and read as a speedup.  null = incomparable, never faster.
            if names - timings.keys():
                return None
            return round(sum(t for q, t in timings.items() if q in names), 3)
        except (OSError, KeyError, ValueError, TypeError):
            return None

    # One comparable wall per recorded round >= r4 (r2 is the hand-frozen
    # set above; r1/r3 artifacts predate the queries-dict format), so next
    # round's drift check is one subtraction with no bench.py edit.
    import glob as _glob

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    # Emit every round from r4 up to the newest artifact, null when one is
    # missing or unparseable (the 'null, not 0.0' contract: a missing
    # baseline must never read as an infinite speedup or a silently
    # skipped drift check).
    walls: dict[str, float | None] = {
        f"r{n}_comparable_wall": _comparable_wall(f"BENCH_r{n:02d}.json")
        for n in range(4, max(rounds, default=3) + 1)
    }

    # Headline throughput vs the reference: frames parsed per second
    # through the full serial classify+parse+explode chain.  The reference
    # gateway caps at ~5 frames/s/listener (BASELINE.md: one read() per
    # 0.2 s tick); this is the same dataflow at engine speed.
    n_frames = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    )
    frames_per_sec = round(n_frames / max(timings["g_parse_serial"], 1e-9), 1)

    baseline_cmp = _baseline_comparison(here, timings, cpu_calibration)
    git_head = _git_head(here)
    line = json.dumps(
        {
            "metric": "headline_suite_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "r2_comparable_wall": r2_wall,
            **walls,
            "calibrated_baseline": baseline_cmp,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "parse_frames_per_sec": frames_per_sec,
            "reference_frames_per_sec": 5.0,
            "load_context": {
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "quiet_threshold_1m": QUIET_THRESHOLD,
                "cpu_calibration": cpu_calibration,
            },
            # Round disambiguator (r9 ADVICE): lets an unchanged-headline
            # round self-label — see the full-artifact guard below.
            "git_head": git_head,
            # Tail-parseable compact record, LAST key on purpose (r13
            # VERDICT #3: the driver's BENCH_rNN.json keeps only a
            # 2000-char tail of this line, and in r12 that truncation cut
            # the head of the ~6 KB queries dict, nulling every prev/now
            # pair in PERF_r13).  Everything a round-over-round judge
            # needs — wall, per-round comparable-set walls, the spin
            # ruler, the checkout — now sits inside the final ~1.2 KB, so
            # brace-matching on '"summary": {' recovers it from any tail
            # that keeps the line's end.  The line itself remains the ONE
            # JSON object of the driver contract (a second printed line
            # risks the driver parsing the wrong one); per-query detail
            # stays in "queries" above, unchanged.
            "summary": {
                "wall": total,
                "n_queries": len(timings),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "r2_comparable_wall": r2_wall,
                "comparable_walls": walls,
                "spin_1t_sec": cpu_calibration.get("spin_1t_sec"),
                "loadavg_start_1m": round(load_start[0], 2),
                "baseline_wall_ratio_spin_normalized": (
                    baseline_cmp.get("wall_ratio_spin_normalized")
                    if baseline_cmp
                    else None
                ),
                "git_head": git_head,
            },
        }
    )
    # Persist the COMPLETE output for the round in progress (= newest
    # driver artifact + 1; the driver writes BENCH_rNN.json only at round
    # end): future rounds read the full queries dict from here instead of
    # the driver artifact's head-truncated tail (see _comparable_wall).
    # NEVER SHRINK an existing file's query set (r8 code review): a run
    # from an early-in-round or stale checkout would otherwise rewrite
    # the round's recorded set to a subset, and the next round's
    # comparable wall would silently sum fewer queries — exactly the
    # partial-sum-reads-as-a-speedup hazard the null contract exists for.
    try:
        # Round of record: explicit env var wins (r8 ADVICE — artifact-count
        # inference mislabels a re-run made after the driver wrote
        # BENCH_r{N}.json but before any round-{N+1} change landed); else
        # infer as newest driver artifact + 1, but REFUSE to write when this
        # run's headline set is identical to the previous round's recorded
        # full set — that state is indistinguishable from a stale-checkout
        # re-run, and a mislabeled full artifact poisons every later
        # comparable-wall subtraction.
        env_round = os.environ.get("SPARK_GRAFT_BENCH_ROUND")
        cur_round = None
        if env_round:
            try:
                cur_round = int(env_round)
            except ValueError:
                # r9 ADVICE: a malformed env var used to escape the
                # enclosing 'except OSError' and abort main before the
                # contract line printed.  Warn and fall back to inference.
                print(
                    "bench: ignoring malformed SPARK_GRAFT_BENCH_ROUND="
                    f"{env_round!r}; inferring the round instead",
                    file=sys.stderr,
                )
                env_round = None
        if cur_round is None:
            cur_round = max(rounds, default=0) + 1
        prev_full = os.path.join(
            here, f"BENCH_full_r{cur_round - 1:02d}.json"
        )
        if not env_round and os.path.exists(prev_full):
            try:
                with open(prev_full) as f:
                    prev = json.load(f)
                same_set = set(prev["queries"]) == timings.keys()
                # Secondary disambiguator (r9 ADVICE): an unchanged
                # headline set is only ambiguous when the CHECKOUT is
                # also indistinguishable from the one that produced the
                # previous artifact — a different git HEAD means real
                # round work landed, so the run may self-label.
                head = _git_head(here)
                same_head = (
                    head is None
                    or prev.get("git_head") is None
                    or head == prev.get("git_head")
                )
                # A different HEAD only counts as "real round work landed"
                # when SOURCE changed since the recorded head — the
                # artifact commit itself (and round-closing docs) always
                # advance HEAD, so head inequality alone is not evidence
                # (r10 review finding).
                if same_set and not same_head and prev.get("git_head"):
                    changed = _code_changed_since(here, prev["git_head"])
                    if changed is False:
                        same_head = True  # docs/artifacts only: still ambiguous
                if same_set and same_head:
                    print(
                        "bench: NOT writing a full artifact — this run's "
                        f"headline set equals r{cur_round - 1}'s recorded "
                        "set and the checkout is indistinguishable "
                        "(git_head match or unrecorded), so the round "
                        "inference is ambiguous; set "
                        "SPARK_GRAFT_BENCH_ROUND to force.",
                        file=sys.stderr,
                    )
                    print(line)
                    return
            except (OSError, KeyError, ValueError):
                pass
        full_path = os.path.join(here, f"BENCH_full_r{cur_round:02d}.json")
        existing: set[str] = set()
        try:
            with open(full_path) as f:
                existing = set(json.load(f)["queries"])
        except (OSError, KeyError, ValueError):
            pass
        if existing <= timings.keys():
            with open(full_path, "w") as f:
                f.write(line + "\n")
        else:
            print(
                f"bench: NOT rewriting {os.path.basename(full_path)} — this "
                f"run timed {len(timings)} queries but the recorded set has "
                f"{len(existing - timings.keys())} it lacks (stale checkout?)",
                file=sys.stderr,
            )
    except OSError:
        pass  # read-only checkout: the printed line is still the contract
    print(line)


if __name__ == "__main__":
    main()
