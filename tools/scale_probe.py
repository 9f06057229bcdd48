#!/usr/bin/env python
"""Empirical scaling probe: measure how the heavy operators grow as the
corpus multiplies, and write SCALING.md.

    python tools/scale_probe.py [--factors 1,2,4] [--sf /root/testdata/sf0.1]

Builds k-times-replicated copies of ``documents`` / ``embeddings`` under
``.scratch/scale/`` (deterministic per-replica perturbations so replicas
are near- but not exact duplicates — dedup keeps real work to do), runs
the operator set at each factor (best of 2, noop sink), and reports the
observed growth exponent log(t_k/t_1)/log(k).  An exponent near 1.0 is
the evidence the bucketed/banded plans deliver what they promise: linear
corpus cost, no hidden quadratic candidate blowup.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/root/repo/.scratch/scale"

# Operators worth probing: everything with a join/self-join/iteration that
# COULD go quadratic, plus one map-only baseline.
PROBES = [
    "t_text_stats",            # map-only baseline (must be ~1.0)
    "s_ann_lsh_topk",           # bucketed ANN (before the checkpoint-heavy ops)
    "d_exact_dedup_survivors",  # hash shuffle + window
    "d_exact_dedup_increment",  # batch keep-first + store anti-join
    "t_repetition",             # per-row run-length fold (map-only)
    "t_boilerplate_ngrams",     # 8-gram explode + partial-agg + TakeOrdered
    "d_minhash_lsh_pairs",      # banded LSH self-join
    "d_simhash_hamming_k",      # banded SimHash self-join
    "d_contamination",          # broadcast gram join
    "d_dup_clusters",           # iterative connected components (checkpoints)
    "t_chunking",               # index-explode + slice (map-only, row growth)
    "d_url_canonical",          # regex canon + two-level distinct agg
    "s_kmeans",                 # iterative Lloyd's (scan per iteration)
    "t_unigram_logprob",        # tf persist + vocab join (corpus-linear?)
    "d_chunk_dedup",            # chunk fingerprints + keep-first window
    # round-4 additions over lineitem/events (replicated below too):
    "d_triangles",              # top-K backbone + wedge join (orientation cap)
    "d_pagerank",               # iterative rank propagation (stationary edges)
    "q_reachability",           # frontier BFS (shrinking anti-joined frontier)
    "q_resample_interpolate",   # grid union + two window directions
    "q_mad_outliers",           # two grouped exact percentiles
    "d_minhash_containment",    # broadcast-pairs shingle intersection
    "d_cluster_survivors",      # CC + per-cluster argmax
    "t_tfidf_top_terms",        # tf agg + vocab-sized df join
    # round-5 additions (VERDICT r4 #7):
    "q_fuzzy_match",            # blocked levenshtein argmin — block sizes are
                                # the risk; replicas clone the block-key
                                # vocabulary (entity-growth axis: more blocks,
                                # constant block size; see part replication)
    "q_bucketed_join",          # bucketed SMJ — bucket count fixed at 16 while
                                # data grows: per-bucket file size is the axis
    "t_length_profile",         # two grouped exact percentiles + re-scan join
    "q_skyline",                # frontier pass bounded by distinct-x, not n
    "q_hll_partial_merge",      # sketch partials: merge cost ~ #months, flat
    "d_semdedup_centroid",      # within-cluster pairs: k = ceil(n/TARGET) now
                                # SCALES with the corpus and oversized clusters
                                # re-split at CAP (r6 fix for the r5 VERDICT's
                                # one quadratic row) — expected exponent ~1.0
                                # (pair work n*TARGET, linear)
    "d_group_split",            # map pass + tiny aggregate: must stay flat
    "q_skew_diagnostics",       # 3x unpivot + two-level agg: linear in rows
    # round-6 additions:
    "q_merge_upsert",           # change-feed agg + one full-outer join: linear
    "q_shortest_path_bounded",  # Bellman-Ford relaxation on capped edges —
                                # frontier shrinks as bounds converge; watch
                                # for edge-build growth like q_reachability
    "d_setsim_prefix_join",     # prefix-filter join: explode + rare-token
                                # buckets — near-linear unless hot shingles
                                # dominate prefixes
    "q_merkle_reconcile",       # two digest scans + diff bounded by drift —
                                # must stay linear in input, flat in output
    "q_percentile_select",      # histogram-narrowing selection: scans x
                                # (2 + rounds); rounds grow ~log_64(n/cap),
                                # so near-linear with a tiny log factor
    # round-7 additions:
    "q_ivm_delta",              # delta agg + MV merge: cost ~ |delta|+|MV|,
                                # both linear in the replication factor
    "q_cdc_changelog",          # full-outer diff + posexplode: one
                                # co-partitioned join, output ~ drift
    "q_bitmap_distinct",        # two-level bitmap partials: shuffle rows
                                # bounded by |groups| x domain/64 — word
                                # count grows with the key domain, flat-ish
    "q_interval_union",         # sweep-line windows: per-key sort, linear
    "d_incremental_minhash",    # asymmetric LSH probe: store never
                                # self-joins; broadcast batch side — must
                                # stay linear in the store
    "q_time_weighted_avg",      # lead() window + integer products: linear
    # round-8 additions:
    "q_sequence_pattern",       # lag-chain pattern match: one user exchange,
                                # per-user series length constant under the
                                # fleet-growth axis — must stay linear
    "q_binned_theta_join",      # binned theta join: replicas DUPLICATE the
                                # value distribution, so in-eps density and
                                # hence TRUE pair count grow ~k^2 — expected
                                # super-linear tail by OUTPUT construction
                                # (the d_setsim/d_incremental_minhash
                                # reading: candidate generation stays linear
                                # per emitted pair; no plan fix can beat the
                                # size of the correct answer)
    "d_dedup_rewrite",          # segment keep-first + positional reassembly:
                                # replica segments dedup to the x1 corpus, so
                                # the window input grows k-fold, kept output
                                # stays ~x1 — must stay linear
    "q_hierarchy_resolve",      # pointer doubling: part replicas shift keys
                                # k*n_part, so the forest gains nodes AND one
                                # extra level every 4x — rounds grow as
                                # ceil(log2 depth), i.e. +1 doubling per 4x;
                                # per-round cost linear in nodes
    # round-9 additions:
    "q_recursive_cte",          # engine-managed recursion (UnionLoop): same
                                # forest as q_hierarchy_resolve but ONE parent
                                # hop per round — rounds grow as depth
                                # (+log4 k), per-round cost linear; the
                                # declarative-vs-pointer-doubling tradeoff
                                # measured side by side
    # round-10 additions (language surfaces — per-row cost is the claim,
    # so all four must track the map-only baseline at ~1.0):
    "q_pipe_syntax",            # pipe-parsed scan-agg over lineitem xk: the
                                # parser is per-STATEMENT, so the exponent
                                # must equal the ANSI scan-agg family's
    "q_collated_group",         # UTF8_LCASE grouping over part xk: replicas
                                # keep the 25-brand vocabulary, so group
                                # count is constant and rows grow k-fold —
                                # collation-key hashing is per-row, linear
    "q_xml_extract",            # per-row XML serialize + from_xml parse over
                                # lineitem xk: pure map cost + one agg, the
                                # parse must scale like any row expression
    "u_map_in_arrow",           # Arrow-batch Python stage over lineitem xk:
                                # batch count grows k-fold at constant batch
                                # size — per-batch overhead amortizes, linear
    # round-11 additions:
    "stream_state_reader_rocksdb",  # RocksDB-checkpointed replay + offline
                                # state read over events xk: the slice rows
                                # grow ~k-fold through 4 fixed micro-batches
                                # while the state key space stays 89 keys x 8
                                # partitions — RocksDB store machinery (per
                                # partition per batch) is the x1 wall, so the
                                # exponent must stay well under 1 as rows
                                # absorb into constant machinery; the reader
                                # side re-reads constant-size state
    "g_framelog_sink_stream",   # Python streaming WRITER over events xk:
                                # slice rows grow ~k-fold through 4 fixed
                                # micro-batches x 8 partitions of executor-
                                # side Python write() calls — per-task file +
                                # manifest machinery is the x1 floor, row
                                # serialization the linear term; expected
                                # sub-linear until rows dominate (like
                                # u_map_in_arrow's 0.79 tail shape)
    "g_framelog_pushdown",      # Python-source pushFilters over lineitem xk:
                                # the shard IN (2,5) predicate always prunes
                                # 6 of 8 capture files, so cost is linear in
                                # the SURVIVING quarter of the log — the wall
                                # must track the scan-parse family's shape,
                                # never the full-log size times k
    "q_sql_script",             # SQL-script WHILE search over lineitem xk:
                                # ~5 loop iterations (quantity distribution
                                # survives replication, so the cutoff and the
                                # iteration count are factor-invariant), each
                                # a full count scan — cost is iterations x
                                # scan, expected flat-to-linear like the
                                # scan-agg family; eager execution inside
                                # fn() so the probe wall captures the loop
    "g_serial_stream_replay",   # serial byte-stream replay over lineitem xk:
                                # ONE device = ONE reader partition by design
                                # (SURVEY §6); the probe measures the honest
                                # single-listener ceiling — line count grows
                                # k-fold through a single Python reader, so
                                # the wall is expected LINEAR in k (exp ~1);
                                # engine-scale parallelism is listener count
                                # (R1 fan-in), never splitting one port
    # round-12 additions:
    "g_framelog_stream_partitioned",  # partition-PLANNED streaming tail over
                                # lineitem xk: 8 shard files read in
                                # PARALLEL within each micro-batch (one
                                # InputPartition per grown file — the
                                # Simple reader's single-cursor ceiling
                                # lifted), so per-shard line count grows
                                # k-fold across 8 concurrent Python
                                # readers; expected machinery-bound at
                                # small k (two availableNow queries +
                                # checkpoint resume ~5 s floor), tail
                                # approaching linear/8-way-amortized
    "stream_stream_full_outer_join",  # events xk replicas are NEW users, so
                                # join matches and buffered state grow
                                # LINEARLY (no cross-replica matches);
                                # both sides shuffle on user_id once;
                                # watermark-close null emission is a
                                # per-evicted-row cost — expected
                                # micro-batch floor + linear term
    "stream_stream_left_semi_join",   # same replica geometry; semi state is
                                # strictly smaller than inner (matched
                                # left rows drop immediately), so the
                                # exponent must not exceed the full
                                # outer twin's
    # round-13 additions:
    "stream_stream_full_outer_rocksdb",  # the full-outer twin on RocksDB +
                                # changelog: per-batch DELTA commits
                                # replace the HDFS provider's full-state
                                # snapshot per commit, so the x8 tail
                                # must undercut the default twin's
                                # measured 1.22 (the r12 quadratic-onset
                                # row this provider exists to fix)
    "stream_join_then_window",  # chained join -> windowed agg: join state
                                # linear (new-user replicas), agg state
                                # bounded by (days x users); expected
                                # micro-batch floor + linear term like
                                # the inner twin
    "u_udtf_table_partition",   # PARTITION BY shuffle + per-group Python
                                # stream; rows/group constant across
                                # replicas (new users) so expected
                                # linear in groups — a super-linear
                                # exponent would mean the Python hop
                                # rebuffers across groups
    "stream_window_then_window",  # chained window->window aggs: state is
                                # (windows x event types) per level —
                                # TIME-bounded, so replica growth adds
                                # rows per window, not state rows;
                                # expected near-flat (count-only inner
                                # work) + micro-batch floor
    # round-13 second batch:
    "stream_dedup_then_window",  # chained dedup -> window agg over the
                                # DOUBLED stream: dedup state ~ distinct
                                # event_ids in the watermark horizon
                                # (linear in replicas — new ids), agg
                                # state time-bounded; expected
                                # micro-batch floor + linear scan term
    "stream_observe_metrics",   # observe() rides the existing pass: pure
                                # scan + one partial agg, no shuffle of
                                # data rows; expected machinery floor +
                                # linear scan, NO state term
    "s_jl_projection",          # the audit only touches the id-capped
                                # sample (filters pushed to the scan,
                                # fixed pair count), so expected ~FLAT —
                                # growth here means the cap or the
                                # pushdown regressed; the corpus-linear
                                # projection matmul itself is the same
                                # pandas-batch path the probed
                                # s_ann/s_kmeans family exercises
    "u_apply_in_arrow",         # grouped-map Arrow: one hash shuffle on
                                # l_returnflag, per-group kernel linear
                                # in group size; 3 groups regardless of
                                # replicas, so the Python hop count is
                                # constant and bytes grow linearly
    "u_sql_table_function",     # inlined body -> broadcast join with
                                # pushed predicates; both sides grow
                                # linearly, no state; expected ~1.0
    "u_arrow_udf",              # expression-position Arrow kernel over
                                # documents + JVM agg: map-only linear
    "u_pandas_udf_iter",        # SCALAR_ITER over lineitem xk: map-only
                                # linear; the per-partition init count
                                # is bounded by cores, so Python-entry
                                # overhead must stay FLAT as rows grow
    "u_pandas_udf_window",      # single-partition 10-row sliding frames
                                # over the %20 slice: linear rows through
                                # ONE sorted partition — the documented
                                # bounded-output diagnostic shape; a
                                # super-linear exponent would mean frame
                                # evaluation stopped sliding
    "w_session_dynamic",        # shuffle on user_id + session merge:
                                # events replicas are NEW users (id
                                # shift), so per-user series length is
                                # constant and session count grows
                                # linearly — expected ~1.0
]


def _build_scaled(spark, sf_dir: str, factor: int) -> str:
    """Replicate documents/embeddings ``factor`` times with deterministic
    perturbations; returns the scaled table dir (cached across runs)."""
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"x{factor}")
    # _DONE_v3: v2 dirs lack the scaled part/orders added for the round-5
    # fuzzy-match/bucketed-join probes — rebuild (and clear the stale
    # part/orders SYMLINKS v2 dirs hold, so the writes below never chase
    # a link into the read-only testdata).
    marker = os.path.join(out, "_DONE_v3")
    if os.path.exists(marker):
        return out
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    pt = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    d_parts, e_parts = [], []
    for k in range(factor):
        # replica k: ids shift by k*n; text gets a replica salt token so
        # replicas are near-dups (MinHash still banding them together at
        # jaccard ~1) rather than byte-identical rows.
        d_parts.append(
            docs.select(
                (F.col("doc_id") + k * n_docs).alias("doc_id"),
                (
                    F.col("text")
                    if k == 0
                    else F.concat(F.col("text"), F.lit(f" replica{k}"))
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        # Replica vec_ids are mapped off the %100==0 lattice (x*100+1):
        # the ANN queries() pick vec_id % 100 == 0, so preserving residues
        # would grow the QUERY set k-fold alongside the corpus and the
        # probe would measure a k^2 workload (k queries x k bucket size),
        # not corpus scaling.  With replicas off-lattice the query set
        # stays the x1 set and the exponent isolates corpus cost.
        e_parts.append(
            emb.select(
                (
                    F.col("vec_id")
                    if k == 0
                    else (F.col("vec_id") + k * n_vecs) * 100 + 1
                ).alias("vec_id"),
                (
                    F.col("embedding")
                    if k == 0
                    else F.transform(
                        "embedding", lambda x: x * (1.0 + k * 1e-3)
                    ).cast("array<float>")
                ).alias("embedding"),
                "label",
            )
        )
    sd, se = d_parts[0], e_parts[0]
    for p in d_parts[1:]:
        sd = sd.unionByName(p)
    for p in e_parts[1:]:
        se = se.unionByName(p)
    sd.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    se.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    # lineitem replicas: order ids shift, SUPPLIERS STAY — the
    # co-occurrence graph keeps its node set while its edge weights and
    # the self-join input grow k-fold (the "orders grow, device
    # population fixed" axis the graph ops must stay linear on).
    n_ord = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    l_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * n_ord))
        for k in range(factor)
    ]
    sl = l_parts[0]
    for p in l_parts[1:]:
        sl = sl.unionByName(p)
    sl.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
    # events replicas: NEW users (id shift) — per-node series length is
    # constant, node count grows k-fold (the fleet-growth axis the
    # window/percentile ops must stay linear on).
    n_eid = ev.agg(F.max("event_id")).collect()[0][0] + 1
    n_uid = ev.agg(F.max("user_id")).collect()[0][0] + 1
    e2_parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(k * n_eid))
        .withColumn("user_id", F.col("user_id") + F.lit(k * n_uid * 100))
        if k else ev
        for k in range(factor)
    ]
    sev = e2_parts[0]
    for p in e2_parts[1:]:
        sev = sev.unionByName(p)
    sev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    # part replicas: replica k appends k to the NAME (and so to its last
    # word, the fuzzy-match blocking key) — the block-key vocabulary
    # clones per replica, so blocks multiply while block SIZES stay
    # constant.  This is the entity-growth axis (new entities bring new
    # blocking keys: zip codes, domains); a fixed blocking vocabulary
    # under k-fold entities would grow blocks k-fold and the in-block
    # levenshtein k^2 — that regime is q_fuzzy_match's documented
    # contract violation, not its scaling claim.
    n_part = pt.agg(F.max("p_partkey")).collect()[0][0] + 1
    p_parts = [
        pt.withColumn("p_partkey", F.col("p_partkey") + F.lit(k * n_part))
        .withColumn(
            "p_name",
            F.concat(F.col("p_name"), F.lit(str(k))) if k else F.col("p_name"),
        )
        for k in range(factor)
    ]
    sp = p_parts[0]
    for p in p_parts[1:]:
        sp = sp.unionByName(p)
    sp.write.mode("overwrite").parquet(os.path.join(out, "part.parquet"))
    # orders replicas: o_orderkey shifts by the SAME k*n_ord stride as
    # lineitem's l_orderkey, so the fact-fact join keys keep matching
    # and per-key join selectivity is scale-invariant.
    o_parts = [
        od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * n_ord))
        for k in range(factor)
    ]
    so = o_parts[0]
    for p in o_parts[1:]:
        so = so.unionByName(p)
    so.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    open(marker, "w").close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,2,4")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument(
        "--probes",
        default=None,
        help="comma-separated probe subset; with --append-section the "
        "result is APPENDED to SCALING.md as its own section instead of "
        "rewriting the main table (the x8 discrimination runs: re-probing "
        "everything at x8 would cost ~an hour for three rows of signal)",
    )
    ap.add_argument("--append-section", default=None, metavar="TITLE")
    args = ap.parse_args()
    if args.probes and not args.append_section:
        # r9 ADVICE: a subset run without --append-section fell through to
        # the full-rewrite path and overwrote SCALING.md with only the
        # subset rows, silently dropping every other operator's exponents.
        ap.error(
            "--probes requires --append-section: subset runs APPEND their "
            "own section; the full-table rewrite is reserved for complete "
            "PROBES runs"
        )
    factors = [int(x) for x in args.factors.split(",")]
    probes = args.probes.split(",") if args.probes else PROBES
    unknown = [p for p in probes if p not in PROBES]
    if unknown:
        ap.error(f"not in PROBES (no replication notes for them): {unknown}")

    from oem_gateway_spark import get_spark
    from oem_gateway_spark.operators.dedup import release_caches
    from oem_gateway_spark.suite import REGISTRY

    spark = get_spark(app_name="scale-probe", extra_conf={
        "spark.ui.showConsoleProgress": "false",
    })
    dirs = {}
    for f in factors:
        dirs[f] = _build_scaled(spark, args.sf, f) if f != 1 else None

    # other tables (events etc.) resolve from the base dir via symlinks
    for f, d in dirs.items():
        if d is None:
            continue
        for name in os.listdir(args.sf):
            dst = os.path.join(d, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join(args.sf, name), dst)

    timings: dict[str, dict[int, float]] = {p: {} for p in probes}
    for f in factors:
        sf_dir = args.sf if f == 1 else dirs[f]
        for _rep in range(2):  # best-of-2 (ambient load)
            for name in probes:
                t0 = time.perf_counter()
                df = REGISTRY[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                cur = timings[name].get(f)
                timings[name][f] = dt if cur is None else min(cur, dt)
                release_caches(df)
                # Drop every cached/checkpointed block before the next op:
                # at x16 the connected-components localCheckpoints otherwise
                # leave enough executor memory pressure to inflate whatever
                # runs after them by 2-3x (measured on s_ann_lsh_topk).
                spark.catalog.clearCache()
        print(f"x{f} done", {p: round(timings[p][f], 2) for p in probes},
              flush=True)

    import math

    base = factors[0]
    if args.append_section:
        # Subset mode: append a self-contained section (header + table +
        # results json) so the main x1/x2/x4 table keeps its provenance.
        sec = [
            "",
            f"## {args.append_section}",
            "",
            f"Factors {factors} over `{args.sf}` (same replica construction",
            "as above; best-of-2, noop sink).  The extra point discriminates",
            "output-growth / fixed-overhead explanations from real",
            "super-linearity: an operator whose x4 tail was inflated by",
            "constant overhead flattens at x8, a genuinely super-linear one",
            "keeps growing.",
            "",
            "| operator | " + " | ".join(f"x{f} (s)" for f in factors)
            + " | overall exp | tail exp |",
            "|---|" + "---|" * (len(factors) + 2),
        ]
        results = {}
        for name in probes:
            row = [f"| {name} "]
            t1 = timings[name][base]
            for f in factors:
                row.append(f"| {timings[name][f]:.2f} ")
            kmax, kprev = factors[-1], factors[-2]
            exp = math.log(timings[name][kmax] / t1) / math.log(kmax / base)
            tail = math.log(
                timings[name][kmax] / timings[name][kprev]
            ) / math.log(kmax / kprev)
            results[name] = {
                "overall": round(exp, 2), "tail": round(tail, 2),
            }
            row.append(f"| {exp:.2f} | {tail:.2f} |")
            sec.append("".join(row))
        sec += ["", "```json", json.dumps(results), "```", ""]
        with open("/root/repo/SCALING.md", "a") as fh:
            fh.write("\n".join(sec))
        print("SCALING.md section appended:", results)
        return
    lines = [
        "# SCALING.md — measured corpus-scaling exponents",
        "",
        f"Probe corpus: `{args.sf}` documents/embeddings replicated k× with",
        "deterministic near-dup perturbations (see `tools/scale_probe.py`).",
        "Best-of-2 wall time per operator (noop sink, local[32]).  The",
        "exponent is log(t_k/t_1)/log(k) for the largest k: ~1.0 = linear",
        "(the 100 TB contract), >1.5 would flag a quadratic candidate blowup.",
        "",
        "| operator | " + " | ".join(f"x{f} (s)" for f in factors)
        + " | overall exp | tail exp |",
        "|---|" + "---|" * (len(factors) + 2),
    ]
    results = {}
    for name in probes:
        row = [f"| {name} "]
        t1 = timings[name][base]
        for f in factors:
            row.append(f"| {timings[name][f]:.2f} ")
        kmax, kprev = factors[-1], factors[-2]
        exp = math.log(timings[name][kmax] / t1) / math.log(kmax / base)
        # tail exponent (two largest factors): least overhead-diluted —
        # the number to read for asymptotic behavior.
        tail = math.log(timings[name][kmax] / timings[name][kprev]) / math.log(
            kmax / kprev
        )
        results[name] = {"overall": round(exp, 2), "tail": round(tail, 2)}
        row.append(f"| {exp:.2f} | {tail:.2f} |")
        lines.append("".join(row))
    lines += [
        "",
        "Exponents below 1.0 mean fixed per-query overhead (session, plan,",
        "stage scheduling) still dominates at this corpus size — the",
        "operator's data-dependent cost is at most linear.  Tails in the",
        "1.0-1.2 band are linear within host noise (multi-tenant box,",
        "best-of-2; see bench.py note): ANN per-query candidate lists grow",
        "~linearly with bucket size, and connected components may take one",
        "extra label-propagation round as replica clusters deepen (the",
        "documented star-contraction variant bounds rounds if that ever",
        "trends up).",
        "",
        "d_semdedup_centroid (r5's one structurally quadratic row, fixed",
        "k=8) now implements the scale contract: k = ceil(corpus/256) grows",
        "with the corpus and clusters above 512 re-split on the argmax",
        "dimension (scaling-invariant, so colinear duplicates never separate",
        "— tests/test_round6_ops.py proves the split path in lockstep with",
        "the oracle).  Pair work is ~n*TARGET, linear; this row watches",
        "that the implementation keeps the promise.",
        "",
        "d_setsim_prefix_join's ~1.1 tail is an artifact of the probe's",
        "replica construction, not a candidate blowup: replicas are",
        "near-dup copies, so the TRUE matching-pair output grows ~k**2",
        "per duplicated group (k replicas of a doc all match each",
        "other).  An output-dominated join would show tail ~2; 1.1",
        "means candidate generation and verification stay near-linear",
        "while only the unavoidable output term grows.  The same",
        "reading applies to d_minhash_containment (its broadcast-pairs",
        "probe enumerates the same duplicated-group pairs) and to",
        "q_binned_theta_join: replicas duplicate the value distribution,",
        "so in-eps density and the TRUE pair count grow ~k**2 (x16 at",
        "x4) — a sub-1.0 measured tail therefore means the binned",
        "rewrite's candidate work tracks input + output, never the n*m",
        "cross product a nested-loop plan would pay.",
        "",
        "```json",
        json.dumps(results),
        "```",
        "",
    ]
    with open("/root/repo/SCALING.md", "w") as fh:
        fh.write("\n".join(lines))
    print("SCALING.md written:", results)


if __name__ == "__main__":
    main()
