#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the flagship queries,
with the scale-relevant features annotated.  Run from the repo root:

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    ("q1_pricing_summary", "filter pushed to scan; single aggregation exchange"),
    ("q3_shipping_priority", "dim filter pushed; customer broadcast; TakeOrdered top-k"),
    ("q5_local_supplier_volume", "4+ broadcast joins; one fact-fact shuffle"),
    ("g_rfm2pi_decode", "parse chain: map-only until the fan-out repartition"),
    ("d_minhash_lsh_pairs", "persisted signature; explode banding; bucket self-join"),
    ("s_ann_lsh_topk", "LSH bucket join (broadcast queries); window top-k on ids only"),
    ("d_contamination", "eval-side broadcast; training grams stream map-side"),
    ("d_shard_packing", "within-source cumsum window; no SinglePartition exchange"),
    ("d_exact_dedup_increment", "batch-side window + left-anti store probe"),
    ("t_boilerplate_ngrams", "explode + partial-agg distinct; TakeOrdered top-20"),
    ("q6_forecast_revenue", "all predicates scan-pushed; zero-shuffle aggregate"),
    ("q19_disjunctive_revenue", "OR-of-ANDs: single-side residues pushed both scans"),
    ("t_chunking", "index-explode + slice: chunking without a shuffle"),
    ("d_url_canonical", "regex canon fused with scan; two-level distinct agg"),
    ("q_window_time_range", "time-RANGE frame: one exchange, no self-join"),
    ("q_salted_join", "(key, salt) join keys spread hot keys 16-way"),
    ("q10_returned_items", "fact filter pushed; dims broadcast; TakeOrdered top-20"),
    ("q18_large_orders", "one orderkey aggregation; survivors semi-join back"),
    ("q_funnel_conversion", "first-touch interval semi-join; single-row combine"),
    ("q7_nation_trade_volume", "nation-filtered dims broadcast; one fact-fact shuffle"),
    ("q17_small_quantity_revenue", "correlated AVG decorrelated: one grouped agg, joined back"),
    ("q21_sole_blame_suppliers", "EXISTS/NOT EXISTS as LeftSemi + LeftAnti on orderkey"),
    ("t_unigram_logprob", "tf persisted: corpus tokenizes once; vocab+total broadcast"),
    ("q_locf_fill", "ignore-nulls running window: one exchange, no join"),
    ("q_scd2_apply", "one full-outer join; history rows emit via one explode"),
    ("d_heavy_hitters", "MG candidates (MapInPandas, no shuffle) + broadcast-semi exact recount"),
    ("q_concurrent_intervals", "boundary deltas pre-aggregated before the ordered sweep"),
    ("pipeline_data_prep_v2", "scrub+gates+dedup+chunks: only exchange is the fp window"),
    ("q15_top_supplier", "revenue view once; scalar max broadcast back; integer-exact equality"),
    ("q2_min_cost_supplier", "correlated min decorrelated; region chain broadcast into fact scan"),
    ("q9_product_profit", "LIKE-filtered part broadcast prunes fact before the orderkey shuffle"),
    ("q11_important_parts", "global threshold from the group result — fact scanned once"),
    ("q16_part_supplier_counts", "NOT IN as broadcast anti join; two-phase distinct count"),
    ("q20_promotion_suppliers", "nested IN as semi joins; shared partkey partitioning"),
    ("t_tfidf_top_terms", "df from aggregated tf (no corpus re-scan); per-source top-5 window"),
    ("d_pagerank", "edges shuffle once, iterations reuse partitioning; 3-deep lineage"),
    ("s_quantize_int8", "scalar scale broadcast; integer-exact quantized ranking"),
    ("q_data_profile", "four columns profiled in ONE scan (multi-distinct Expand)"),
    ("q_resample_interpolate", "grid from exploded bounds; one exchange, two window directions"),
    ("q_mad_outliers", "median/MAD/count: three aggs share the user_id partitioning"),
    ("d_triangles", "degree-oriented wedge join; closing edge as LeftSemi"),
    ("q_cohort_retention", "(user, day) dedup before counting; cohort sizes broadcast"),
    ("d_cluster_survivors", "CC labels + lengths; per-cluster argmax window (text never joins)"),
    ("q_linreg_per_node", "OLS as one co-moment aggregate pass"),
    ("q_ewma_halflife", "EWMA as one weighted running window (exact 2^k scaling)"),
    ("q_reachability", "frontier BFS: shrinking anti-joined frontier, stationary edges"),
    ("q_fuzzy_match", "blocked levenshtein argmin; edit distance only inside blocks"),
    ("q_bucketed_join", "pre-bucketed SMJ: zero join exchange (write-time shuffle)"),
    ("q_skyline", "skyline: per-x agg, frontier pass on distinct x only, broadcast back"),
    ("q_hll_partial_merge", "mergeable HLL rollup: month sketches union to quarters"),
    ("d_semdedup_centroid", "broadcast centroids; pair join shuffles on cluster id"),
    ("d_group_split", "two hash-label variants from one scan; no join, no RNG"),
    ("q_skew_diagnostics", "three keys unpivot map-side; one scan, two-level agg"),
    ("q_merge_upsert", "MERGE kernel: map-side change-feed agg, one full-outer shuffle, clause routing as map work"),
    ("q_shortest_path_bounded", "Bellman-Ford: capped weighted edges persist on src; improved-frontier joins"),
    ("d_setsim_prefix_join", "prefix-filter exact join: broadcast freq, rare-shingle inverted index, array_intersect verify"),
    ("q_merkle_reconcile", "Merkle diff: map-side xor digests per bucket, broadcast bad-bucket prune, outer join only drifted rows"),
    ("q_kmv_intersect", "KMV sketch: one dedup shuffle + per-segment top-k window; pair merge on kilobyte arrays"),
    ("q_dpp_prune", "dynamic partition pruning: runtime dim values injected into the fact scan's PartitionFilters"),
    ("q_bloom_prune", "runtime bloom-filter join pruning: might_contain(xxhash64(key)) drops fact rows before the shuffle"),
    ("q_ivm_delta", "IVM merge: kilobyte MV scan + pushed-down delta slice; base never re-read"),
    ("q_cdc_changelog", "CDC derive: one full-outer diff; unchanged rows filtered before posexplode expansion"),
    ("q_bitmap_distinct", "exact distinct: map-side partial_bit_or word partials; popcount roll-up"),
    ("q_interval_union", "sweep-line: one key exchange serves both window passes + island aggs"),
    ("d_incremental_minhash", "crawl-vs-store LSH: batch bands broadcast; store streams map-side"),
    ("q_schema_evolution", "mergeSchema: ONE scan, union footer schema, NULL backfill"),
    ("q_time_weighted_avg", "LOCF integral: one key shuffle, lead window, integer products"),
    ("q_variant_shred", "VARIANT: parse_json once, typed variant_get, one agg exchange"),
    ("q_sequence_pattern", "MATCH_RECOGNIZE-lite: lag chain, one user exchange, zero joins"),
    ("q_null_safe_join", "null-safe <=> join: NULL is a real shuffle-key bucket"),
    ("q_binned_theta_join", "pure theta join as 3x-exploded bin equi-join; no nested loop"),
    ("d_dedup_rewrite", "explode -> global keep-first -> positional reassembly"),
    ("u_sql_udf", "SQL UDF inlined: pure codegen aggregate, no Python eval node"),
    ("q_multi_format_union", "one plan, three scan operators: parquet + explicit-schema csv + json"),
    ("g_framelog_batch", "batch Python DataSource: partition-per-shard scan, JVM-side parse"),
    ("stream_static_join", None),  # streaming: plan shown for the batch twin
    # round 10 language surfaces
    ("q_pipe_syntax", "pipe-parsed chain lowers to the ANSI scan-agg plan: pushdown + 1 exchange"),
    ("q_collated_group", "UTF8_LCASE grouping: collated key carries the exchange/agg"),
    ("q_xml_extract", "per-row XML serialize + from_xml: map-only until the group-by"),
    ("q_param_sql", "markers bound at parse: plan identical to the inlined spelling"),
    ("u_map_in_arrow", "MapInArrow stage between pruned scan and JVM aggregate"),
    # round 11 additions (both run their streaming phase when built; the
    # dumped plan is the read-back side the driver hashes)
    (
        "stream_state_reader_rocksdb",
        "statestore scan decodes RocksDB SST+changelog into typed key/value structs",
    ),
    (
        "g_serial_stream_replay",
        "sink read-back: parse+agg stay JVM-side over the exactly-once parquet",
    ),
    (
        "g_framelog_sink_stream",
        "manifest-scoped text scan: only committed files reach the rollup",
    ),
    (
        "g_framelog_pushdown",
        "Python-source pushFilters: shard predicate prunes partitions, no post-scan Filter",
    ),
    (
        "g_framelog_stream_partitioned",
        "sink read-back: per-shard planned ranges landed exactly-once, parse+agg JVM-side",
    ),
    (
        "stream_stream_full_outer_join",
        "sink read-back: both-sides watermark-close null rows landed in the append table",
    ),
    # round 13 additions (streaming phase runs when built; dumped plan =
    # the read-back/rollup side the driver hashes)
    (
        "stream_stream_full_outer_rocksdb",
        "same join, RocksDB+changelog state: read-back identical to the HDFS twin (provider invisible in the plan)",
    ),
    (
        "stream_join_then_window",
        "chained join->agg read-back: sentinel filter AFTER materialization (pushdown trap), batch distinct rollup",
    ),
    (
        "stream_window_then_window",
        "window_time cascade read-back: sentinel windows never closed, no post-filter work",
    ),
    (
        "u_udtf_table_partition",
        "TABLE-arg UDTF: one exchange on PARTITION BY key, in-partition sort, per-group Python eval/terminate",
    ),
    (
        "u_udtf_analyze_table",
        "analyze-over-table-schema UDTF: function-requested exchange (partitionBy) + column pruning (select) visible as the pre-UDTF Project",
    ),
    # round 13 second/third batch
    (
        "u_sql_table_function",
        "SQL TVF fully inlined: arity predicate AND transitive outer-key filter pushed into the lineitem scan; broadcast join, no Python",
    ),
    (
        "q_try_arithmetic",
        "ANSI try_* kernels: 7-of-11-column pruned scan, all four kernels fused in one Project, map-side partial agg",
    ),
    (
        "u_arrow_udf",
        "scalar arrow_udf: ArrowEvalPython between 2-column pruned scan and JVM partial agg",
    ),
    (
        "u_apply_in_arrow",
        "grouped-map applyInArrow: one hash exchange on the group key, FlatMapGroupsInArrow, JVM-side rounding after",
    ),
    (
        "s_jl_projection",
        "JL distortion audit: both sample filters scan-pushed, projection UDF on the tiny sample only, broadcast pair join",
    ),
    (
        "u_pandas_udf_window",
        "pandas UDAF in window position: ArrowWindowPython over sliding 10-row frames, row_number gate above",
    ),
    (
        "w_session_dynamic",
        "dynamic-gap session_window: per-event gap expression fused into the session merge exchange",
    ),
]


def main() -> None:
    from oem_gateway_spark import get_spark
    from oem_gateway_spark.plans import explain_str, num_exchanges, pushed_filters
    from oem_gateway_spark.suite import REGISTRY

    spark = get_spark(app_name="plan-dump", extra_conf={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"

    out = [
        "# PLANS — formatted physical plans of the flagship queries",
        "",
        "Generated by `tools/dump_plans.py` at sf0.001 (plan SHAPE is scale-",
        "invariant; AQE may further coalesce/convert at runtime).  The",
        "features asserted in `tests/test_plans.py` are visible here:",
        "`PushedFilters` on scans, `BroadcastHashJoin` for dims, `Exchange`",
        "count = shuffles paid, `TakeOrderedAndProject` for top-k.",
        "",
    ]
    from oem_gateway_spark.suite.registry import clear_conf_witness

    for name, note in QUERIES:
        if name == "stream_static_join":
            continue  # streaming execution; skip static dump
        df = REGISTRY[name].fn(spark, sf)
        # This tool builds plans without acting — acknowledge conf
        # witnesses (q_bloom_prune / q_cbo_join_reorder) so the loud
        # out-of-order guard doesn't fire on a plan dump.
        clear_conf_witness("plan dump builds without executing")
        text = explain_str(df)
        # keep the physical plan section only, trim codegen ids noise
        text = text.split("== Physical Plan ==")[-1]
        text = re.sub(r"#\d+L?", "", text)
        summary = (
            f"shuffle exchanges: {num_exchanges(df)}; "
            f"pushed filters: {pushed_filters(df) or 'none'}"
        )
        # Cap LINES, not the tail: one oversized expression (the unrolled
        # zip_with shingle Generate is several KB) must not push the plan's
        # final operators (TakeOrderedAndProject, AdaptiveSparkPlan) out of
        # the document — those are exactly what a reader checks.
        body = "\n".join(
            (ln[:500] + " …<expr trimmed>") if len(ln) > 500 else ln
            for ln in text.strip().splitlines()
        )[:8000]
        out += [
            f"## {name}",
            "",
            f"*{note}*  ",
            f"`{summary}`",
            "",
            "```",
            body,
            "```",
            "",
        ]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
