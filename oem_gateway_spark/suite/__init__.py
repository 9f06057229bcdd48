"""Query suite: every operator from SURVEY.md §2 (and the §2.6 engine
surface) as a named (spark_query, duckdb_oracle) pair.

``__spark_entry__.py`` exposes this registry to the driver; tests replay the
same compare locally at sf0.001.

Registration ORDER matters: the driver's CORRECTNESS run checks the first 50
registry entries only.  ``_DRIVER_WINDOW`` below pins that window explicitly —
never-driver-witnessed and recently-changed queries first, then the flagship
gateway family, then representative relational/LLM queries.  Everything not
named rotates out of the window but stays verified by the local oracle replay
(``tests/test_suite_oracle.py`` covers the full registry every run).
"""

from oem_gateway_spark.suite.registry import REGISTRY, QuerySpec, query  # noqa: F401

# Import suite modules for their registration side effects.
from oem_gateway_spark.suite import gateway  # noqa: F401,E402
from oem_gateway_spark.suite import relational  # noqa: F401,E402
from oem_gateway_spark.suite import llm  # noqa: F401,E402
from oem_gateway_spark.suite import streaming_batch  # noqa: F401,E402
from oem_gateway_spark.suite import udf_surface  # noqa: F401,E402
from oem_gateway_spark.suite import scalar_extra  # noqa: F401,E402
from oem_gateway_spark.suite import relational_extra  # noqa: F401,E402
from oem_gateway_spark.suite import udtf_cogroup  # noqa: F401,E402
from oem_gateway_spark.suite import pipeline_extra  # noqa: F401,E402
from oem_gateway_spark.suite import text_extra  # noqa: F401,E402
from oem_gateway_spark.suite import tpch_extra  # noqa: F401,E402
from oem_gateway_spark.suite import tpch_partsupp  # noqa: F401,E402
from oem_gateway_spark.suite import analytics_extra  # noqa: F401,E402
from oem_gateway_spark.suite import timeseries_extra  # noqa: F401,E402
from oem_gateway_spark.suite import behavior_extra  # noqa: F401,E402
from oem_gateway_spark.suite import mlstats_extra  # noqa: F401,E402
from oem_gateway_spark.suite import quality_extra  # noqa: F401,E402
from oem_gateway_spark.suite import robust_extra  # noqa: F401,E402
from oem_gateway_spark.suite import cleaning_extra  # noqa: F401,E402

# First-50 driver window (see module docstring).  Round-5 order (VERDICT r4
# #1/#3): the 38 queries that have NEVER had a driver CORRECTNESS row
# (the late-r4 additions), ordered graph-family-first because their
# edge builds changed this round (cooc.py fanout cap) and must be
# re-proven under the new cap; then this round's three NEW queries
# (q_skyline / q_hll_partial_merge / d_semdedup_centroid — new queries
# outrank stale re-witness); then 9 rows from the r2-only-witnessed
# stale set, led by d_ngram_jaccard whose implementation was rewritten
# in r4 (interpreted-HOF fix) after its last driver row.  The remaining
# 29 r2-stale rows plus the oldest r3 rows are the r6 queue (listed at
# the end of this comment block's tail note).
_DRIVER_WINDOW = [
    "q_reachability",  # edge build re-capped this round (cooc.py)
    "d_pagerank",  # edge build re-capped this round (cooc.py)
    "d_triangles",  # cooc build re-capped this round (cooc.py)
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_parts",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q20_promotion_suppliers",
    "q4_order_priority_check",
    "q13_customer_distribution",
    "t_tfidf_top_terms",
    "s_quantize_int8",
    "q_data_profile",
    "q_resample_interpolate",
    "q_mad_outliers",
    "q_cohort_retention",
    "d_cluster_survivors",
    "d_minhash_containment",
    "q_linreg_per_node",
    "q_corr_matrix",
    "t_langid_confusion",
    "q_ewma_halflife",  # overflow guard added this round
    "d_lsh_recall_by_class",
    "stream_ewma",
    "stream_late_data",
    "m_batch_classify",
    "q_fuzzy_match",
    "q_bucketed_join",
    "t_length_profile",
    "m_frame_sample",
    "m_media_resize",
    "stream_locf",
    "q_scd2_apply",
    "q_concurrent_intervals",
    "d_heavy_hitters",
    "pipeline_data_prep_v2",
    "t_bpe_train",
    # new this round (never witnessed by construction)
    "q_skyline",  # distributed Pareto frontier (aggregate-then-sort-filter)
    "q_hll_partial_merge",  # mergeable-sketch rollup (DataSketches pattern)
    "d_semdedup_centroid",  # SemDeDup: centroid-partitioned embedding dedup
    # r2-stale re-witness (9 of 38; rest queued for r6)
    "d_ngram_jaccard",  # impl rewritten r4 (HOF fix) AFTER its last driver row
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_json_funcs",
    "q_rollup",
    "m_multimodal_features",
    "g_fanout_union",
    "g_reject_stats",
    # r6 queue — the 29 r2-stale rows not re-witnessed this round
    # (d_exact_dedup_groups, d_minhash_signature, d_simhash, q_anti_join,
    # q_array_funcs, q_cross_join_pairs, q_cube, q_date_funcs,
    # q_dedup_keep_first, q_distinct_agg, q_global_topk, q_grouping_sets,
    # q_math_funcs, q_outer_join_coalesce, q_pivot_conditional,
    # q_range_join, q_semi_join, q_setops, q_stats_agg, q_string_funcs,
    # q_window_rank_ntile, q_window_running_sum, q_window_topk_per_group,
    # s_ann_lsh_topk, s_cosine_topk, s_embedding_neardup, t_fingerprint,
    # t_langid, t_text_stats),
    # then the oldest r3-witnessed rows; d_group_split and
    # q_skew_diagnostics (added after the 50 slots filled) HEAD the r6
    # never-witnessed queue.  At 50 slots/round and 172 queries the
    # steady-state witness age is ceil(172/50) ~ 4 rounds;
    # never-witnessed and impl-changed queries always pre-empt.
]


def _apply_driver_window() -> None:
    """Reorder REGISTRY in place so _DRIVER_WINDOW entries come first.

    In-place (clear + re-insert) so every module holding a reference to the
    REGISTRY dict sees the new order.  Names in the window that are not (yet)
    registered are skipped — the list may name queries added later in a round.
    """
    current = dict(REGISTRY)
    REGISTRY.clear()
    for name in _DRIVER_WINDOW:
        if name in current:
            REGISTRY[name] = current.pop(name)
    REGISTRY.update(current)


_apply_driver_window()
