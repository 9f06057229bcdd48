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

# First-50 driver window (see module docstring).  Round-4 order (VERDICT r3
# #5/#10): never-witnessed queries first, then the 8 queries the r3 NTZ shift
# broke (fixed this round in catalog.normalize_event_ts — must re-witness),
# then queries whose implementation/oracle changed this round, then the
# stale r2-only-witnessed rotation so every green row is <=2 rounds old.
_DRIVER_WINDOW = [
    # -- never driver-witnessed --
    "q_unpivot",                # missed every prior window (VERDICT r3 #5)
    "d_exact_dedup_increment",  # new: incremental dedup driver row (r3 #7)
    "stream_running_stats",     # new: stateful-family driver row (r3 #7)
    "t_repetition",             # new this round (text_extra.py)
    "t_boilerplate_ngrams",     # new this round
    "t_pii_scrub",              # new this round
    "t_gopher_quality",         # new this round
    "stream_counter_deltas",    # new: counter-to-rate driver row (r3 #7)
    "stream_sliding",           # new: completes the streaming window family
    "t_chunking",               # new: doc chunking with overlap
    "d_url_canonical",          # new: URL canonicalization dedup
    "q_salted_join",            # new: skew-safe join rewrite
    "q_window_time_range",      # new: time-based RANGE window frame
    "q_conditional_agg",        # new: count_if/bool/max_by aggregates
    "q6_forecast_revenue",      # new: pure pushdown filter-aggregate
    "q19_disjunctive_revenue",  # new: OR-of-ANDs partial pushdown
    "stream_incremental_rollup",  # new: continuous-aggregation driver row
    "q10_returned_items",       # new: top-k over fact-dim join
    "q14_promo_revenue",        # new: conditional-ratio aggregate
    "q18_large_orders",         # new: grouped-HAVING IN (agg + semi-join)
    "q22_idle_rich_customers",  # new: scalar subquery + anti-join combo
    "s_kmeans",                 # new: iterative Lloyd's with unrolled oracle
    "q_histogram",              # new: equal-width binning (profiling shape)
    "q_funnel_conversion",      # new: first-touch interval semi-join funnel
    "q_snapshot_diff",          # new: CDC full-outer snapshot diff
    "d_minhash_accuracy",       # new: sketch self-audit (est vs true jaccard)
    "d_chunk_dedup",            # new: span-level (chunk) exact dedup
    "d_weighted_sample",        # new: deterministic weighted sampling
    "q7_nation_trade_volume",   # new: two-alias dim join, disjunctive pair
    "q8_market_share",          # new: conditional-share ratio, 7-table join
    "q12_late_shipments",       # new: non-equi residual on equi join
    "q17_small_quantity_revenue",  # new: correlated-AVG decorrelation
    "q21_sole_blame_suppliers",    # new: EXISTS + NOT EXISTS double correlation
    "q_locf_fill",              # new: ignore-nulls forward fill (LOCF)
    "t_unigram_logprob",        # new: unigram-LM perplexity-proxy scoring
    "d_mix_temperature",        # new: count^alpha corpus mixture weights
    "stream_stream_left_join",  # new: outer-row watermark-flush semantics
    # (q_scd2_apply, d_heavy_hitters, stream_locf, q_concurrent_intervals,
    # pipeline_data_prep_v2, m_frame_sample, m_media_resize,
    # q4_order_priority_check, q13_customer_distribution, t_bpe_train,
    # and the late-r4 additions — the adapted partsupp family
    # q2_min_cost_supplier/q9_product_profit/q11_important_parts/
    # q15_top_supplier/q16_part_supplier_counts/q20_promotion_suppliers
    # (tpch_partsupp.py) and the analytics four t_tfidf_top_terms/
    # d_pagerank/s_quantize_int8/q_data_profile (analytics_extra.py),
    # q_resample_interpolate/q_mad_outliers (timeseries_extra.py),
    # d_triangles/q_cohort_retention (behavior_extra.py),
    # d_cluster_survivors/d_minhash_containment/q_linreg_per_node/
    # q_corr_matrix/t_langid_confusion (mlstats_extra.py),
    # q_ewma_halflife/d_lsh_recall_by_class/q_reachability/stream_ewma
    # (quality_extra.py), stream_late_data/m_batch_classify
    # (robust_extra.py), q_fuzzy_match/q_bucketed_join/t_length_profile
    # (cleaning_extra.py) —
    # added after the 50 slots filled — head the r5 never-witnessed queue)
    # -- red in r3 via the TIMESTAMP_NTZ shift; fixed at the catalog layer --
    "g_bulk_encode",
    "stream_tumbling",
    "stream_session",
    "stream_dedup",
    "stream_stream_join",
    "q_sessionize",
    "q_asof_join",
    "q_window_lag_lead",
    # -- implementation/oracle changed this round --
    "q_map_funcs",          # array output serialized (driver-canon crash, r3 #3)
    "q_array_agg_ordered",  # array output serialized (driver-canon crash, r3 #3)
    "q_approx_distinct",    # tolerance oracle replaces rows-only (r3 #6)
    "u_approx_percentile",  # tolerance oracle replaces rows-only (r3 #6)
    "w_sliding",            # oracle CAST fix (schema mismatch, r3 #4)
    # -- stale rotation: last witnessed r2, unchanged since.  The NINE slots
    # this section held early in r4 were displaced by this round's last nine
    # never-witnessed queries (never-witnessed outranks stale re-witness);
    # the whole r2-witnessed set rotates through r5/r6 per VERDICT r3 #10.
    # Deferred to r5 (all r2-green and either transitively checked by
    # r3/r4-green consumers or pure scalar layers with no moving parts):
    # q1/q3/q5_pricing-shipping-volume (timed green every bench run,
    # including this round's), q_json_funcs, q_pivot_conditional, q_rollup
    # (Expand machinery shared with in-window q_cube twin reasoning above),
    # q_window_topk_per_group (rank family), s_embedding_neardup (LSH bucket
    # path inside r3-green s_ann_recall), t_text_stats (scalar text layer
    # under in-window t_gopher_quality/t_unigram_logprob),
    # d_minhash_signature, d_simhash (their *_pairs queries),
    # q_dedup_keep_first (d_exact_dedup_survivors shares the keep-first
    # path), q_setops (q_setops_multiset), t_fingerprint (fingerprint path
    # is d_exact_dedup_*'s), q_math_funcs, q_string_funcs, q_date_funcs,
    # q_stats_agg (scalar layers over part/orders/lineitem, unchanged),
    # q_cross_join_pairs (theta-join composite; q_range_join in-window
    # exercises the same conditional-join machinery), and — displaced by
    # this round's 8 new never-witnessed queries — q_array_funcs
    # (array HOFs exercised by r3-green q_array_predicates + similarity
    # ops), q_cube/q_grouping_sets (share q_rollup's Expand machinery,
    # q_rollup stays in-window), q_window_rank_ntile (rank family covered
    # by r3-green q_window_distribution), g_fanout_union/g_reject_stats
    # (gateway family re-witnessed r3 via g_parse_serial/g_rfm2pi_*),
    # s_cosine_topk (exact top-k path embedded in r3-green s_ann_recall),
    # m_multimodal_features (unchanged since its r2 green row),
    # q_anti_join/q_semi_join (the in-window q22/q18 exercise the same
    # left-anti/left-semi machinery), q_global_topk (q10's TakeOrdered
    # is the same physical top-k), q_distinct_agg (d_url_canonical's
    # two-level distinct rewrite in-window), t_langid (same words/
    # stopword layer as in-window t_text_stats), q_range_join
    # (q_funnel_conversion's interval semi-join is the same conditional
    # join machinery), q_window_running_sum (q_window_time_range's
    # frames are the same windowed-aggregate machinery),
    # q_outer_join_coalesce (q_snapshot_diff's full-outer + coalesce
    # in-window is the same machinery), d_ngram_jaccard
    # (d_minhash_accuracy's true-jaccard side computes the identical
    # shingle-set intersection/union in-window), d_exact_dedup_groups
    # (d_chunk_dedup + r3-green d_exact_dedup_survivors cover the
    # fingerprint keep-first machinery), s_ann_lsh_topk (r3-green
    # s_ann_recall executes the LSH ANN path inside its audit).
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
