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

# First-50 driver window (see module docstring).  Order within: the 26 queries
# no CORRECTNESS_r{1,2} file ever contained, then s_ivf_ann_topk (green in r01
# only), then queries whose implementation changed this round, then gateway
# parity, then a representative relational/LLM slice.
_DRIVER_WINDOW = [
    # -- never driver-witnessed (streaming, UDF surface, extras, pipeline) --
    "pipeline_data_prep",
    "w_tumbling",
    "w_sliding",
    "w_session",
    "stream_tumbling",
    "stream_session",
    "stream_dedup",
    "stream_static_join",
    "stream_stream_join",
    "u_python_udf",
    "u_pandas_udf_scalar",
    "u_pandas_udf_grouped_agg",
    "u_apply_in_pandas",
    "u_map_in_pandas",
    "u_scalar_subquery",
    "u_exists_subquery",
    "u_approx_percentile",
    "u_cogroup",
    "u_python_udtf",
    "q_map_funcs",
    "q_array_predicates",
    "q_null_funcs",
    "q_setops_multiset",
    "q_window_distribution",
    "q_array_agg_ordered",
    "q_salted_agg",
    # -- driver-witnessed only in r01 --
    "s_ivf_ann_topk",
    # -- new or implementation-changed this round --
    "q_exact_percentiles",
    "q_lateral_topk",
    "s_ann_recall",
    "d_simhash_hamming_k",
    "s_ivf_nprobe",
    # d_simhash itself rotates out: its signature column feeds (and is thus
    # transitively checked by) d_simhash_pairs + d_simhash_hamming_k below.
    "d_simhash_pairs",
    "q_stratified_sample",
    "q_time_series_gap_fill",
    "t_quality_score",
    "d_contamination",
    "d_dup_clusters",
    "t_vocab_topk",
    "t_rare_terms",
    "s_knn_classify",
    "d_domain_cap",
    "d_shard_packing",
    # -- gateway parity (reference operators) --
    "g_parse_serial",
    "g_rfm2pi_decode",
    # g_reject_stats rotates out this round: impl unchanged since its r01+r02
    # green rows, and its classify path is exercised by g_parse_serial and
    # g_rfm2pi_dead_letter above.
    "g_rfm2pi_parity_reject",
    "g_rfm2pi_dead_letter",
    "g_bulk_encode",
    # -- representative slice: impl changed this round (md5-slice minhash,
    # window-shape survivors) so these must be re-witnessed.  The raw
    # d_minhash_signature rotates out: d_minhash_lsh_pairs consumes the same
    # signature columns end-to-end --
    "d_exact_dedup_survivors",
    "d_minhash_lsh_pairs",
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
