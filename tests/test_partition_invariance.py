"""Partition-count invariance: a correct distributed plan returns the SAME
rows whatever ``spark.sql.shuffle.partitions`` is — the local stand-in for
"would survive a 1000-executor re-shard".  Hash-based operators (LSH
banding, dedup survivors, windowed packing, connected components) are the
ones that would silently break if any step depended on row co-location."""

from __future__ import annotations

import pytest

from oem_gateway_spark.operators.dedup import release_caches
from oem_gateway_spark.suite import REGISTRY

SF = "/root/testdata/sf0.001"

QUERIES = [
    "d_minhash_lsh_pairs",
    "d_exact_dedup_survivors",
    "d_shard_packing",
    "d_dup_clusters",
    "q_salted_agg",
    # round 4: salting, chunking, URL grouping, and the iterative k-means
    # (centroid averages must not depend on partial-aggregation layout —
    # the 6-dp rounding contract makes them layout-stable)
    "q_salted_join",
    "t_chunking",
    "d_url_canonical",
    "s_kmeans",
    # round 4b: the MG candidate sets of d_heavy_hitters differ per
    # partitioning — the exact recount must erase that; unigram scores sum
    # float terms in partition order; SCD2's explode rides a full-outer join
    "d_heavy_hitters",
    "t_unigram_logprob",
    "q_scd2_apply",
    # round 6: MERGE's change-feed aggregate must be layout-stable (it
    # sums INTEGER cents — the double-sum it replaced was not); the
    # prefix-filter join's candidate set varies with partitioning but
    # the verified output must not; Merkle bucket digests xor-combine
    # (order-free by construction); KMV k-min sketches are order
    # statistics (layout-free); shortest-path costs are integer mins
    "q_merge_upsert",
    "d_setsim_prefix_join",
    "q_merkle_reconcile",
    "q_kmv_intersect",
    "q_shortest_path_bounded",
    # round 6b: histogram-narrowing selection — per-bucket counts are
    # layout-free sums and the answer is always an actual data value,
    # so the interval descent cannot depend on partitioning
    "q_percentile_select",
    # bloom pruning has no false negatives and the aggregate sums
    # integer-cast quantities — results must be identical to the plain
    # join at any layout (the filter only changes I/O, never rows)
    "q_bloom_prune",
    # round 9: the pointer-doubling accumulator split (resolved rows
    # freeze per round) must not depend on which partition resolved a
    # node first — pure integer (root, depth) at any layout; the
    # recursive CTE's UnionLoop must likewise be layout-free
    "q_hierarchy_resolve",
    "q_recursive_cte",
    # round 10: the collated grouping key must hash CONSISTENTLY with
    # collated equality at any shuffle width (Catalyst's CollationKey
    # rewrite — if hashing ever used raw bytes, 'BRAND#13' and
    # 'brand#13' would land on different reducers and re-split the
    # group); the Arrow-batch stage's products are integer sums, but
    # its BATCH BOUNDARIES move with partitioning and must not show
    "q_collated_group",
    "u_map_in_arrow",
    # round 10b: the two format-boundary decoders — per-row XML parse
    # and the ORC reader stack — must yield identical aggregates at any
    # layout (the ORC export is fingerprint-cached, so the re-shard
    # exercises the READ side against a fixed file set)
    "q_xml_extract",
    "q_orc_roundtrip",
]


def _rows(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    rows = sorted(tuple(r) for r in df.collect())
    release_caches(df)
    return rows


@pytest.mark.parametrize("name", QUERIES)
def test_shuffle_partition_invariance(spark, name):
    # The registry wrapper re-asserts session.DEFAULT_CONF on every call
    # (driver contract), which would silently override a plain
    # spark.conf.set here and make both runs identical — patch the source
    # of truth so the wrapper itself applies the varied partition count.
    from oem_gateway_spark import session as S

    original = S.DEFAULT_CONF["spark.sql.shuffle.partitions"]
    try:
        S.DEFAULT_CONF["spark.sql.shuffle.partitions"] = "3"
        low = _rows(spark, name)
        S.DEFAULT_CONF["spark.sql.shuffle.partitions"] = "17"
        high = _rows(spark, name)
    finally:
        S.DEFAULT_CONF["spark.sql.shuffle.partitions"] = original
        # Re-assert ALL runtime conf, not just the varied key: queries
        # that mutate session conf as part of their contract (q_bloom_prune
        # lowers the bloom threshold and disables broadcast) rely on the
        # NEXT registry call to reset — which never comes when they are the
        # last case here.  Without this, later tests plan under the
        # mutated conf depending on collection order.
        S.ensure_runtime_conf(spark)
    assert low == high
