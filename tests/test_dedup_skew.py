"""Boilerplate-skew valve: mega LSH buckets must contribute linear star
candidates, not quadratic all-pairs — and downstream connected components
must still recover the full duplicate cluster through the hub."""

from __future__ import annotations

from oem_gateway_spark.operators.dedup import minhash_lsh_pairs, release_caches
from oem_gateway_spark.operators.graph import connected_components

BOILER = "common boilerplate banner text that repeats across every document"


def _corpus(spark, n_boiler=200, n_unique=20):
    rows = [(i, BOILER) for i in range(n_boiler)]
    rows += [
        (
            1000 + i,
            f"unique document {i} carrying distinct content words "
            f"alpha{i} beta{i * 7} gamma{i * 13} delta{i * 29} epsilon{i}",
        )
        for i in range(n_unique)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_mega_bucket_cap_linear_candidates(spark):
    df = _corpus(spark)
    exact = minhash_lsh_pairs(df)
    capped = minhash_lsh_pairs(df, max_bucket_size=50)
    try:
        n_exact = exact.count()
        got = capped.collect()
    finally:
        release_caches(exact)
        release_caches(capped)
    # exact: all-pairs inside the boilerplate bucket — quadratic
    assert n_exact >= 200 * 199 // 2
    # capped: one star edge per non-hub member, hub = min doc_id = 0
    assert len(got) == 199
    assert {r["id_a"] for r in got} == {0}
    assert {r["id_b"] for r in got} == set(range(1, 200))
    # identical docs: every star pair passes full verification
    assert all(r["n_equal_minhash"] == 8 for r in got)


def test_capped_pairs_still_cluster_whole(spark):
    """The edges a star drops (member-member within the mega bucket) are
    exactly the ones connected components re-derives through the hub."""
    df = _corpus(spark, n_boiler=60)
    capped = minhash_lsh_pairs(df, max_bucket_size=10)
    try:
        clusters = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(capped).collect()
        }
    finally:
        release_caches(capped)
    assert clusters == {i: 0 for i in range(60)}
