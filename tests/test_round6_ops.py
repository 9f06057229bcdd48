"""Round-6 operator tests: the corpus-scaled/re-split SemDeDup contract.

sf0.001's corpus (1000 vectors) never exceeds the production cap at the
default TARGET=256 (max cluster 288 < CAP 512), so the driver witness
alone would leave the oversize re-split branch unexecuted.  These tests
shrink the knobs until the branch fires and prove Spark and the DuckDB
oracle stay in lockstep through it.
"""

from __future__ import annotations

import pytest

import oem_gateway_spark.suite.mlstats_extra as M
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare


@pytest.fixture
def sem_knobs(monkeypatch):
    """TARGET=500 at the sf0.001 corpus (n=1000) gives k=2 seed clusters
    sized (480, 520); the 520 one exceeds CAP=512 and re-splits into
    ceil(520/500)=2 argmax-dim sub-buckets — a real multi-bucket split."""
    monkeypatch.setattr(M, "_SEM_TARGET", 500)
    yield


def _run_both(spark, duck):
    from oem_gateway_spark.operators.dedup import release_caches

    res = M.d_semdedup_centroid(spark, SF_ORACLE)
    sdf = res.toPandas()
    release_caches(res)
    ddf = duck.sql(M._semdedup_oracle()).df()
    return sdf, ddf


def test_semdedup_resplit_lockstep(spark, duck, sem_knobs):
    sdf, ddf = _run_both(spark, duck)
    assert compare(sdf, ddf, "semdedup-resplit") == []
    split_ids = [c for c in sdf["cluster"] if c >= M._SEM_SPLIT_BASE]
    # The oversized cluster re-split actually fired, into >1 sub-bucket
    # (otherwise this test silently stops covering the branch).
    assert len(split_ids) >= 2, f"re-split branch not exercised: {sorted(sdf['cluster'])}"
    # Split ids never collide with the unsplit cid range.
    unsplit = [c for c in sdf["cluster"] if c < M._SEM_SPLIT_BASE]
    assert all(c < 1000 for c in unsplit)
    # Every constructed colinear copy is still dropped: the re-split keys
    # on the argmax dimension, invariant under the 0.5x scaling, so
    # bounded clusters cost zero recall on true duplicates.
    assert int(sdf["n_dropped"].sum()) == 500
    assert int(sdf["n_vectors"].sum()) == 1000


def test_semdedup_k_scales_with_corpus(spark):
    """k = ceil(corpus/TARGET): the within-cluster quadratic's base stays
    constant as the corpus grows — assert the arithmetic the 100 TB
    contract rests on (the scale probe measures the wall-clock half)."""
    for n, target, k in [(1000, 256, 4), (1_000_000, 256, 3907), (10, 256, 1)]:
        assert max(1, -(-n // target)) == k
