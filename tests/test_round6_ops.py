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
    # Split ids are k*(cid+1)+sub >= k; base ids stay in [0, k).  With
    # the sem_knobs corpus (n=1000, TARGET=500) k = 2.
    k = max(1, -(-1000 // M._SEM_TARGET))
    split_ids = [c for c in sdf["cluster"] if c >= k]
    # The oversized cluster re-split actually fired, into >1 sub-bucket
    # (otherwise this test silently stops covering the branch).
    assert len(split_ids) >= 2, f"re-split branch not exercised: {sorted(sdf['cluster'])}"
    # Split ids never collide with the unsplit cid range.
    unsplit = [c for c in sdf["cluster"] if c < k]
    assert len(unsplit) + len(split_ids) == len(sdf)
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


def test_merge_upsert_exercises_every_clause(spark):
    """The MERGE query is only a clause-priority witness if every WHEN
    branch fires at test scale: update, delete (absent from the output
    by definition — inferred from the row deficit), insert, and keep."""
    from oem_gateway_spark.suite import REGISTRY

    out = REGISTRY["q_merge_upsert"].fn(spark, SF_ORACLE).toPandas()
    actions = set(out["action"])
    assert {"update", "insert", "keep"} <= actions, actions
    n_customers = spark.read.parquet(f"{SF_ORACLE}/customer.parquet").count()
    n_inserts = int((out["action"] == "insert").sum())
    n_deleted = n_customers + n_inserts - len(out)
    assert n_deleted > 0, "delete clause never fired at this SF"
    # clause priority: every active (n_orders >= 8) delinquent customer
    # must have routed to UPDATE, never DELETE — verified implicitly by
    # the oracle hash, asserted here as the explicit MERGE contract
    assert (out[out["action"] == "update"]["acctbal"].notna()).all()


def test_setsim_prefix_join_finds_constructed_dups(spark):
    """The exact join must recover the constructed near-dup structure:
    every mod-0 (exact copy) pair at jaccard 1.0, no pair below the 0.7
    threshold, and both pair ids always refer to existing corpus docs."""
    from oem_gateway_spark.operators.dedup import release_caches
    from oem_gateway_spark.suite import REGISTRY
    from oem_gateway_spark.suite.llm import DOC_OFFSET

    df = REGISTRY["d_setsim_prefix_join"].fn(spark, SF_ORACLE)
    out = df.toPandas()
    release_caches(df)
    assert (out["jaccard"] >= 0.7).all()
    assert (out["id_a"] < out["id_b"]).all()
    pairs = set(zip(out["id_a"], out["id_b"]))
    n_docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    mod0 = [(d, d + DOC_OFFSET) for d in range(0, n_docs, 3)]
    missing = [p for p in mod0 if p not in pairs]
    assert not missing, f"exact-copy pairs missed: {missing[:5]}"
    exact = out.merge(
        __import__("pandas").DataFrame(mod0, columns=["id_a", "id_b"]),
        on=["id_a", "id_b"],
    )
    assert (exact["jaccard"] == 1.0).all()


def test_merkle_reconcile_statuses_match_injected_drift(spark):
    """Every injected drift class appears with exactly the cardinality
    the key-modulus construction implies — and nothing else leaks in."""
    from oem_gateway_spark.suite import REGISTRY

    out = REGISTRY["q_merkle_reconcile"].fn(spark, SF_ORACLE).toPandas()
    keys = [
        r[0]
        for r in spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .select("o_orderkey")
        .collect()
    ]
    exp_only_a = {k for k in keys if k % 101 == 0}
    exp_only_b = {k + 30000000 for k in keys if k % 103 == 0}
    exp_changed = {k for k in keys if k % 97 == 0 and k % 101 != 0}
    got = {s: set(g["o_orderkey"]) for s, g in out.groupby("status")}
    assert got.get("only_a", set()) == exp_only_a
    assert got.get("only_b", set()) == exp_only_b
    assert got.get("changed", set()) == exp_changed
    ch = out[out["status"] == "changed"]
    assert ((ch["price_b"] - ch["price_a"]).round(2) == 1.5).all()


def test_kmv_estimate_accuracy(spark):
    """The KMV estimate must be an ESTIMATE worth shipping: within 10%
    relative error of the exact intersection for every priority pair at
    test scale (k=128 over ~250-distinct segments), and exact columns
    must satisfy the set-algebra bounds est/exact <= min(n_a, n_b)."""
    from oem_gateway_spark.operators.dedup import release_caches
    from oem_gateway_spark.suite import REGISTRY

    df = REGISTRY["q_kmv_intersect"].fn(spark, SF_ORACLE)
    out = df.toPandas()
    release_caches(df)
    assert len(out) == 10  # C(5 priorities, 2)
    for _, r in out.iterrows():
        bound = min(r["n_a"], r["n_b"])
        assert 0 <= r["exact_inter"] <= bound
        assert 0 <= r["est_inter"] <= r["n_a"] + r["n_b"]
        if r["exact_inter"] >= 50:
            rel = abs(r["est_inter"] - r["exact_inter"]) / r["exact_inter"]
            assert rel <= 0.10, (dict(r), rel)


class TestExactSelection:
    """operators/selection.py: exact order statistics without a sort.

    The driver witness (q_percentile_select) runs at sf0.01 where the
    default collect_cap resolves p50/p90 after one narrowing round;
    these tests shrink the knobs so multi-round narrowing, the min==max
    early exit, and duplicate pile-ups all demonstrably execute.
    """

    def _brute(self, xs, q):
        import math

        k = max(1, math.ceil(q * len(xs)))
        return k, sorted(xs)[k - 1]

    def test_multi_round_narrowing_exact(self, spark):
        from oem_gateway_spark.operators.selection import exact_order_statistics

        # 10k distinct-ish floats; cap=50 forces several histogram rounds.
        xs = [((i * 2654435761) % 100003) / 7.0 for i in range(10000)]
        df = spark.createDataFrame([(v,) for v in xs], "x double")
        qs = [0.01, 0.5, 0.999]
        got = exact_order_statistics(df, "x", qs, n_buckets=8, collect_cap=50)
        for (q, k, v), want_q in zip(got, qs):
            bk, bv = self._brute(xs, want_q)
            assert (q, k) == (want_q, bk)
            assert v == bv, f"q={q}: got {v} want {bv}"

    def test_duplicate_pileup_resolves_via_min_eq_max(self, spark):
        from oem_gateway_spark.operators.selection import exact_order_statistics

        # 9000 copies of one value surrounding the median: the narrowing
        # loop can never split them; only the observed-min==max exit can
        # resolve, regardless of collect_cap.
        xs = [1.0] * 400 + [42.5] * 9000 + [99.0] * 600
        df = spark.createDataFrame([(v,) for v in xs], "x double")
        got = exact_order_statistics(df, "x", [0.5], n_buckets=4, collect_cap=10)
        assert got == [(0.5, 5000, 42.5)]

    def test_nulls_excluded_and_edge_quantiles(self, spark):
        from oem_gateway_spark.operators.selection import exact_order_statistics

        xs = [3.0, 1.0, None, 2.0, None, 5.0, 4.0]
        df = spark.createDataFrame([(v,) for v in xs], "x double")
        got = exact_order_statistics(df, "x", [0.0001, 1.0], collect_cap=2)
        assert got == [(0.0001, 1, 1.0), (1.0, 5, 5.0)]

    def test_empty_raises(self, spark):
        import pytest as _pytest

        from oem_gateway_spark.operators.selection import exact_order_statistics

        df = spark.createDataFrame([], "x double")
        with _pytest.raises(ValueError):
            exact_order_statistics(df, "x", [0.5])

    def test_invalid_quantiles_raise(self, spark):
        import pytest as _pytest

        from oem_gateway_spark.operators.selection import exact_order_statistics

        df = spark.createDataFrame([(1.0,)], "x double")
        for bad in ([1.5], [0.0], [-0.1], [0.5, 2.0]):
            with _pytest.raises(ValueError, match="quantiles"):
                exact_order_statistics(df, "x", bad)
