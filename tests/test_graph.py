"""Connected-components operator: hand-graph correctness, chain graphs
needing multiple propagation rounds, and the max_iter guard."""

from __future__ import annotations

import pytest


def _cc(spark, pairs, **kw):
    from oem_gateway_spark.operators.graph import connected_components

    edges = spark.createDataFrame(pairs, ["id_a", "id_b"])
    rows = connected_components(edges, **kw).collect()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_two_components_and_transitivity(spark):
    # 1-2, 2-3 chain plus the disjoint 10-11: A~B, B~C must collapse to one
    # cluster labeled by the min member even though 1 and 3 share no edge.
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # Path graph 0-1-...-9: worst-case diameter for min-label propagation;
    # the label 0 must walk the whole chain.
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_edge_direction_irrelevant(spark):
    got = _cc(spark, [(5, 2), (2, 9), (9, 5)])  # cycle, reversed edges
    assert got == {2: 2, 5: 2, 9: 2}


def test_max_iter_guard(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _cc(spark, [(i, i + 1) for i in range(9)], max_iter=2)


def test_duplicate_and_self_edges_harmless(spark):
    # The operator deliberately skips edge dedup (a min is multiplicity-
    # blind); repeated and self edges must not change the result.
    got = _cc(spark, [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def _union_find(pairs):
    """Reference: path-compressed union-find, min-id representative."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def test_random_graphs_match_union_find(spark):
    """Property check vs an independent union-find oracle over random
    graphs (hypothesis would respawn Spark jobs per example — a seeded
    batch keeps the suite fast while covering the same space)."""
    import random

    rng = random.Random(20260813)
    for trial in range(6):
        n_nodes = rng.randint(2, 40)
        n_edges = rng.randint(1, 60)
        pairs = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        got = _cc(spark, pairs)
        assert got == _union_find(pairs), (trial, pairs)
