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
