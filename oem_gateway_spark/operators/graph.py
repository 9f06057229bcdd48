"""Distributed connected components — duplicate-cluster labeling.

Near-dup pair lists (MinHash-LSH, SimHash, embedding near-dup) are edges;
the unit of deduplication is the connected component (A~B, B~C => one
cluster even when A,C never share a band).  This implements min-label
propagation on DataFrames: every node starts labeled with itself, and each
round adopts the minimum label in its closed neighborhood until a fixpoint.

Round shape (deliberately minimal — ONE Spark job per round):
- neighborhood min = edges ⋈ labels UNION labels, then one min-aggregate
  (the union carries each node's own label, so no second join is needed to
  re-attach unchanged nodes);
- duplicate or both-direction edges are harmless to a min, so the
  symmetrized edge list is NOT deduplicated (saves a full shuffle);
- convergence is a SCALAR: labels only ever decrease, so the label sum
  (exact decimal — no long overflow at any id range) is strictly monotone
  and the fixpoint is exactly "sum unchanged".  One aggregate action per
  round materializes the round's lazy localCheckpoint AND tests
  convergence; no data rows reach the driver.

Scale notes (100 TB):
- Each round shuffles the EDGE list, not the corpus — near-dup graphs are
  sparse (<< |docs|).
- Rounds needed = graph diameter; dup clusters are shallow (members share
  bands with a common medoid, diameter ~2-4).  For adversarial long-chain
  graphs switch to the large-star/small-star contraction of Kiveris et al.
  (CC in MapReduce), O(log n) rounds on the same DataFrame skeleton.
- ``localCheckpoint`` truncates per-round lineage so plans don't deepen
  (driver-side planning is the real O(rounds^2) trap); on a cluster use
  ``checkpoint`` to the durable checkpoint dir instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_out: str = "doc_id",
    label_out: str = "cluster_id",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id is the
    minimum node id reachable from the node (canonical representative).

    Raises ``RuntimeError`` if the fixpoint isn't reached in ``max_iter``
    rounds (diameter > max_iter — switch to star-contraction)."""
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .persist()
    )
    # Round 1 fused into initialization: min(least(s,d)) over a node's
    # edges IS its closed-neighborhood min when every label is still its
    # node id — one aggregate replaces the node-set distinct plus a full
    # propagation round.
    labels = (
        sym.groupBy("s")
        .agg(F.min(F.least("s", "d")).alias("lbl"))
        .select(F.col("s").alias("node"), "lbl")
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(
        F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    try:
        for _ in range(max_iter):
            nbr = sym.join(labels, sym["d"] == labels["node"]).select(
                F.col("s").alias("node"), "lbl"
            )
            labels = (
                nbr.union(labels)
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
                .localCheckpoint(eager=False)
            )
            lbl_sum = labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            if lbl_sum == prev_sum:
                return labels.select(
                    F.col("node").alias(node_out), F.col("lbl").alias(label_out)
                )
            prev_sum = lbl_sum
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    finally:
        sym.unpersist()
