"""Distributed connected components — duplicate-cluster labeling.

Near-dup pair lists (MinHash-LSH, SimHash, embedding near-dup) are edges;
the unit of deduplication is the connected component (A~B, B~C => one
cluster even when A,C never share a band).  This implements min-label
propagation on DataFrames: every node starts labeled with itself, and each
round adopts the minimum label in its closed neighborhood until a fixpoint.

Scale notes (100 TB):
- Each round is one shuffle pair (edge join on dst + min-agg on src) over
  the EDGE list, not the corpus — near-dup graphs are sparse (<< |docs|).
- Rounds needed = graph diameter; dup clusters are shallow (a cluster's
  members all share bands with a common medoid, diameter ~2-4), so the
  loop converges in a handful of rounds.  For adversarial long-chain
  graphs, switch to the large-star/small-star contraction of
  Kiveris et al. (CC in MapReduce), which converges in O(log n) rounds —
  same DataFrame skeleton, different neighbor rule.
- ``localCheckpoint`` truncates the per-round lineage so the plan doesn't
  deepen (driver-side planning is the real O(iterations^2) trap); on a
  cluster use ``checkpoint`` to the durable checkpoint dir instead.
- The driver-side convergence check aggregates ONE scalar per round
  (count of relabeled nodes), never collects data rows.
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
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, sym["d"] == labels["node"])
                .groupBy("s")
                .agg(F.min("lbl").alias("nb_lbl"))
            )
            updated = (
                labels.join(neighbor_min, labels["node"] == neighbor_min["s"], "left")
                .select(
                    "node",
                    F.col("lbl").alias("old_lbl"),
                    F.least("lbl", F.coalesce("nb_lbl", "lbl")).alias("lbl"),
                )
                .localCheckpoint()
            )
            n_changed = updated.filter(F.col("lbl") != F.col("old_lbl")).count()
            labels = updated.select("node", "lbl")
            if n_changed == 0:
                return labels.select(
                    F.col("node").alias(node_out), F.col("lbl").alias(label_out)
                )
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    finally:
        sym.unpersist()
