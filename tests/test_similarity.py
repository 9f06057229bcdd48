"""ANN recall properties: multi-probe IVF must strictly improve recall
over single-probe against the exact brute-force ranking (the recall/cost
knob: cost = |corpus| * nprobe / n_cells, recall -> exact as nprobe ->
n_cells)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"
K = 3


def _pair_set(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_nprobe_improves_recall(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    truth = _pair_set(S.brute_force_topk(emb, queries, k=K))
    got1 = _pair_set(S.ivf_ann_topk(emb, queries, k=K, nprobe=1))
    got2 = _pair_set(S.ivf_ann_topk(emb, queries, k=K, nprobe=2))
    r1 = len(truth & got1) / len(truth)
    r2 = len(truth & got2) / len(truth)
    assert r2 > r1, (r1, r2)


def test_ivf_full_probe_matches_brute_force(spark):
    """nprobe = n_cells degenerates to exact search: every cell is probed,
    so the top-k equals the brute-force ranking."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    truth = _pair_set(S.brute_force_topk(emb, queries, k=K))
    full = _pair_set(
        S.ivf_ann_topk(emb, queries, k=K, nprobe=S.N_CENTROIDS)
    )
    assert full == truth
