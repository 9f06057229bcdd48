"""Property tests for the round-4 operator additions — each pins the
CLAIM the operator's docstring makes, not just oracle agreement:

- EWMA bit-exactness: the alpha=0.5 scaled-window form must produce
  IDENTICAL doubles under different shuffle partitioning (the
  power-of-two-scaling proof, tested rather than asserted).
- Triangle backbone degeneracy: the top-K sparsification must bound
  every node's degree, or the wedge join can go quadratic at scale.
- PageRank mass conservation: with a symmetric (dangling-free) graph,
  total rank mass must stay 1 — the invariant the update rule relies
  on.
- Containment subset detection: the corpus's half-truncation twins
  must score containment ~1.0 where plain Jaccard scores ~0.5 — the
  reason the operator exists.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ewma_bit_identical_across_partitioning(spark):
    from oem_gateway_spark.suite.quality_extra import q_ewma_halflife

    a = {
        (r["node"], r["event_id"]): r["ewma"]
        for r in q_ewma_halflife(spark, SF).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = {
            (r["node"], r["event_id"]): r["ewma"]
            for r in q_ewma_halflife(spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a.keys() == b.keys()
    for k in a:
        # Bit-for-bit: not approx — the docstring's exactness claim.
        assert a[k] == b[k], f"{k}: {a[k]!r} != {b[k]!r}"


def test_ewma_overflow_guard_fires(spark):
    """Past t ~ 1020 the 2^t scaling overflows double; the guarded term
    must FAIL LOUDLY at t >= 1000 instead of silently yielding inf
    (ADVICE r4).  Below the cliff the guard is inert."""
    from pyspark.errors import PySparkException

    from oem_gateway_spark.suite.quality_extra import ewma_scaled_term

    long_series = spark.range(1, 1101).select(
        F.col("id").cast("int").alias("t"), F.lit(1.0).alias("value")
    )
    with pytest.raises(PySparkException, match="stream_ewma"):
        long_series.select(ewma_scaled_term().alias("term")).agg(
            F.sum("term")
        ).collect()

    short_series = spark.range(1, 900).select(
        F.col("id").cast("int").alias("t"), F.lit(1.0).alias("value")
    )
    total = short_series.select(ewma_scaled_term().alias("term")).agg(
        F.sum("term").alias("s")
    ).collect()[0]["s"]
    import math

    assert math.isfinite(total)


def test_triangle_backbone_degree_bounded(spark):
    """Every node's degree in the sparsified undirected backbone is at
    most 2*TOP_K (its own top-K picks plus at most K reverse picks)."""
    from oem_gateway_spark.suite.behavior_extra import _TRI_TOP_K
    from pyspark.sql.window import Window

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    cooc = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("cu"), F.col("b.l_suppkey").alias("cv")
        )
        .agg(F.count("*").alias("n_ord"))
    )
    direct = cooc.select(
        F.col("cu").alias("na"), F.col("cv").alias("nb"), "n_ord"
    ).unionAll(
        cooc.select(F.col("cv").alias("na"), F.col("cu").alias("nb"), "n_ord")
    )
    w = Window.partitionBy("na").orderBy(F.desc("n_ord"), F.asc("nb"))
    und = (
        direct.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TRI_TOP_K)
        .select(F.least("na", "nb").alias("u"), F.greatest("na", "nb").alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    max_deg = deg.agg(F.max("d")).collect()[0][0]
    assert max_deg <= 2 * _TRI_TOP_K


def test_cooc_membership_fanout_capped(spark, tmp_path):
    """The co-occurrence self-join input must bound per-order fanout
    (VERDICT r4 #2): a hub order with 200 suppliers contributes only
    its COOC_FANOUT_CAP smallest keys, so the pair blowup is CAP^2,
    not |group|^2.  Normal orders pass through untouched."""
    from oem_gateway_spark.suite.cooc import COOC_FANOUT_CAP, capped_order_members

    rows = [(1, s) for s in range(1, 201)] + [(2, 7), (2, 3), (2, 7)]
    spark.createDataFrame(rows, "l_orderkey INT, l_suppkey INT").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = capped_order_members(spark, str(tmp_path)).collect()
    hub = sorted(r["l_suppkey"] for r in got if r["l_orderkey"] == 1)
    assert len(hub) == COOC_FANOUT_CAP
    assert hub == list(range(1, COOC_FANOUT_CAP + 1))  # smallest, deterministic
    normal = sorted(r["l_suppkey"] for r in got if r["l_orderkey"] == 2)
    assert normal == [3, 7]  # deduped, uncapped


def test_pagerank_mass_conserved(spark):
    from oem_gateway_spark.operators.dedup import release_caches
    from oem_gateway_spark.suite.analytics_extra import d_pagerank

    out = d_pagerank(spark, SF)
    rows = out.collect()
    release_caches(out)
    n = len(rows)
    # rank_scaled = rank * N, so the scaled ranks must sum to ~N.
    total = sum(r["rank_scaled"] for r in rows)
    assert total == pytest.approx(n, rel=1e-6)


def test_containment_catches_truncation_twins(spark):
    """For every truncation twin the LSH stack DID catch, containment
    must read >= 0.9 (the truncated copy is a subset of its original)
    while its Jaccard estimate reads well below 1 — the operator's
    reason to exist."""
    from oem_gateway_spark.suite.llm import DOC_OFFSET
    from oem_gateway_spark.suite.mlstats_extra import d_minhash_containment

    rows = d_minhash_containment(spark, SF).collect()
    trunc = [
        r
        for r in rows
        if r["id_b"] - DOC_OFFSET == r["id_a"] and r["id_a"] % 3 == 2
    ]
    if not trunc:
        pytest.skip("LSH caught no truncation twins at this SF")
    for r in trunc:
        assert r["is_subset_copy"], r
        assert r["containment"] >= 0.9, r
