"""Round-8 regression tests: the r7 ADVICE findings.

- minhash_probe_pairs must fall back to a shuffle join (no broadcast)
  when the new side exceeds max_broadcast_rows, with identical results
  (ADVICE r7: the unconditional broadcast OOMs on a large is_new slice).
- exact_order_statistics must still return the correct answer when the
  final bounded collect would overflow — retry with finer histograms
  instead of raising (ADVICE r7: the hard cap turned a previously
  correct-if-slow case into a RuntimeError).
- the join-reorder witness must verify order on the optimized plan TREE,
  not substring positions (ADVICE r7: table names also appear in filter
  and file-listing annotations of the plan string).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted(
        (r["new_id"], r["store_id"], r["n_equal_minhash"]) for r in df.collect()
    )


def test_minhash_probe_pairs_shuffle_fallback_matches_broadcast(spark):
    """max_broadcast_rows=0 forces the shuffle fallback: results must be
    identical to the broadcast path and the executed plan must not
    broadcast the new side."""
    from oem_gateway_spark.operators.dedup import minhash_probe_pairs

    corpus = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(400)
    )
    is_new = F.col("doc_id") % 5 == 0
    bcast = minhash_probe_pairs(corpus, is_new)
    expected = _pairs(bcast)
    # With auto-broadcast disabled, only the HINT can force a broadcast:
    # the guarded fallback must plan a shuffle join, the default path a
    # broadcast.  (At test scale AQE would otherwise auto-broadcast the
    # tiny side either way, which is exactly the behavior we WANT to keep
    # — the guard only drops the hint, it does not forbid broadcasts.)
    auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe_auto = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        fallback = minhash_probe_pairs(corpus, is_new, max_broadcast_rows=0)
        assert _pairs(fallback) == expected
        plan = fallback._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        hinted = minhash_probe_pairs(corpus, is_new)
        hplan = hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in hplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto)
        if aqe_auto:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", aqe_auto)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_exact_order_statistics_retries_instead_of_raising(spark):
    """A final collect that would overflow the (tiny) cap must narrow
    further and still return the exact answer, not raise."""
    from oem_gateway_spark.operators.selection import exact_order_statistics

    df = spark.range(4000).select((F.col("id").cast("double")).alias("v"))
    # collect_cap=8 with max_iters=1: after one narrowing round every
    # interval still holds >> 8*4 distinct values, so the first final
    # collect overflows and the retry path must converge.
    got = exact_order_statistics(
        df, "v", [0.25, 0.5, 0.99], n_buckets=4, collect_cap=8, max_iters=1
    )
    assert [(q, k, v) for q, k, v in got] == [
        (0.25, 1000, 999.0),
        (0.5, 2000, 1999.0),
        (0.99, 3960, 3959.0),
    ]


def test_conf_witness_out_of_order_build_fails_loudly(spark):
    """Building q_bloom_prune and then building another registry query
    WITHOUT executing the witness frame must record a loud violation;
    the proper build->act->build sequence must not."""
    from oem_gateway_spark.suite import REGISTRY
    from oem_gateway_spark.suite.registry import CONF_WITNESS_VIOLATIONS

    base = list(CONF_WITNESS_VIOLATIONS)
    # Proper discipline: build -> act -> next build.
    REGISTRY["q_bloom_prune"].fn(spark, SF).collect()
    REGISTRY["q_semi_join"].fn(spark, SF)
    assert CONF_WITNESS_VIOLATIONS == base
    # Violation: build the witness, then build another query with no action.
    REGISTRY["q_bloom_prune"].fn(spark, SF)
    REGISTRY["q_semi_join"].fn(spark, SF)
    assert CONF_WITNESS_VIOLATIONS == base + ["q_bloom_prune"]
    CONF_WITNESS_VIOLATIONS[:] = base


def test_sql_udf_inlines_into_plan(spark):
    """u_sql_udf's SQL-language function must INLINE: no trace of the
    function name and no Python eval node in the optimized plan."""
    from oem_gateway_spark.suite import REGISTRY

    out = REGISTRY["u_sql_udf"].fn(spark, SF)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "charged_cents" not in opt.replace("AS charged_cents", "")
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys


def test_binned_theta_join_is_equi_not_nested_loop(spark):
    """The theta join must execute as a binned equi-join — never a
    nested-loop / cartesian plan."""
    from oem_gateway_spark.suite import REGISTRY

    out = REGISTRY["q_binned_theta_join"].fn(spark, SF)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in phys
    assert "CartesianProduct" not in phys


def test_dedup_rewrite_keeps_every_document(spark):
    """The reassembly's left join must preserve all doc_ids, including
    documents whose every segment was dropped as a duplicate."""
    from oem_gateway_spark.suite import REGISTRY

    out = REGISTRY["d_dedup_rewrite"].fn(spark, SF).toPandas()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) == n_docs
    assert set(out.columns) == {"doc_id", "n_segs", "n_kept", "rewrite_fp"}
    assert (out["n_kept"] <= out["n_segs"]).all()


def test_upsert_latest_rejects_late_arrivals(spark):
    """The out-of-order replay must make the LWW state REJECT at least
    one late arrival: accepted-write count strictly below the per-key
    row count (with a time-ordered replay the two are always equal)."""
    from pyspark.sql import functions as F

    from oem_gateway_spark.suite import REGISTRY

    out = REGISTRY["stream_upsert_latest"].fn(spark, SF).toPandas()
    rows_per_key = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("user_id") % 50 == 0)
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
    )
    merged = out.set_index("node").join(rows_per_key)
    assert (merged["n_updates"] <= merged["count"]).all()
    assert (merged["n_updates"] < merged["count"]).any(), (
        "no late arrival was rejected — the replay is not out-of-order"
    )


def test_cbo_join_reorder_tree_verification(spark):
    """The rewritten tree-walk verification must accept the genuinely
    reordered plan (and the innermost-join helper must see the filtered
    dim, not the fact, under the bottom-most join)."""
    from oem_gateway_spark.plans.explain import innermost_join_leaf_names
    from oem_gateway_spark.suite import REGISTRY

    out = REGISTRY["q_cbo_join_reorder"].fn(spark, SF)
    leaves = " | ".join(innermost_join_leaf_names(out))
    assert "cbo_customer" in leaves and "cbo_lineitem" not in leaves
    assert out.count() > 0


def test_framelog_reader_partitions_per_shard(spark):
    """The batch Python DataSource must expose one InputPartition per
    capture shard (reader parallelism = archive sharding), and the parse
    work must stay JVM-side (no Python eval node beyond the scan)."""
    from oem_gateway_spark.sources.framelog_source import FrameLogReader
    from oem_gateway_spark.suite import REGISTRY
    from oem_gateway_spark.suite.patterns_extra import _framelog_dir

    logdir = _framelog_dir(spark, SF)
    parts = FrameLogReader({"path": logdir}).partitions()
    assert len(parts) == 8
    out = REGISTRY["g_framelog_batch"].fn(spark, SF)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys


def test_framelog_reader_rejects_missing_path(spark):
    import pytest as _pytest

    from oem_gateway_spark.sources.framelog_source import FrameLogReader

    with _pytest.raises(ValueError):
        FrameLogReader({})
    with _pytest.raises(FileNotFoundError):
        FrameLogReader({"path": "/root/repo/.scratch/nonexistent-xyz"}).partitions()


def test_multi_format_union_reads_three_scan_types(spark):
    """The plan must contain three DIFFERENT scan operators — parquet,
    csv, json — not three reads of one format."""
    from oem_gateway_spark.suite import REGISTRY

    out = REGISTRY["q_multi_format_union"].fn(spark, SF)
    phys = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "scan parquet" in phys
    assert "scan csv" in phys
    assert "scan json" in phys


def test_hierarchy_resolve_depths_and_roots(spark):
    """Pointer doubling must resolve every node to a root 0..3 with the
    analytic 4-ary-forest depth: depth(k) = number of (k-4) DIV 4 steps
    to reach a key < 4."""
    from oem_gateway_spark.suite import REGISTRY

    out = REGISTRY["q_hierarchy_resolve"].fn(spark, SF).toPandas()
    assert (out["root"] < 4).all()

    def depth(k: int) -> int:
        d = 0
        while k >= 4:
            k = (k - 4) // 4
            d += 1
        return d

    got = dict(zip(out["node"], out["depth"]))
    assert all(got[k] == depth(k) for k in got)
