"""Physical-plan assertions (the 100 TB contract): pushdown reaches the
parquet scan, dims broadcast, the parse chain adds no shuffle beyond its
declared ones, top-k avoids global sorts."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.plans import (
    explain_str,
    has_broadcast_join,
    num_exchanges,
    pushed_filters,
)
from oem_gateway_spark.suite import REGISTRY

SF = "/root/testdata/sf0.001"


def test_q1_filter_pushed_to_scan(spark):
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed
    # scan-agg query: exactly one shuffle (the final group-by exchange)
    assert num_exchanges(df) == 1, explain_str(df)


def test_q3_broadcasts_dimension(spark):
    df = REGISTRY["q3_shipping_priority"].fn(spark, SF)
    assert has_broadcast_join(df)
    pushed = pushed_filters(df)
    assert any("c_mktsegment" in p for p in pushed), pushed


def test_q5_all_dims_broadcast_single_fact_shuffle(spark):
    df = REGISTRY["q5_local_supplier_volume"].fn(spark, SF)
    text = explain_str(df)
    assert text.count("BroadcastHashJoin") >= 4, text
    # only lineitem x orders shuffles + the final aggregation exchange
    assert num_exchanges(df) <= 3, text


def test_column_pruning_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem")
    df = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10)
    text = explain_str(df)
    assert "ReadSchema" in text
    # only the two referenced columns are read
    read_schema = text.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_global_topk_avoids_full_sort(spark):
    df = REGISTRY["q_global_topk"].fn(spark, SF)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_parse_chain_shuffle_free(spark):
    """P1-P6 must be pure map work: zero exchanges from text to frames."""
    from oem_gateway_spark.functions import frames as FR

    lines = spark.createDataFrame([("10 1 2",)], "line string")
    df = FR.parse_rfm2pi_frames(lines)
    assert num_exchanges(df) == 0, explain_str(df)


def test_semi_join_planned(spark):
    df = REGISTRY["q_semi_join"].fn(spark, SF)
    assert "LeftSemi" in explain_str(df)


def test_anti_join_planned(spark):
    df = REGISTRY["q_anti_join"].fn(spark, SF)
    assert "LeftAnti" in explain_str(df)


def test_bucketed_join_avoids_shuffle(spark):
    """Bucketing (the 100 TB co-located join story): two tables bucketed
    on the join key join WITHOUT any shuffle exchange."""
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
    )
    try:
        a = spark.table("li_bucketed")
        b = spark.table("ord_bucketed")
        # disable broadcast so the join must pick a shuffle-or-bucketed plan
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.l_orderkey == b.o_orderkey)
            assert num_exchanges(joined) == 0, explain_str(joined)
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_asof_join_linear_plan(spark):
    """The as-of operator must never materialize the per-user
    (purchase x earlier-click) pair set (r1's quadratic hot-user plan):
    no join node at all — one user_id shuffle feeding a carry-forward
    window over the union-tagged stream."""
    df = REGISTRY["q_asof_join"].fn(spark, SF)
    text = explain_str(df)
    assert "Join" not in text, text
    assert "Window" in text, text
    assert num_exchanges(df) == 1, text


def test_fan_out_noop_on_parallel_input(spark, tmp_path):
    """_fan_out must not add a shuffle when the source already delivers
    enough splits (the real-scale case: thousands of parquet splits) —
    decided from file metadata alone, no RDD materialization."""
    from oem_gateway_spark.suite import gateway as GW

    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000)
    # single small file -> est_splits < target -> repartition to target
    spark.range(100).coalesce(1).write.parquet(
        str(tmp_path / "narrow" / "lineitem.parquet")
    )
    out = GW._fan_out(df, str(tmp_path / "narrow"))
    assert out is not df
    assert out.rdd.getNumPartitions() == par
    # one file per core -> est_splits >= target -> strict no-op
    spark.range(10 * par).repartition(par).write.parquet(
        str(tmp_path / "wide" / "lineitem.parquet")
    )
    assert GW._fan_out(df, str(tmp_path / "wide")) is df


def test_simhash_pairs_banded_plan(spark):
    """SimHash pairs must generate candidates via the banded (band, val)
    join — never an equal-full-signature self-join — and the signature
    must come from flat-column codegen sums, not interpreted array
    aggregate folds (the 64x re-walk anti-pattern)."""
    df = REGISTRY["d_simhash_pairs"].fn(spark, SF)
    try:
        text = explain_str(df)
        # banded LSH: join keys are (band, val), not the full signature
        assert "band" in text and "val" in text, text
        # majority vote runs as HashAggregate sums, not array HOF folds
        assert "aggregate(lambdafunction" not in text.lower(), text
        assert "HashAggregate" in text, text
    finally:
        from oem_gateway_spark.operators.dedup import release_caches

        release_caches(df)


def test_exact_dedup_survivors_single_subtree(spark):
    """Survivor selection must be the window shape: a groupBy+semi-join
    twin plans the scan+fingerprint subtree twice (2x the normalize/md5
    work at any scale).  No Join node; exactly one exchange (the
    content-hash shuffle)."""
    df = REGISTRY["d_exact_dedup_survivors"].fn(spark, SF)
    text = explain_str(df)
    assert "Join" not in text, text
    assert "Window" in text, text


def test_domain_cap_windowed_no_join(spark):
    """Per-source quota: one window over the source partition — no join,
    and only the explicit fan-out + the window's source exchange."""
    df = REGISTRY["d_domain_cap"].fn(spark, SF)
    text = explain_str(df)
    assert "Join" not in text, text
    assert num_exchanges(df) == 2, text


def test_shard_packing_no_global_sort(spark):
    """Token packing must cumsum WITHIN source: a global-order running sum
    would plan Exchange SinglePartition (one sequential task at any scale)."""
    text = explain_str(REGISTRY["d_shard_packing"].fn(spark, SF))
    assert "SinglePartition" not in text, text
    assert "Join" not in text, text


def test_vocab_topk_take_ordered(spark):
    """Global top-20 tokens: partial-aggregated counts feed
    TakeOrderedAndProject — never a full global Sort exchange."""
    df = REGISTRY["t_vocab_topk"].fn(spark, SF)
    text = explain_str(df)
    assert "TakeOrderedAndProject" in text, text
    assert "SinglePartition" not in text, text
    assert num_exchanges(df) == 2, text


def test_contamination_broadcasts_eval_side(spark):
    """The hit join must broadcast (eval side small by contract) so the
    training corpus streams map-side."""
    assert has_broadcast_join(REGISTRY["d_contamination"].fn(spark, SF))


def test_knn_classify_single_exchange(spark):
    """kNN vote composes on the broadcast top-k: the only exchange is the
    per-query window/vote aggregation."""
    df = REGISTRY["s_knn_classify"].fn(spark, SF)
    assert has_broadcast_join(df), explain_str(df)
    assert num_exchanges(df) == 1, explain_str(df)


def test_repetition_zero_shuffle_beyond_spread(spark):
    """t_repetition's mode-bigram fold is per-row work: the ONLY exchange
    in the plan is the documented single-split spread repartition (absent
    at scale where file splits supply parallelism)."""
    df = REGISTRY["t_repetition"].fn(spark, SF)
    text = explain_str(df)
    assert num_exchanges(df) == 1, text  # the spread only
    assert "RoundRobinPartitioning" in text, text  # ...and it IS the spread
    assert "HashAggregate" not in text, text  # no agg shuffle anywhere


def test_boilerplate_single_agg_exchange_takeordered(spark):
    """t_boilerplate_ngrams: per-doc array_distinct keeps the (doc_id, gram)
    DISTINCT out of the plan — one hash-agg exchange plus the spread, and
    the top-20 is a TakeOrdered, not a global sort."""
    df = REGISTRY["t_boilerplate_ngrams"].fn(spark, SF)
    text = explain_str(df)
    assert num_exchanges(df) == 2, text  # spread + gram-count agg
    assert "TakeOrderedAndProject" in text, text


def test_pii_scrub_map_only(spark):
    """t_pii_scrub is a pure map operator (regex count + redact): nothing
    but the spread exchange in the plan."""
    df = REGISTRY["t_pii_scrub"].fn(spark, SF)
    assert num_exchanges(df) == 1, explain_str(df)


def test_gopher_quality_map_only(spark):
    df = REGISTRY["t_gopher_quality"].fn(spark, SF)
    assert num_exchanges(df) == 1, explain_str(df)


def test_dedup_increment_anti_join_shape(spark):
    """d_exact_dedup_increment: batch keep-first window + left-anti store
    probe — no full-corpus re-dedup anywhere in the plan."""
    df = REGISTRY["d_exact_dedup_increment"].fn(spark, SF)
    text = explain_str(df)
    assert "LeftAnti" in text, text


def test_q6_all_predicates_pushed_zero_group_shuffle(spark):
    """q6: pure filter-aggregate — date/discount/quantity all reach the
    scan as PushedFilters; the only exchange is the single-row final
    combine."""
    df = REGISTRY["q6_forecast_revenue"].fn(spark, SF)
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)
    assert num_exchanges(df) <= 1, explain_str(df)


def test_q19_single_side_residues_pushed(spark):
    """q19 (OR-of-ANDs over both join sides): CNF extraction must push the
    part-only residue (brand) into the broadcast dim scan and the
    lineitem-only residue (quantity bounds) into the fact scan."""
    df = REGISTRY["q19_disjunctive_revenue"].fn(spark, SF)
    text = explain_str(df)
    assert has_broadcast_join(df), text
    pushed = " ".join(pushed_filters(df))
    assert "p_brand" in pushed, pushed
    assert "l_quantity" in pushed, pushed


def test_chunking_zero_shuffle(spark):
    """t_chunking: tokenize + index-explode + slice is pure map work — no
    exchange beyond the corpus-spread repartition."""
    df = REGISTRY["t_chunking"].fn(spark, SF)
    assert num_exchanges(df) <= 1, explain_str(df)


def test_url_canonical_two_level_distinct_agg(spark):
    """d_url_canonical: regex canonicalization fuses with the scan; the
    count(DISTINCT url) plans as Spark's two-level rewrite — partial agg on
    (canonical_url, url), exchange, then re-agg on canonical_url, exchange.
    Exactly 2 exchanges, both on keys (no row explosion, no join)."""
    df = REGISTRY["d_url_canonical"].fn(spark, SF)
    text = explain_str(df)
    assert num_exchanges(df) == 2, text
    assert "Join" not in text, text


def test_window_time_range_single_shuffle_no_join(spark):
    """q_window_time_range: RANGE frame = one hash exchange on user_id +
    an in-partition sort — no self-join, no explode."""
    df = REGISTRY["q_window_time_range"].fn(spark, SF)
    text = explain_str(df)
    assert num_exchanges(df) == 1, text
    assert "Join" not in text, text


def test_salted_join_spreads_hot_keys(spark):
    """salted_join with broadcast disabled: the join key becomes
    (l_returnflag, __salt) — 3 hot keys x 16 salts = 48 distinct shuffle
    keys instead of 3 — and results equal the plain join."""
    from oem_gateway_spark.operators.skew import salted_join

    li = load_table(spark, SF, "lineitem").select("l_returnflag", "l_extendedprice")
    dim = li.select("l_returnflag").distinct().withColumn(
        "lbl", F.concat(F.lit("flag-"), F.col("l_returnflag"))
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(li, dim, on="l_returnflag", n_salts=16)
        text = explain_str(salted)
        assert "__salt" in text, text
        plain = li.join(dim, on="l_returnflag")
        assert salted.groupBy("lbl").count().orderBy("lbl").collect() == (
            plain.groupBy("lbl").count().orderBy("lbl").collect()
        )
        # Hot-key spread: the shuffle key is (l_returnflag, __salt), so the
        # biggest single reducer unit is a (flag, salt) bucket.  Unsalted,
        # one reducer absorbs a whole flag (~1/3 of all rows); salted, the
        # largest bucket must be a small fraction (expected 1/48 ~ 0.021).
        total = li.count()
        salt_expr = F.pmod(
            F.xxhash64(*[F.col(c) for c in li.columns]), F.lit(16)
        ).alias("__salt")
        biggest = (
            li.select("l_returnflag", salt_expr)
            .groupBy("l_returnflag", "__salt")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert biggest <= total * 0.05, (biggest, total)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q10_take_ordered_topk(spark):
    """q10: the final top-20 is TakeOrderedAndProject, never a global
    sort; customer/nation broadcast."""
    df = REGISTRY["q10_returned_items"].fn(spark, SF)
    text = explain_str(df)
    assert "TakeOrderedAndProject" in text, text
    assert has_broadcast_join(df), text


def test_q18_semi_join_no_double_agg(spark):
    """q18 (grouped-HAVING IN): planned as ONE per-orderkey aggregation
    whose survivors semi-join back on the same key."""
    df = REGISTRY["q18_large_orders"].fn(spark, SF)
    text = explain_str(df)
    assert "LeftSemi" in text, text


def test_q22_anti_join_with_broadcast_scalar(spark):
    """q22: the global-average scalar broadcasts; NOT EXISTS plans as a
    left-anti join, not a per-row subquery."""
    df = REGISTRY["q22_idle_rich_customers"].fn(spark, SF)
    text = explain_str(df)
    assert "LeftAnti" in text, text
    assert has_broadcast_join(df), text


def test_kmeans_assign_is_map_only(spark):
    """k-means assignment adds NO exchange: argmin over broadcast-literal
    centroids fuses with the scan; only the recompute aggregates."""
    from oem_gateway_spark.operators.clustering import assign_clusters

    emb = load_table(spark, SF, "embeddings")
    seeds = [
        [float(v) for v in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    assigned = assign_clusters(emb, seeds)
    assert num_exchanges(assigned) == 0, explain_str(assigned)


def test_snapshot_diff_single_key_join_no_extra_shuffle(spark):
    """q_snapshot_diff: ONE full-outer join on the snapshot key; the
    unchanged-row filter is a join residual, not a second pass."""
    df = REGISTRY["q_snapshot_diff"].fn(spark, SF)
    text = explain_str(df)
    assert "FullOuter" in text, text
    # old side + (modified ∪ readded) new side shuffle on the key; no
    # further exchange after the join.
    assert num_exchanges(df) <= 3, text


def test_chunk_dedup_two_keyed_exchanges_no_text_shuffle(spark):
    """d_chunk_dedup: keep-first window on chunk_fp + per-doc rollup —
    exchanges carry (ids, fp) only; no join anywhere."""
    df = REGISTRY["d_chunk_dedup"].fn(spark, SF)
    text = explain_str(df)
    assert "Join" not in text, text
    assert "Window" in text, text


def test_weighted_sample_map_only(spark):
    """d_weighted_sample: hash-threshold filter fuses with the scan —
    zero exchanges beyond the corpus spread."""
    df = REGISTRY["d_weighted_sample"].fn(spark, SF)
    assert num_exchanges(df) == 0, explain_str(df)


def test_q7_dims_broadcast_one_fact_shuffle(spark):
    """Q7 shape: both nation-filtered dim chains broadcast; the only
    shuffles are lineitem x orders on orderkey + the final aggregate."""
    df = REGISTRY["q7_nation_trade_volume"].fn(spark, SF)
    text = explain_str(df)
    assert text.count("BroadcastHashJoin") >= 2, text
    assert num_exchanges(df) <= 3, text
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_q8_single_pass_ratio(spark):
    """Q8 shape: numerator and denominator in ONE aggregation (no second
    scan of the join), all dims broadcast."""
    df = REGISTRY["q8_market_share"].fn(spark, SF)
    text = explain_str(df)
    assert text.count("BroadcastHashJoin") >= 3, text
    # lineitem x orders + final agg; dim joins add no exchange
    assert num_exchanges(df) <= 3, text


def test_q17_decorrelated_single_broadcast_of_parts(spark):
    """Q17 shape: the correlated AVG must decorrelate — exactly one
    grouped aggregate over the part-filtered fact, joined back; no
    nested-loop / per-row subquery node."""
    df = REGISTRY["q17_small_quantity_revenue"].fn(spark, SF)
    text = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in text, text
    assert text.count("HashAggregate") >= 2, text  # partial+final of avg + outer agg


def test_q21_semi_then_anti_on_orderkey(spark):
    """Q21 shape: EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti, both keyed
    on orderkey (residual suppkey inequality), no cartesian anywhere."""
    df = REGISTRY["q21_sole_blame_suppliers"].fn(spark, SF)
    text = explain_str(df)
    assert "LeftSemi" in text and "LeftAnti" in text, text
    assert "CartesianProduct" not in text, text
    assert "TakeOrderedAndProject" in text, text


def test_unigram_logprob_tf_collapsed_before_join(spark):
    """The vocabulary join must consume (doc, token, tf) — the corpus
    token stream aggregates BEFORE any join (the exchange carries term
    frequencies, not raw tokens), the vocab/total sides broadcast, and
    the tf frame is persisted so its three consumers tokenize the
    corpus ONCE (InMemoryTableScan at every reuse site, exactly one
    Generate/explode in the whole tree)."""
    from oem_gateway_spark.operators.dedup import release_caches

    df = REGISTRY["t_unigram_logprob"].fn(spark, SF)
    text = explain_str(df)
    try:
        assert text.count("BroadcastHashJoin") >= 1, text
        assert text.count("InMemoryTableScan") >= 2, text
        # the explode feeds the cached tf build only — every other
        # consumer reads the cache, so the (identical) cached-plan render
        # is the only place a Generate appears
        cached_render = "InMemoryRelation"
        assert cached_render in text, text
    finally:
        release_caches(df)


def test_locf_single_window_pass(spark):
    """LOCF is one per-user window pass: a single shuffle, no join."""
    df = REGISTRY["q_locf_fill"].fn(spark, SF)
    text = explain_str(df)
    assert num_exchanges(df) == 1, text
    assert "Join" not in text, text


def test_scd2_single_join_one_pass_emit(spark):
    """SCD2 apply: ONE full-outer join; both history rows per key emit
    through a single explode — the UNION-of-selects formulation would
    plan the join twice."""
    df = REGISTRY["q_scd2_apply"].fn(spark, SF)
    text = explain_str(df)
    tree = text.split("\n\n")[0]  # the plan tree (details repeat nodes)
    assert tree.count("FullOuter") == 1, tree
    assert tree.count("Generate") == 1, tree
    # the only Union is the new-snapshot SYNTHESIS below the join — the
    # history emit above the join must be the explode, not a union
    above_join = tree.split("FullOuter")[0]
    assert "Union" not in above_join, tree


def test_heavy_hitters_mg_then_exact(spark):
    """Heavy hitters: phase-1 candidates come from a partition-local
    summary (MapInPandas, no preceding exchange beyond the corpus
    spread), and phase 2 recounts via a broadcast LeftSemi — the
    full-vocabulary aggregate-then-filter plan would show a plain
    hash aggregate over ALL tokens with no semi join."""
    df = REGISTRY["d_heavy_hitters"].fn(spark, SF)
    text = explain_str(df)
    assert "MapInPandas" in text, text
    assert "LeftSemi" in text, text
    assert "BroadcastHashJoin" in text or "BroadcastExchange" in text, text


def test_data_prep_v2_single_fp_exchange(spark):
    """The composed pipeline's ONLY exchanges are the corpus spread and
    the fingerprint window shuffle — scrub, gates, and chunk accounting
    all fuse with the scan; no join anywhere."""
    df = REGISTRY["pipeline_data_prep_v2"].fn(spark, SF)
    text = explain_str(df)
    assert num_exchanges(df) == 2, text
    assert "Join" not in text, text
    assert "Window" in text, text


# ------------------------------------------- round-4 late additions


def test_q9_part_filter_broadcasts(spark):
    """Q9's LIKE-filtered part dim must broadcast and prune the fact
    BEFORE the orderkey shuffle; the filter itself cannot push to the
    scan (LIKE 'red%' compiles to StartsWith — that one can)."""
    df = REGISTRY["q9_product_profit"].fn(spark, SF)
    text = explain_str(df)
    assert text.count("BroadcastHashJoin") >= 3, text
    pushed = pushed_filters(df)
    assert any("p_name" in p for p in pushed), pushed


def test_q15_scalar_max_no_global_sort(spark):
    """Q15's max-revenue equality must plan as a scalar aggregate +
    broadcast join — never a global sort or unpartitioned window."""
    df = REGISTRY["q15_top_supplier"].fn(spark, SF)
    text = explain_str(df)
    # never a global sort: no range-partitioning exchange anywhere
    assert "rangepartitioning" not in text, text
    # the scalar max is the only single-partition exchange in the plan
    assert text.count("SinglePartition") == 1, text
    assert has_broadcast_join(df)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_q11_fact_scanned_once(spark):
    """Q11's global threshold derives from the per-part aggregate, so
    the lineitem scan appears exactly once in the plan."""
    df = REGISTRY["q11_important_parts"].fn(spark, SF)
    text = explain_str(df)
    assert text.count("lineitem.parquet") == 1, text


def test_q16_not_in_is_anti_join(spark):
    df = REGISTRY["q16_part_supplier_counts"].fn(spark, SF)
    text = explain_str(df)
    assert "LeftAnti" in text, text
    assert has_broadcast_join(df)


def test_tfidf_single_corpus_scan(spark):
    """df derives from the aggregated tf relation — the documents scan
    must appear exactly once."""
    df = REGISTRY["t_tfidf_top_terms"].fn(spark, SF)
    text = explain_str(df)
    assert text.count("documents.parquet") == 1, text


def test_batch_classify_exchange_free(spark):
    """The inference pipeline is pure map work after the (explicit,
    input-spreading) repartition — no data-dependent shuffles."""
    df = REGISTRY["m_batch_classify"].fn(spark, SF)
    text = explain_str(df)
    # one RoundRobin repartition for input spreading, nothing keyed
    assert "hashpartitioning" not in text.lower(), text


def test_q15_q20_fact_scanned_once(spark):
    for name in ("q15_top_supplier", "q20_promotion_suppliers",
                 "q2_min_cost_supplier"):
        df = REGISTRY[name].fn(spark, SF)
        text = explain_str(df)
        assert text.count("lineitem.parquet") <= 1, (name, text)


def test_bucketed_join_no_shuffle(spark):
    """Both sides pre-bucketed on the join key: the SMJ must consume
    the bucketed scans directly — the only Exchange in the whole plan
    is the final aggregation's."""
    df = REGISTRY["q_bucketed_join"].fn(spark, SF)
    text = explain_str(df)
    assert "SortMergeJoin" in text, text
    assert num_exchanges(df) == 1, text


def test_skyline_bounded_global_pass(spark):
    """The skyline's only single-partition work is the frontier
    recurrence over DISTINCT prices (aggregated input, bounded by the
    x-domain); row recovery is a broadcast join, never a global sort
    of the base table."""
    df = REGISTRY["q_skyline"].fn(spark, SF)
    text = explain_str(df)
    assert has_broadcast_join(df)
    assert text.count("SinglePartition") == 1, text
    assert "rangepartitioning" not in text, text
    # Pin the window's INPUT to the per-price aggregate (r5 VERDICT #7):
    # a refactor that moved the running-max window onto raw part rows
    # would still pass the SinglePartition count but turn the bounded
    # |distinct x| pass into a global pass over n rows.  In formatted
    # explain children print BELOW parents, so between the Window line
    # and its HashAggregate child there must be no parquet scan.
    tree = text.splitlines()
    win_i = next(i for i, l in enumerate(tree) if " Window " in f" {l} ")
    agg_i = next(
        i for i, l in enumerate(tree[win_i:], win_i) if "HashAggregate" in l
    )
    between = "\n".join(tree[win_i:agg_i])
    assert "Scan parquet" not in between, between
    # and that aggregate groups by the skyline's x dimension
    assert "Keys [1]: [p_retailprice" in text, text


def test_hll_merge_is_two_scans(spark):
    """Sketch build + exact-twin audit: exactly two scans of the fact
    (production drops the exact twin and keeps one)."""
    df = REGISTRY["q_hll_partial_merge"].fn(spark, SF)
    text = explain_str(df)
    assert text.count("lineitem.parquet") == 2, text
    assert "hll_union_agg" in text or "hll_sketch" in text.lower(), text


def test_semdedup_centroids_broadcast(spark):
    """Centroid assignment is MAP-SIDE (r13: pandas argmax against the
    k x dim centroid matrix in the UDF closure — no crossJoin, so no
    BroadcastNestedLoopJoin and no n*k row materialization); the k-row
    size table still broadcasts back, and the only keyed shuffle is the
    per-cluster applyInPandas grouping."""
    df = REGISTRY["d_semdedup_centroid"].fn(spark, SF)
    text = explain_str(df)
    assert "BroadcastExchange" in text, text
    assert "BroadcastNestedLoopJoin" not in text, text
    assert "FlatMapGroupsInPandas" in text, text
    assert "rangepartitioning" not in text, text


def test_group_split_single_scan_no_join(spark):
    """Both split variants derive from one documents scan (the union
    duplicates rows map-side, not the scan); the group hash needs no
    join because the group key is on the row."""
    df = REGISTRY["d_group_split"].fn(spark, SF)
    text = explain_str(df)
    assert "Join" not in text, text
    assert text.count("documents.parquet") <= 2, text  # one per union leg


def test_skew_diagnostics_single_scan(spark):
    """All three candidate keys unpivot from ONE fact scan into a
    two-level aggregate — never a per-key job or scan."""
    df = REGISTRY["q_skew_diagnostics"].fn(spark, SF)
    text = explain_str(df)
    assert text.count("lineitem.parquet") == 1, text
    assert "Join" not in text, text


def test_merge_upsert_single_full_outer_pass(spark):
    """MERGE kernel: exactly 2 exchanges — the target's join shuffle and
    the change-feed aggregation, whose hash partitioning on the business
    key DOUBLES as the source side's join distribution (no third
    exchange).  Clause routing and the delete filter are map work above
    the join; the aggregate combines map-side (partial before its
    exchange)."""
    df = REGISTRY["q_merge_upsert"].fn(spark, SF)
    text = explain_str(df)
    assert "SortMergeJoin FullOuter" in text, text
    assert num_exchanges(df) == 2, text
    # partial-final agg split: the change feed combines before shuffling
    # (numbered-detail form: once per physical node)
    assert len(re.findall(r"\(\d+\) HashAggregate", text)) == 2, text


def test_shortest_path_truncates_round_lineage(spark):
    """Bellman-Ford rounds eagerly localCheckpoint the dual-referenced
    round states (r13 lineage cut), so the returned plan is the
    TRUNCATED final bounds: a checkpoint-RDD scan with no parquet
    re-scan, no Exchange and no cartesian product — the 214-Exchange
    re-execution tree of the uncut version is gone
    (plans/r13/q_shortest_path_bounded_after.txt).  The per-round
    compute (persisted edge reuse, frontier shrink) executes during
    the eager checkpoints at build time and its correctness is pinned
    by the oracle tests."""
    df = REGISTRY["q_shortest_path_bounded"].fn(spark, SF)
    text = explain_str(df)
    assert "Scan ExistingRDD" in text, text
    assert "Scan parquet" not in text, text
    assert "Exchange" not in text, text
    assert "CartesianProduct" not in text, text
    from oem_gateway_spark.operators.dedup import release_caches

    release_caches(df)


def test_setsim_prefix_join_shape(spark):
    """Prefix-filter join: the vocabulary-sized frequency table joins
    BROADCAST (never a shuffle of the full shingle stream against it),
    and no stage degenerates to a cartesian product."""
    df = REGISTRY["d_setsim_prefix_join"].fn(spark, SF)
    text = explain_str(df)
    assert "BroadcastHashJoin" in text, text
    assert "CartesianProduct" not in text, text
    from oem_gateway_spark.operators.dedup import release_caches

    release_caches(df)


def test_merkle_reconcile_prunes_before_row_join(spark):
    """Merkle reconciliation: the digest pass resolves to a driver-side
    bucket list at build time, so the RETURNED plan is just the two
    pruned row streams (literal IN filters — statically prunable on a
    bucketed layout) full-outer joined: no aggregates, no repeated
    digest subtrees, one scan for snapshot A plus two for B's
    base+inserts union."""
    df = REGISTRY["q_merkle_reconcile"].fn(spark, SF)
    text = explain_str(df)
    assert "FullOuter" in text, text
    assert "HashAggregate" not in text, text
    # literal membership filter (Spark renders IN (...) or INSET ...)
    assert "INSET" in text or " IN (" in text, text
    assert len(re.findall(r"\(\d+\) Scan parquet", text)) == 3, text


def test_kmv_sketch_build_shape(spark):
    """KMV: the sketch build is one dedup shuffle + the per-segment
    top-k window sharing that partitioning; the pair-merge tier joins
    kilobyte sketch arrays broadcast, never shuffling the hash stream
    again."""
    df = REGISTRY["q_kmv_intersect"].fn(spark, SF)
    try:
        text = explain_str(df)
        assert (
            "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text
        ), text
        assert "CartesianProduct" not in text, text
        # the dedup stream and sketch table are cached, so the hash
        # stream shuffles at most: window top-k, counts agg, the two
        # exact-audit h-repartitions, and the ex aggregation — bound the
        # total so a refactor can't silently replan the dedup subtree
        # once per consumer
        assert "InMemoryTableScan" in text, text
        assert num_exchanges(df) <= 6, text
    finally:
        from oem_gateway_spark.operators.dedup import release_caches

        release_caches(df)


def test_dpp_runtime_pruning_in_fact_scan(spark):
    """Dynamic partition pruning must fire: the hive-partitioned fact
    scan carries a dynamicpruning expression in its PartitionFilters
    (runtime dim values prune directories before I/O) — a static plan
    cannot know the 2 surviving priorities."""
    df = REGISTRY["q_dpp_prune"].fn(spark, SF)
    text = explain_str(df)
    assert "dynamicpruning" in text.lower(), text
    assert "PartitionFilters" in text, text


def test_bloom_runtime_filter_on_fact_side(spark):
    """InjectRuntimeFilter must fire: the optimized plan carries a
    might_contain(...) probe on the fact's join key fed by a
    bloom_filter_agg over the filtered dim — rows that cannot join are
    dropped BEFORE the fact shuffle.  The confs must stay mutated until
    the next registry build (wrapper reset): physical planning and AQE
    re-optimization read conf at ACTION time, so an eager restore would
    execute this as a BroadcastHashJoin with the bloom probe as pure
    overhead — the r7 code-review regression this test now pins against:
    the EXECUTED plan must be the shuffle join."""
    from oem_gateway_spark.session import ensure_runtime_conf

    thresh = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    try:
        df = REGISTRY["q_bloom_prune"].fn(spark, SF)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt
        assert "bloom_filter_agg" in opt, opt
        # thresholds stay aggressive while the frame is un-executed...
        assert spark.conf.get(thresh) == "0"
        # ...so the PHYSICAL plan is the shuffle join the witness needs
        # (an eager conf restore would broadcast the small dim instead)
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in executed, executed
        assert (
            "SortMergeJoin" in executed or "ShuffledHashJoin" in executed
        ), executed
        # This test inspects plans without acting — acknowledge the conf
        # witness so the r8 loud out-of-order guard doesn't record a
        # violation for a deliberate build-only site.
        from oem_gateway_spark.suite.registry import clear_conf_witness

        clear_conf_witness("plan test inspects without executing")
        # ...and restored by the wrapper as soon as any other query runs.
        REGISTRY["q1_pricing_summary"].fn(spark, SF)
        assert spark.conf.get(thresh) == "10GB"
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"
    finally:
        # don't leak the mutation into later tests if an assert fires
        # before the wrapper-reset step above
        ensure_runtime_conf(spark)


def test_ivm_delta_never_rescans_base(spark):
    """IVM contract: the plan reads the stored MV plus the DELTA slice
    only — the split predicate is pushed into the orders scan, so the
    pre-split base rows (the overwhelming majority at 100 TB) never
    leave the parquet reader; no third scan exists."""
    df = REGISTRY["q_ivm_delta"].fn(spark, SF)
    text = explain_str(df)
    assert "GreaterThanOrEqual(o_orderdate" in text, text
    # exactly two leaves: the MV store and the delta slice of orders
    # (formatted explain lists each "Scan parquet" twice: tree + detail)
    assert len(re.findall(r"^\(\d+\) Scan parquet", text, re.M)) == 2, text
    # delta agg shuffle + the two join-input exchanges at most
    assert num_exchanges(df) <= 3, text


def test_bitmap_distinct_mergeable_partials(spark):
    """The first aggregation level must be a map-side-combined BIT_OR
    (partial_bit_or) — the fixed-size mergeable-partial contract; the
    popcount roll-up shuffles only |groups| x domain/64 word rows."""
    df = REGISTRY["q_bitmap_distinct"].fn(spark, SF)
    text = explain_str(df)
    assert "partial_bit_or" in text, text
    assert "bit_count" in text, text
    # two levels = two exchanges, nothing else
    assert num_exchanges(df) == 2, text


def test_interval_union_single_key_shuffle(spark):
    """Sweep-line plan: ONE hash exchange on the key serves both window
    passes (same partitioning + same sort order — Catalyst must reuse
    the sort) and the island aggregates; no global window, no second
    shuffle of the interval rows."""
    df = REGISTRY["q_interval_union"].fn(spark, SF)
    text = explain_str(df)
    assert num_exchanges(df) == 1, text
    # both windows partition by user_id — never an empty partition spec
    assert "windowspecdefinition(user_id" in text, text
    assert text.count("Sort ") == 1, text


def test_incremental_minhash_broadcast_probe(spark):
    """The crawl-vs-store probe must broadcast the NEW side: the store's
    banded rows stream map-side past the batch's buckets — no
    sort-merge/shuffle join of store bands, no store-store candidates
    (asserted by construction: join output pairs new_id x store_id)."""
    df = REGISTRY["d_incremental_minhash"].fn(spark, SF)
    try:
        text = explain_str(df)
        assert "BroadcastHashJoin" in text, text
        assert "SortMergeJoin" not in text, text
    finally:
        from oem_gateway_spark.operators.dedup import release_caches

        release_caches(df)


def test_schema_evolution_merged_scan(spark):
    """mergeSchema read: ONE scan whose ReadSchema is the union of both
    file schemas (the added column present), not a per-file union plan."""
    df = REGISTRY["q_schema_evolution"].fn(spark, SF)
    text = explain_str(df)
    assert len(re.findall(r"^\(\d+\) Scan parquet", text, re.M)) == 1, text
    read_schema = text.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderpriority" in read_schema and "cents" in read_schema, text
    assert "Union" not in text, text


def test_time_weighted_avg_single_shuffle(spark):
    """Integration plan: one key shuffle feeding the lead() window and
    the per-key aggregate — the sessionize family shape, no join."""
    df = REGISTRY["q_time_weighted_avg"].fn(spark, SF)
    text = explain_str(df)
    assert num_exchanges(df) == 1, text
    assert "Join" not in text, text


def test_cbo_join_reorder_fires(spark):
    """Stats-driven join reordering: the SQL text joins the facts first,
    but with ANALYZEd tables + CBO the optimized tree joins the
    filtered dim below the fact — and both cbo confs reset on the next
    registry build (same lifecycle as the bloom knobs)."""
    from oem_gateway_spark.session import ensure_runtime_conf
    from oem_gateway_spark.suite.reconcile_extra import _cbo_tables

    try:
        df = REGISTRY["q_cbo_join_reorder"].fn(spark, SF)
        names = _cbo_tables(spark, SF)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert opt.index(names["customer"]) < opt.index(names["lineitem"]), opt
        assert spark.conf.get("spark.sql.cbo.enabled") == "true"
        # Deliberate build-only site (see the bloom test above).
        from oem_gateway_spark.suite.registry import clear_conf_witness

        clear_conf_witness("plan test inspects without executing")
        REGISTRY["q1_pricing_summary"].fn(spark, SF)
        assert spark.conf.get("spark.sql.cbo.enabled") == "false"
        assert spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "false"
    finally:
        ensure_runtime_conf(spark)
