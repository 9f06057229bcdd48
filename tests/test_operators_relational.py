"""Unit tests for the reusable relational composites."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 5), (2, 7)], "k int, t int"
    )
    right = spark.createDataFrame(
        [(1, 3, "a"), (1, 9, "b"), (1, 11, "c"), (2, 8, "d")], "k int, t int, v string"
    )
    from oem_gateway_spark.operators.relational import asof_join

    out = asof_join(left, right, key="k", left_ts="t", right_ts="t")
    got = {(r["k"], r["t"]): (r["t_right"], r["v_right"]) for r in out.collect()}
    assert got == {(1, 10): (9, "b"), (1, 5): (3, "a"), (2, 7): (None, None)}


def test_topk_per_group(spark):
    from oem_gateway_spark.operators.relational import topk_per_group

    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "g string, x int"
    )
    out = topk_per_group(df, ["g"], [F.desc("x")], k=2)
    got = sorted((r["g"], r["x"]) for r in out.collect())
    assert got == [("a", 2), ("a", 3), ("b", 9)]


def test_range_join(spark):
    from oem_gateway_spark.operators.relational import range_join

    left = spark.createDataFrame([(1, 5), (1, 20)], "lk int, lv int")
    right = spark.createDataFrame([(1, 4), (1, 30)], "rk int, rv int")
    out = range_join(
        left, right, ("lk", "rk"), (F.col("rv") - F.col("lv")).between(-2, 2)
    )
    assert [(r["lv"], r["rv"]) for r in out.collect()] == [(5, 4)]
