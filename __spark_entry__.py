"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship gateway pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the full suite registry
(oem_gateway_spark.suite) — one entry per operator from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: gateway readings pipeline on /root/testdata/sf0.001.

    events -> JSON props parse -> 15-min tumbling rollup per (node, type):
    the reference's source->parse->timestamp->batch dataflow expressed as a
    Catalyst-optimized aggregation (SURVEY §3.2 Spark equivalent).
    """
    from pyspark.sql import functions as F

    from oem_gateway_spark.catalog import load_table
    from oem_gateway_spark.session import ensure_runtime_conf

    # The driver may hand us a bare session; pin UTC + runtime conf so the
    # events ts normalization (catalog.normalize_event_ts) is deterministic.
    ensure_runtime_conf(spark)
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .withColumn("win", F.window("ts", "15 minutes"))
        .groupBy(
            F.col("win.start").alias("win_start"),
            F.col("user_id").alias("node"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.6."""
    from oem_gateway_spark.suite import REGISTRY

    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each SQL-expressible query."""
    from oem_gateway_spark.suite import REGISTRY

    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
