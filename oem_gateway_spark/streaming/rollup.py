"""Incremental rollup (continuous aggregation): maintain a pre-aggregated
per-(key, window) table from a stream, merged per micro-batch.

The hypertable/continuous-aggregate pattern emoncms feeds imply: the raw
reading stream is heavy; dashboards read a small rollup table.  Built on
foreachBatch + partial-aggregate merge:

  stream -> per-batch aggregate (count/sum per key+window)
         -> MERGE into the rollup store (sum the partials)

Decomposable aggregates only (count/sum/min/max — avg = sum/count at read
time), so merging partials is exact regardless of how rows split across
batches.  At 100 TB the store is a Delta/Iceberg table with MERGE INTO;
here it is parquet rewritten per batch keyed by (node, win_start) — same
contract, exchange-able storage layer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalRollup:
    """foreachBatch maintainer of a (node, win_start) rollup table."""

    def __init__(self, store_dir: str, window: str = "1 hour"):
        self.store_dir = store_dir
        self.window = window

    # -- batch-side aggregation (also usable standalone for backfills)
    def aggregate_batch(self, df: DataFrame, ts_col: str = "ingest_ts") -> DataFrame:
        return (
            df.groupBy(
                F.window(ts_col, self.window).alias("win"), F.col("node")
            )
            .agg(
                F.count("*").alias("n_frames"),
                F.sum(F.element_at("values", 1)).alias("sum_v0"),
                F.min(F.element_at("values", 1)).alias("min_v0"),
                F.max(F.element_at("values", 1)).alias("max_v0"),
            )
            .select(
                F.col("win.start").alias("win_start"),
                "node",
                "n_frames",
                "sum_v0",
                "min_v0",
                "max_v0",
            )
        )

    def read_store(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(self.store_dir):
            return None
        try:
            return spark.read.parquet(self.store_dir)
        except Exception:  # noqa: BLE001 - empty dir on first batch
            return None

    def merge(self, existing: DataFrame | None, partial: DataFrame) -> DataFrame:
        """Combine partial aggregates with the stored rollup (exact for
        decomposable aggregates)."""
        merged = partial if existing is None else existing.unionByName(partial)
        return merged.groupBy("win_start", "node").agg(
            F.sum("n_frames").alias("n_frames"),
            F.sum("sum_v0").alias("sum_v0"),
            F.min("min_v0").alias("min_v0"),
            F.max("max_v0").alias("max_v0"),
        )

    def process_batch(self, df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        partial = self.aggregate_batch(df)
        merged = self.merge(self.read_store(spark), partial)
        # Rewrite-with-temp keeps the store readable on failure; a lakehouse
        # MERGE INTO replaces this dance at scale.
        tmp = self.store_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.store_dir)
