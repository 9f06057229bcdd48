"""Data-layout operators (operators/layout.py): partitioned writes prune at
planning time, compaction hits the target file count and preserves both the
data and the partition layout."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.operators.layout import (
    compact_small_files,
    n_data_files,
    write_partitioned,
)
from oem_gateway_spark.plans import explain_str

SF = "/root/testdata/sf0.001"
SCRATCH = "/root/repo/.scratch/layout-tests"


def _events_by_day(spark, path):
    ev = load_table(spark, SF, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    write_partitioned(ev, path, partition_cols=["day"], sort_cols=["user_id"])
    return ev


def test_partitioned_write_prunes_at_planning(spark):
    path = os.path.join(SCRATCH, "events-by-day")
    shutil.rmtree(path, ignore_errors=True)
    ev = _events_by_day(spark, path)
    days = sorted(d for d in os.listdir(path) if d.startswith("day="))
    assert len(days) > 1, "need multiple partitions to prove pruning"
    pick = days[0].split("=", 1)[1]

    df = spark.read.parquet(path).filter(F.col("day") == pick)
    text = explain_str(df)
    # The day filter must appear as a PartitionFilters entry (planning-time
    # directory skip), NOT as a PushedFilters/post-scan data filter.
    assert "PartitionFilters" in text and "day" in text.split("PartitionFilters")[1].splitlines()[0], text
    expected = ev.filter(F.col("day") == pick).count()
    assert df.count() == expected


def test_compaction_reduces_files_and_preserves_data(spark):
    path = os.path.join(SCRATCH, "events-compact")
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, SF, "events")
    # Simulate the streaming-append pathology: 64 tiny files.
    ev.repartition(64).write.mode("overwrite").parquet(path)
    assert n_data_files(path) == 64
    # round the float sum: repartitioning reorders the addition
    agg = [F.count("*"), F.round(F.sum("value"), 4), F.min("event_id"), F.max("event_id")]
    before = spark.read.parquet(path).agg(*agg).collect()[0]

    n_after = compact_small_files(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert n_after < 8, f"compaction left {n_after} files"
    after = spark.read.parquet(path).agg(*agg).collect()[0]
    assert tuple(before) == tuple(after)


def test_partitioned_compaction_keeps_layout(spark):
    path = os.path.join(SCRATCH, "events-part-compact")
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, SF, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    # Many small files per partition directory.
    ev.repartition(16).write.mode("overwrite").partitionBy("day").parquet(path)
    files_before = n_data_files(path)
    rows_before = spark.read.parquet(path).count()

    files_after = compact_small_files(
        spark, path, target_file_bytes=64 * 1024 * 1024, partition_col="day"
    )
    assert files_after < files_before, (files_before, files_after)
    out = spark.read.parquet(path)
    assert out.count() == rows_before
    # Partition layout survived: the day column is still directory-encoded
    # and still prunes at planning time.
    days = sorted(d for d in os.listdir(path) if d.startswith("day="))
    assert days, os.listdir(path)
    pick = days[0].split("=", 1)[1]
    text = explain_str(out.filter(F.col("day") == pick))
    assert "PartitionFilters" in text, text
