"""Data-layout operators: partitioned writes, partition pruning, and
small-file compaction — the storage-side half of the 100 TB contract.

At scale the engine's read-side efficiency is decided at WRITE time:

  - ``write_partitioned``: hive-style ``partitionBy`` layout (events by
    day, lineitem by ship-month).  Readers filtering on the partition key
    skip whole directories (PartitionFilters in the scan — pruning happens
    at planning, before a single byte of data is read).  Combined with
    ``sortWithinPartitions`` on a secondary key, parquet min/max row-group
    stats make residual filters cheap too.
  - ``compact_small_files``: the streaming/append pattern produces many
    tiny files; scan tasks then die of per-file overhead (open, footer
    parse, schedule).  Compaction rewrites each partition to
    ``ceil(bytes / target_file_bytes)`` files.  The sizing comes from the
    actual on-disk bytes, not a guessed row count.

The reference gateway appends readings to whatever emoncms stores; these
operators are what its feed history becomes at 100 TB (a partitioned
lakehouse table maintained by a compaction job).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols``; optionally sort
    rows within each output file by ``sort_cols`` so parquet row-group
    min/max stats line up with the dominant residual filter."""
    out = df
    if sort_cols:
        # repartition on the partition key first so each output directory is
        # written by few tasks (fewer, larger files), then sort inside tasks.
        out = out.repartition(*partition_cols).sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def dir_bytes(path: str) -> int:
    """Recursive on-disk parquet bytes (excluding _SUCCESS/metadata)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith("_") or f.startswith("."):
                continue
            total += os.path.getsize(os.path.join(root, f))
    return total


def n_data_files(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> int:
    """Rewrite the parquet dataset at ``path`` into
    ``ceil(bytes / target_file_bytes)`` files (per partition directory when
    ``partition_col`` is given); returns the new file count.

    Rewrite-with-temp: the compacted copy is fully written (and readable)
    at ``<path>.compact`` before the swap; the swap itself is a directory
    rename.  On a lakehouse this whole function is OPTIMIZE /
    rewrite_data_files, where the transaction log also closes the rename
    window.
    """
    import shutil

    path = path.rstrip("/")
    tmp = path + ".compact"
    shutil.rmtree(tmp, ignore_errors=True)
    if partition_col is None:
        n_files = max(1, math.ceil(dir_bytes(path) / target_file_bytes))
        spark.read.parquet(path).repartition(n_files).write.mode(
            "overwrite"
        ).parquet(tmp)
    else:
        # Per-partition-directory sizing: a uniform global repartition would
        # give the biggest (skewed) partition the same file count as the
        # smallest.  Each source directory is read directly (its files hold
        # only data columns) and rewritten into the same hive dir name, so
        # the partition column stays directory-encoded — pruning survives
        # compaction.
        parts = [
            d
            for d in os.listdir(path)
            if d.startswith(f"{partition_col}=")
            and os.path.isdir(os.path.join(path, d))
        ]
        for d in parts:
            sub = os.path.join(path, d)
            n_files = max(1, math.ceil(dir_bytes(sub) / target_file_bytes))
            (
                spark.read.parquet(sub)
                .repartition(n_files)
                .write.mode("overwrite")
                .parquet(os.path.join(tmp, d))
            )
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_data_files(path)
