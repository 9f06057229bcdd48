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


def _interleave_bits(col_a, col_b, bits: int = 16):
    """Morton (Z-order) code: interleave the low ``bits`` bits of two
    non-negative int columns (a in even positions, b in odd) — a pure
    column expression, whole-stage codegen, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(col_a, i).bitwiseAND(F.lit(1)).cast("long") * (1 << (2 * i)))
            + (F.shiftright(col_b, i).bitwiseAND(F.lit(1)).cast("long") * (1 << (2 * i + 1)))
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) layout: range-partition and sort the rows by
    the interleaved bit code of two columns, so every output file covers a
    small RECTANGLE of the (a, b) space instead of a thin stripe of one
    dimension.

    Why it matters at 100 TB: parquet readers skip a file/row-group when
    its min/max stats exclude the predicate.  A single-column sort gives
    perfect skipping on that column and ZERO on the other; the Z-order
    curve gives near-perfect skipping on BOTH — a 2-D box predicate
    touches only the files whose rectangle intersects the box
    (tests/test_layout.py measures the file-level skip rate vs the
    linear layout on the same data).  This is the OPTIMIZE ZORDER BY of
    lakehouse engines, expressed as repartitionByRange + in-file sort on
    a codegen'd Morton expression — the columns are first rank-normalized
    (quantile buckets) so value skew cannot collapse the curve onto one
    axis.

    Scale note: normalization uses approxQuantile boundaries (a bounded
    driver-side array of 2^bits-1 doubles — the Greenwald-Khanna sketch
    runs distributed) fed to native Bucketizers; a global ntile/rank
    window would funnel the table through ONE partition and is exactly
    the plan this operator must never produce.
    """
    from pyspark.ml.feature import Bucketizer
    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    coded = df
    for c, out in ((col_a, "_za"), (col_b, "_zb")):
        cuts = coded.approxQuantile(c, probs, 1.0 / (4 * n_buckets))
        # de-duplicate boundaries (constant-ish columns) and wall off ±inf
        splits = [float("-inf")] + sorted(set(cuts)) + [float("inf")]
        # bucketize a double COPY so the data column keeps its own type
        coded = Bucketizer(
            splits=splits, inputCol=out + "_in", outputCol=out
        ).transform(coded.withColumn(out + "_in", F.col(c).cast("double")))
        # rescale to the FULL [0, 2^bits) range: a low-cardinality column
        # yields few distinct buckets, and without the stretch its bits
        # would all sit in the low (least significant) interleave slots —
        # the curve would degenerate into a single-column sort on the
        # high-cardinality dimension.
        n_actual = len(splits) - 1
        coded = coded.withColumn(
            out,
            F.least(
                F.floor(F.col(out) * n_buckets / n_actual).cast("long"),
                F.lit(n_buckets - 1).cast("long"),
            ),
        ).drop(out + "_in")
    coded = coded.withColumn(
        "_z", _interleave_bits(F.col("_za"), F.col("_zb"), bits)
    )
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_za", "_zb", "_z")
        .write.mode(mode)
        .parquet(path)
    )
