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


def test_zorder_layout_skips_files_on_both_dims(spark, tmp_path):
    """Z-order vs single-column sort, measured at the parquet-footer level:
    for a 2-D box predicate, count the files whose (min, max) ranges
    intersect the box — the exact set a stats-pruning reader must open.
    The linear layout must open ~every file for the non-sort dimension's
    constraint; the Z-order layout must skip a clear majority."""
    import glob

    import pyarrow.parquet as pq

    from oem_gateway_spark.operators.layout import zorder_write

    li = load_table(spark, SF, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    zorder_write(li, zpath, "l_partkey", "l_suppkey", n_files=n_files)
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # boxes sized to the sf0.001 domains (l_partkey 0..199, l_suppkey 0..9)
    lo_a, hi_a = 50, 120    # box on l_partkey
    lo_b, hi_b = 2, 4       # box on l_suppkey

    def files_touched(path):
        # repartitionByRange samples split points with an rdd.id-derived
        # seed, so boundary files can be near-empty SLIVERS whose narrow
        # stats skip predicates no real file could (observed once in a
        # full-suite run where the accumulated rdd.id shifted the sample).
        # Skip-rate assertions are about real files: ignore files holding
        # <1% of the rows.
        metas = [
            pq.read_metadata(f)
            for f in glob.glob(os.path.join(path, "*.parquet"))
        ]
        min_rows = 0.01 * sum(md.num_rows for md in metas)
        touched, total = 0, 0
        for md in metas:
            if md.num_rows < min_rows:
                continue
            mins = {"l_partkey": None, "l_suppkey": None}
            maxs = {"l_partkey": None, "l_suppkey": None}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in mins and col.statistics is not None:
                        st = col.statistics
                        mins[name] = (
                            st.min if mins[name] is None else min(mins[name], st.min)
                        )
                        maxs[name] = (
                            st.max if maxs[name] is None else max(maxs[name], st.max)
                        )
            total += 1
            if (
                mins["l_partkey"] is not None
                and not (maxs["l_partkey"] < lo_a or mins["l_partkey"] > hi_a)
                and not (maxs["l_suppkey"] < lo_b or mins["l_suppkey"] > hi_b)
            ):
                touched += 1
        return touched, total

    zt, zn = files_touched(zpath)
    lt, ln = files_touched(lpath)
    assert zn >= n_files // 2 and ln >= n_files // 2  # both actually split
    # 2-D box: z-order must not be meaningfully worse.  On a narrow-partkey
    # box the linear layout prunes well on its sort key, so parity is
    # expected — and repartitionByRange SAMPLES its split points with an
    # rdd.id-derived seed, so a boundary file's rectangle can straddle the
    # box edge on either layout depending on suite ordering (observed once
    # at r6 as a sliver, once at r8 as zt = lt + 1).  Allow exactly that
    # one boundary file of variance; the wide-box checks below are the
    # discriminating ones and stay strict.
    assert zt <= lt + 1, (zt, lt)
    # the discriminating check is a box wide on the sort key and narrow on
    # the OTHER key — the linear layout cannot skip anything there:
    lo_a, hi_a = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    wz, _ = files_touched(zpath)
    wl, _ = files_touched(lpath)
    # partkey unconstrained -> linear layout must open every file...
    assert wl == ln, (wl, ln)
    # ...while the z-order layout still skips on the suppkey dimension.
    assert wz < zn * 0.7, (wz, zn)

    # and both layouts return identical data
    assert (
        spark.read.parquet(zpath).count() == spark.read.parquet(lpath).count()
    )
