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


class RollupOwnershipError(RuntimeError):
    """A second live maintainer tried to drive the same rollup store."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def reap_dead_owner_dirs(base: str) -> None:
    """GC a per-process scratch base: remove sibling dirs whose owner PID
    (the trailing ``_pid<N>`` segment) is dead, and pre-PID legacy dirs
    older than 24h.  The 'pid' prefix keeps the owner segment
    unambiguous — legacy names end in SF digits a bare rsplit would
    misparse as PID 1, always alive, never reaped (code-review r5).

    Shared by every per-process scratch store (bucketed tables, dpp
    layout, MV/evolution stores): the copies had already diverged once
    (code-review r7), and this logic is the concurrency seam parallel
    pytest sessions depend on — one implementation or none."""
    import shutil
    import time

    os.makedirs(base, exist_ok=True)
    for entry in os.listdir(base):
        path = os.path.join(base, entry)
        tail = entry.rsplit("_", 1)[-1]
        if tail.startswith("pid") and tail[3:].isdigit():
            if not _pid_alive(int(tail[3:])):
                shutil.rmtree(path, ignore_errors=True)
        else:
            # Pre-PID naming: only pre-PID code (a full round gone) could
            # reference these; the 24h mtime gate is margin, not
            # correctness.  PID reuse pinning a dead owner's dir is
            # accepted (bounded: one dir).
            try:
                if os.path.getmtime(path) < time.time() - 24 * 3600:
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                pass


def pid_scoped_dir(base: str, stem: str) -> str:
    """``<base>/<stem>_pid<os.getpid()>`` after reaping dead owners."""
    reap_dead_owner_dirs(base)
    return os.path.join(base, f"{stem}_pid{os.getpid()}")


class IncrementalRollup:
    """foreachBatch maintainer of a (node, win_start) rollup table.

    SINGLE-WRITER per store: the ``.tmp``-promote commit dance assumes one
    maintainer owns the store — two interleaved writers could promote each
    other's half-merged snapshots.  A lease file (``<store>.lock``, holding
    pid + instance token) enforces this: the first ``process_batch``
    acquires it, a second live maintainer raises
    :class:`RollupOwnershipError`, and a lease whose holder process is dead
    (crash) is stolen so restarts recover without manual cleanup.  At
    100 TB the lakehouse MERGE INTO's transaction log replaces the lease.
    """

    def __init__(self, store_dir: str, window: str = "1 hour"):
        self.store_dir = store_dir
        self.window = window
        self._lease_held = False

    # -- single-writer lease ------------------------------------------------

    @property
    def _lease_path(self) -> str:
        return self.store_dir + ".lock"

    def acquire_lease(self) -> None:
        """Idempotent for the holder; raises for a concurrent live one."""
        if self._lease_held:
            return
        parent = os.path.dirname(os.path.abspath(self.store_dir))
        os.makedirs(parent, exist_ok=True)
        token = f"{os.getpid()}:{id(self)}"
        for _attempt in range(2):
            try:
                fd = os.open(self._lease_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode())
                os.close(fd)
                self._lease_held = True
                return
            except FileExistsError:
                try:
                    with open(self._lease_path) as f:
                        held = f.read().strip()
                except FileNotFoundError:
                    continue  # holder released between check and read: retry
                if held == token:
                    self._lease_held = True  # our own lease (lost flag)
                    return
                try:
                    holder_pid = int(held.split(":", 1)[0])
                except ValueError:
                    holder_pid = -1
                if holder_pid > 0 and not _pid_alive(holder_pid):
                    # Crashed holder: steal once and retry the create.
                    try:
                        os.remove(self._lease_path)
                    except FileNotFoundError:
                        pass
                    continue
                raise RollupOwnershipError(
                    f"rollup store {self.store_dir!r} is owned by live "
                    f"maintainer {held!r}; one writer per store "
                    f"(release_lease() the other, or use a separate store)"
                )
        raise RollupOwnershipError(
            f"could not acquire lease for rollup store {self.store_dir!r}"
        )

    def release_lease(self) -> None:
        if not self._lease_held:
            return
        self._lease_held = False
        try:
            os.remove(self._lease_path)
        except FileNotFoundError:
            pass

    def __del__(self) -> None:  # pragma: no cover - GC timing
        try:
            self.release_lease()
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass

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

    def _read_complete(self, spark: SparkSession, path: str) -> DataFrame | None:
        """Read ``path`` only if it holds a COMMITTED parquet write.

        ``_SUCCESS`` is Spark's commit marker: an interrupted overwrite
        deletes it first and re-creates it last, so its presence means the
        directory is a complete, readable snapshot.  A genuine read failure
        on a committed directory raises instead of being swallowed (a silent
        ``None`` here would reset the rollup history — ADVICE r1)."""
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            return None
        return spark.read.parquet(path)

    def read_store(self, spark: SparkSession) -> DataFrame | None:
        """The committed rollup: the main store, else the ``.tmp`` copy
        (main store died mid-overwrite — ``.tmp`` was fully written first
        and holds the same merged content), else None (no batch yet)."""
        df = self._read_complete(spark, self.store_dir)
        if df is None:
            df = self._read_complete(spark, self.store_dir + ".tmp")
        return df

    def merge(self, existing: DataFrame | None, partial: DataFrame) -> DataFrame:
        """Combine partial aggregates with the stored rollup (exact for
        decomposable aggregates)."""
        if existing is not None and "merged_batch_id" in existing.columns:
            existing = existing.drop("merged_batch_id")
        merged = partial if existing is None else existing.unionByName(partial)
        return merged.groupBy("win_start", "node").agg(
            F.sum("n_frames").alias("n_frames"),
            F.sum("sum_v0").alias("sum_v0"),
            F.min("min_v0").alias("min_v0"),
            F.max("max_v0").alias("max_v0"),
        )

    def last_merged_batch(self, store: DataFrame | None) -> int | None:
        """Highest batch_id already folded into ``store`` (None if empty).

        The id rides IN the parquet data (constant column), so it commits
        atomically with the merge itself — a sidecar file could desync."""
        if store is None or "merged_batch_id" not in store.columns:
            return None
        row = store.agg(F.max("merged_batch_id")).first()
        return None if row is None else row[0]

    def process_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch body — idempotent under at-least-once replay.

        Structured Streaming re-runs a micro-batch whose checkpoint commit
        didn't land; merging its partials twice would double-count.  Each
        store snapshot carries the batch_id it merged through, so a replay
        of an already-merged batch only repairs the store location and
        returns.  At 100 TB this batch_id becomes the MERGE INTO idempotency
        key on a Delta/Iceberg rollup table."""
        self.acquire_lease()
        spark = df.sparkSession
        final_committed = os.path.exists(os.path.join(self.store_dir, "_SUCCESS"))
        existing = self.read_store(spark)
        last = self.last_merged_batch(existing)
        if last is not None and batch_id <= last:
            if not final_committed and existing is not None:
                # Replayed after the .tmp write but before the final
                # overwrite committed: promote the recovered copy.
                existing.write.mode("overwrite").parquet(self.store_dir)
            return
        if not final_committed and existing is not None:
            # Recovered from .tmp: commit it to the main store first, so the
            # merge below never reads the directory it is about to rewrite.
            existing.write.mode("overwrite").parquet(self.store_dir)
            existing = spark.read.parquet(self.store_dir)
        partial = self.aggregate_batch(df)
        merged = self.merge(existing, partial).withColumn(
            "merged_batch_id", F.lit(batch_id).cast("long")
        )
        # Rewrite-with-temp keeps a committed copy readable at every instant;
        # a lakehouse MERGE INTO replaces this dance at scale.
        tmp = self.store_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.store_dir)
