"""Batch Python DataSource for gateway frame LOGS: replay a captured
device log (one serial frame per line) as a partitioned batch read.

The streaming side of this API is `serial_source.py` (SimpleDataSource
StreamReader over a live device file); this is its BATCH sibling — the
"process yesterday's log" path.  Reference parity: the gateway's serial
listener (SURVEY.md §2.1 S1, reconstructed ~l.60) only ever tails the
device; replaying an archived log through the identical parse chain is
the engine-beyond-reference capability the Spark 4 Python DataSource API
exists for.

Scale notes:
- one InputPartition per log FILE: Spark schedules files across
  executors, so a sharded 100 TB log archive reads with full
  parallelism (shard the capture, not the reader);
- the reader yields raw lines only — all parsing stays in the JVM
  (the P1-P6 chain is codegen'd column work), so the Python hop is a
  line-iterator, not a parser;
- blank lines are dropped at the source (the device emits keepalive
  newlines; SURVEY §2.2 P1);
- FILTER PUSHDOWN (Spark 4.1 `pushFilters`): the schema exposes the
  capture shard id as a real column, and EqualTo/In predicates on it
  are ACCEPTED by the reader — `partitions()` then returns only the
  matching shard files, so a pushed shard filter is PARTITION PRUNING
  executed before a single byte is read (the Python-source analogue of
  parquet partition pruning).  Accepted filters are never re-checked
  by Spark, so the oracle hash proves the reader actually enforced
  them — a pruning bug surfaces as extra rows, not silent slowness.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
    IsNotNull,
)
from pyspark.sql.types import StructType


def _shard_id(path: str, index: int) -> int:
    """Shard id from the capture file name (shard_K.log); falls back to
    the sorted-glob index for foreign layouts so every file always has
    a stable, filterable id."""
    m = re.search(r"(\d+)\.log$", os.path.basename(path))
    return int(m.group(1)) if m else index


class FrameLogReader(DataSourceReader):
    """CONSUME-ON-PARTITIONS pushdown protocol: Spark reuses ONE reader
    instance across every plan built from the same load() relation, and
    calls pushFilters only on plans that HAVE filters (measured on
    4.1.2: full -> filtered -> full re-counts gave 6000/1492/1492 with
    naive persistent state — the second full count silently inherited
    the previous plan's pruning, and two successive filtered plans
    intersected).  So pushFilters STASHES the accepted set and
    partitions() CONSUMES it: each pushFilters/partitions planning pair
    sees exactly its own plan's filters, and a filterless plan (no
    pushFilters call) sees none.  Driver planning of separate actions
    is sequential, which is what makes the pair atomic."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("oem_framelog: 'path' option is required")
        self._path = path
        self._pending: set[int] | None = None  # this PLAN's accepted set

    def __getstate__(self):
        # The accepted-filter set is PLAN-LOCAL: Spark re-pickles the
        # reader right after pushFilters (before partitions runs) and
        # stores it on the shared relation, so a pickled _pending would
        # resurface in the NEXT plan's planning worker.  Dropping it
        # from the pickle keeps it visible only to the same-process
        # pushFilters -> partitions pair.
        state = self.__dict__.copy()
        state["_pending"] = None
        return state

    # -- planning side ------------------------------------------------------
    def pushFilters(self, filters):
        """Accept shard-column EqualTo/In (and the free IsNotNull); yield
        everything else back for Spark to evaluate post-scan."""
        self._pending = None  # fresh plan: discard any prior plan's state
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("shard",):
                wanted = {int(f.value)}
            elif isinstance(f, In) and f.attribute == ("shard",):
                wanted = {int(v) for v in f.value}
            elif isinstance(f, IsNotNull) and f.attribute == ("shard",):
                continue  # every emitted row has a shard id; free accept
            else:
                yield f  # unsupported: Spark keeps it post-scan
                continue
            self._pending = (
                wanted if self._pending is None else self._pending & wanted
            )

    def partitions(self) -> list[InputPartition]:
        shards, self._pending = self._pending, None  # consume this plan's
        files = sorted(glob.glob(os.path.join(self._path, "*.log")))
        if not files:
            raise FileNotFoundError(
                f"oem_framelog: no *.log files under {self._path}"
            )
        parts = []
        for i, f in enumerate(files):
            sid = _shard_id(f, i)
            if shards is None or sid in shards:
                parts.append((sid, f))
        # A fully-pruned read (filter matches no shard) is an empty scan,
        # not an error: return zero partitions.
        return [InputPartition(p) for p in parts]

    # -- executor side ------------------------------------------------------
    def read(self, partition: InputPartition):
        if partition is None:
            # Spark synthesizes one None partition when partitions()
            # returned [] (a fully-pruned scan): emit nothing.
            return
        shard, path = partition.value
        with open(path, encoding="utf-8", errors="replace") as fh:
            for ln in fh:
                # CRLF-captured logs must not leak a trailing \r into the
                # last field (it would NULL the typed cast downstream),
                # and whitespace-only keepalive lines are blank too.
                ln = ln.rstrip("\r\n")
                if ln.strip():
                    yield (shard, ln)


class FrameLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "oem_framelog"

    def schema(self) -> str:
        return "shard INT, line STRING"

    def reader(self, schema: StructType) -> DataSourceReader:
        return FrameLogReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FrameLogDataSource)
