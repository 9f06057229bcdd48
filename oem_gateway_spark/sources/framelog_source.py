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
    DataSourceStreamReader,
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

    def _layout_filterable(self) -> bool:
        """Pushdown is only safe when EVERY file's shard id parses from
        its NAME.  The index fallback in :func:`_shard_id` keeps foreign
        layouts scannable, but a sorted-glob INDEX shifts when files are
        added or removed between plans — and Spark never re-checks an
        accepted filter, so pruning against a shifted index would
        silently return wrong rows (r11 ADVICE).  For such layouts every
        filter is yielded back: Spark evaluates it post-scan against the
        shard values the SAME scan emitted, which is consistent by
        construction."""
        files = glob.glob(os.path.join(self._path, "*.log"))
        return bool(files) and all(
            re.search(r"(\d+)\.log$", os.path.basename(f)) for f in files
        )

    # -- planning side ------------------------------------------------------
    def pushFilters(self, filters):
        """Accept shard-column EqualTo/In (and the free IsNotNull); yield
        everything else back for Spark to evaluate post-scan.  On an
        index-fallback layout (any file not named *<digits>.log) nothing
        is accepted — see :meth:`_layout_filterable`."""
        self._pending = None  # fresh plan: discard any prior plan's state
        if not self._layout_filterable():
            yield from filters
            return
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


def _line_frontier(path: str, lo: int = 0) -> int:
    """Byte position just past the file's LAST newline (>= lo), scanning
    BACKWARD in 64 KiB windows from EOF — the complete-line frontier a
    planned offset may advance to.  O(tail) per poll, never O(file)."""
    size = os.path.getsize(path)
    win = 1 << 16
    hi = size
    with open(path, "rb") as f:
        while hi > lo:
            start = max(lo, hi - win)
            f.seek(start)
            chunk = f.read(hi - start)
            nl = chunk.rfind(b"\n")
            if nl >= 0:
                return start + nl + 1
            hi = start
    return lo


class FrameLogStreamReader(DataSourceStreamReader):
    """Partition-PLANNED streaming tail of a sharded capture directory —
    the non-Simple half of the Python streaming-read API.

    The serial source (sources/serial_source.py) is a
    ``SimpleDataSourceStreamReader``: ONE read() cursor, one partition
    per micro-batch — right for one device.  A capture DIRECTORY is
    many devices appending concurrently (R1's fan-in), so this reader
    implements the planned API instead: ``latestOffset()`` snapshots
    every shard file's complete-line frontier on the driver,
    ``partitions(start, end)`` returns ONE InputPartition PER GROWN
    FILE — executors read the byte ranges in parallel within a single
    micro-batch — and ``read(partition)`` re-reads exactly the planned
    [start, end) range, which makes recovery replay deterministic by
    construction (same bytes -> same rows).

    Offsets are ``{file_name: consumed_bytes}`` dicts (JSON-checkpointed
    by Spark).  Frontiers stop at the last newline, so a mid-line tail
    stays unconsumed until its newline arrives — the reference's
    accumulate-until-'\\r\\n' contract (S1), now per shard.  New files
    appearing between polls simply join the next snapshot (offset 0).

    Shard ids must parse from file names (shard_<K>.log): a sorted-glob
    index is NOT stable while files are appearing, so foreign layouts
    raise at planning instead of emitting drifting ids (same reasoning
    as the batch reader's pushdown gate).

    Scale: parallelism per micro-batch = number of concurrently-growing
    shard files; driver planning cost is one stat + tail-window read
    per file per trigger.  The Python hop yields raw lines only —
    tokenize/cast stay JVM-side."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("oem_framelog: 'path' option is required")
        self._path = path

    def _files(self) -> list[str]:
        files = sorted(glob.glob(os.path.join(self._path, "*.log")))
        bad = [
            os.path.basename(f)
            for f in files
            if not re.search(r"(\d+)\.log$", os.path.basename(f))
        ]
        if bad:
            raise ValueError(
                f"oem_framelog streaming: shard id must parse from the "
                f"file name (shard_<K>.log); offending files: {bad}"
            )
        return files

    def initialOffset(self) -> dict:
        return {}

    def latestOffset(self) -> dict:
        # Monotone per file: frontier(f) only grows as bytes append.
        return {
            os.path.basename(f): _line_frontier(f) for f in self._files()
        }

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # Capture files are append-only: a file that shrank or vanished
        # between offsets means bytes the checkpoint says were consumed
        # no longer exist — fail loudly (silent skip = silent data loss).
        gone = [
            n
            for n, lo in start.items()
            if n not in end or end[n] < lo
        ]
        if gone:
            raise ValueError(
                f"oem_framelog streaming: capture files shrank or vanished "
                f"between offsets (append-only contract): {sorted(gone)}"
            )
        parts = []
        for name, hi in sorted(end.items()):
            lo = start.get(name, 0)
            if hi > lo:
                parts.append(
                    InputPartition(
                        (_shard_id(name, -1), os.path.join(self._path, name), lo, hi)
                    )
                )
        return parts

    def read(self, partition: InputPartition):
        if partition is None:  # zero-partition batch (no file grew)
            return
        shard, path, lo, hi = partition.value
        with open(path, "rb") as f:
            f.seek(lo)
            chunk = f.read(hi - lo)
        if len(chunk) != hi - lo:
            # partitions() can only compare checkpointed offset DICTS; a
            # file truncated between planning and execution (or during a
            # crash-recovery replay) surfaces here — short data is data
            # LOSS, never a quiet partial batch (r12 review).
            raise ValueError(
                f"oem_framelog streaming: {path} returned {len(chunk)} of "
                f"the planned [{lo}, {hi}) bytes — capture file shrank "
                f"(append-only contract)"
            )
        for raw in chunk.split(b"\n")[:-1]:
            ln = raw.decode("utf-8", errors="replace").rstrip("\r")
            if ln.strip():
                yield (shard, ln)

    def commit(self, end: dict) -> None:
        pass  # the capture files are the archive; nothing to release


class FrameLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "oem_framelog"

    def schema(self) -> str:
        return "shard INT, line STRING"

    def reader(self, schema: StructType) -> DataSourceReader:
        return FrameLogReader(self.options)

    def streamReader(self, schema: StructType) -> FrameLogStreamReader:
        return FrameLogStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FrameLogDataSource)
