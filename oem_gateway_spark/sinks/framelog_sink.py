"""Gateway frame-log SINK as a Spark 4 Python streaming DataSource writer.

Ref: oemgatewaybuffer.py :: OemGatewayEmoncmsBuffer._send_data (~l.80):
the reference's delivery half serializes buffered rows and posts them with
an all-or-nothing acknowledgement ('ok') — a batch either lands or is
retried whole.  This module re-expresses that contract on the Spark 4
Python ``DataSourceStreamWriter`` API (the WRITE side of the Python
DataSource surface; the READ sides are sources/framelog_source.py (batch)
and sources/serial_source.py (streaming)):

- ``write(iterator)`` runs ON EXECUTORS, one call per partition per
  micro-batch: rows serialize to space-separated frame lines in a
  uniquely-named file, written tmp-then-rename so a killed task never
  leaves a half-visible file.  Returns a :class:`FrameLogCommitMessage`
  (file name + row count).
- ``commit(messages, batchId)`` runs ON THE DRIVER only after every task
  succeeded: the batch's file list lands in ``_commits/<batchId>.json``
  (atomic rename).  The manifest IS the reference's 'ok' ack — a file not
  named by a committed manifest does not exist to readers, so a retried
  or speculative task's orphan output is invisible, and a batch replayed
  after a crash simply re-commits its manifest (last writer wins, the
  replaced files become invisible orphans).  This is the same
  commit-log-scoped read discipline as Spark's own FileStreamSink
  `_spark_metadata`, implemented in ~40 lines of visible protocol.
- ``abort(messages, batchId)`` deletes whatever the failed batch's
  surviving tasks produced.
- :class:`FrameLogBatchWriter` is the BATCH half of the same API
  (``df.write.format("oem_framelog_sink")``): identical task protocol,
  one whole-save ``_commits/batch.json`` manifest.  Don't point a batch
  save and a streaming query at the SAME path — their manifests share
  the _commits dir and committed_files() would union them.

Scale: in local mode the executors share the driver's filesystem; on a
real cluster ``path`` must be shared storage (object store / NFS) exactly
like every file sink, or the write() body swaps the file for an HTTP
bulk POST per sinks/emoncms.py — the commit/abort protocol is transport-
independent, which is the point of witnessing it separately.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import time
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclasses.dataclass
class FrameLogCommitMessage(WriterCommitMessage):
    file: str
    rows: int


# Crash litter older than this is reclaimed on the next commit: a live
# write holds its .tmp for seconds (one micro-batch / one save), so an
# hour-old tmp can only be a killed task's or driver's leftover.
_TMP_MAX_AGE_SEC = 3600


def _sweep_stale_tmp(*dirs: str) -> None:
    now = time.time()
    for d in dirs:
        for tmp in glob.glob(os.path.join(d, ".*.tmp")):
            try:
                if now - os.path.getmtime(tmp) > _TMP_MAX_AGE_SEC:
                    os.remove(tmp)
            except OSError:
                pass  # concurrently removed


def _write_manifest(path: str, name: str, messages) -> None:
    """One manifest protocol for both halves: tmp-write + atomic rename
    into _commits/<name>.json; sweeps crash litter opportunistically
    (r11 review: .json.tmp / .log.tmp from killed processes were never
    reclaimed — invisible to readers but unbounded on a long-lived
    path)."""
    commits = os.path.join(path, "_commits")
    os.makedirs(commits, exist_ok=True)
    _sweep_stale_tmp(commits, os.path.join(path, "data"))
    files = [m.file for m in messages if m is not None]
    rows = sum(m.rows for m in messages if m is not None)
    tmp = os.path.join(commits, f".{name}.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"batchId": name, "files": files, "rows": rows}, f)
    os.rename(tmp, os.path.join(commits, f"{name}.json"))


def _iter_manifests(path: str):
    for mf in sorted(glob.glob(os.path.join(path, "_commits", "*.json"))):
        with open(mf) as f:
            yield json.load(f)


class FrameLogStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("oem_framelog_sink requires option 'path'")

    # -- executor side -----------------------------------------------------
    def write(self, iterator) -> FrameLogCommitMessage:
        from pyspark import TaskContext

        data_dir = os.path.join(self.path, "data")
        os.makedirs(data_dir, exist_ok=True)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.log"
        tmp = os.path.join(data_dir, f".{name}.tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(" ".join(str(v) for v in row) + "\n")
                n += 1
        os.rename(tmp, os.path.join(data_dir, name))
        return FrameLogCommitMessage(file=name, rows=n)

    # -- driver side -------------------------------------------------------
    def commit(self, messages, batchId: int) -> None:
        # Per-batch name: a replayed batch (crash recovery) re-commits
        # the SAME name, replacing its manifest — never double-counting.
        _write_manifest(self.path, str(batchId), messages)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, "data", m.file))
            except OSError:
                pass  # task died before rename; nothing became visible


class FrameLogBatchWriter(DataSourceWriter):
    """The BATCH write half of the same sink (``df.write.format(...)``):
    identical task protocol, SaveMode honored at the manifest layer
    (r11 review: the first version replaced the manifest regardless of
    mode, so two mode("append") saves silently lost the first save's
    rows): append writes a UNIQUE ``save-<uuid>.json`` manifest per
    save (the committed view unions saves), overwrite clears every
    existing manifest first (old data files become invisible orphans,
    same as a streaming batch re-commit)."""

    def __init__(self, options: dict, overwrite: bool):
        self._w = FrameLogStreamWriter(options)
        self.path = self._w.path
        self.overwrite = overwrite

    def write(self, iterator) -> FrameLogCommitMessage:
        return self._w.write(iterator)

    def commit(self, messages) -> None:
        if self.overwrite:
            for mf in glob.glob(os.path.join(self.path, "_commits", "*.json")):
                try:
                    os.remove(mf)
                except OSError:
                    pass
        _write_manifest(self.path, f"save-{uuid.uuid4().hex}", messages)

    def abort(self, messages) -> None:
        self._w.abort(messages, batchId=-1)


class FrameLogSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "oem_framelog_sink"

    def streamWriter(self, schema, overwrite) -> FrameLogStreamWriter:
        return FrameLogStreamWriter(self.options)

    def writer(self, schema, overwrite) -> FrameLogBatchWriter:
        return FrameLogBatchWriter(self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(FrameLogSinkDataSource)


def committed_files(path: str) -> list[str]:
    """The exactly-once read view: ONLY files named by a committed batch
    manifest exist; orphans in data/ (failed/retried/speculative tasks,
    or files replaced by a batch re-commit) are invisible."""
    return [
        os.path.join(path, "data", name)
        for man in _iter_manifests(path)
        for name in man["files"]
    ]


def committed_manifests(path: str) -> list[dict]:
    return list(_iter_manifests(path))
