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
  newlines; SURVEY §2.2 P1).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class FrameLogReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("oem_framelog: 'path' option is required")
        self._path = path

    def partitions(self) -> list[InputPartition]:
        files = sorted(glob.glob(os.path.join(self._path, "*.log")))
        if not files:
            raise FileNotFoundError(
                f"oem_framelog: no *.log files under {self._path}"
            )
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        with open(partition.value, encoding="utf-8", errors="replace") as fh:
            for ln in fh:
                # CRLF-captured logs must not leak a trailing \r into the
                # last field (it would NULL the typed cast downstream),
                # and whitespace-only keepalive lines are blank too.
                ln = ln.rstrip("\r\n")
                if ln.strip():
                    yield (ln,)


class FrameLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "oem_framelog"

    def schema(self) -> str:
        return "line STRING"

    def reader(self, schema: StructType) -> DataSourceReader:
        return FrameLogReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FrameLogDataSource)
