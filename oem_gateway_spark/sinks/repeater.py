"""R2 repeater: stream -> device TX path.

Ref: oemgatewaylistener.py :: OemGatewayRFM2PiListenerRepeater (~l.300-360):
complete lines received on an extra TCP socket are written out the serial
port (radio transmit).

Engine mapping: a foreachBatch sink writing line frames to the device
transport, ordered deterministically within the micro-batch.  The transport
is injectable (a pyserial write in production, a file in tests)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class RepeaterSink:
    """foreachBatch writer: each row's ``line`` goes to the device in
    (order_col) order with CRLF framing (the reference's serial write)."""

    def __init__(
        self,
        write: Callable[[str], None],
        line_col: str = "line",
        order_col: str | None = None,
    ):
        self.write = write
        self.line_col = line_col
        self.order_col = order_col
        self.sent: int = 0

    def process_batch(self, df: DataFrame, batch_id: int) -> None:
        sel = df.select(self.line_col, *([self.order_col] if self.order_col else []))
        if self.order_col:
            sel = sel.orderBy(self.order_col)
        for r in sel.collect():  # device TX is inherently serial (one port)
            self.write(r[self.line_col] + "\r\n")
            self.sent += 1
