"""C6 observability: the reference's per-frame debug logging + counters as
engine-native metrics.

Two mechanisms:
  - ``observe()`` named metrics on the streaming DataFrame — rows in /
    rejected per micro-batch, surfaced in each QueryProgressEvent (no extra
    pass over the data; Catalyst computes them inline).
  - ``GatewayMetricsListener``: a StreamingQueryListener accumulating rows
    processed / batch durations per query — the gateway's ops dashboard.

Ref: oemgateway.py logging setup (~l.340), per-frame debug lines throughout;
the engine upgrade is structured metrics instead of log-grepping.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def with_frame_metrics(classified: DataFrame) -> DataFrame:
    """Attach named observe() metrics to a classified frame stream:
    n_frames, n_rejected, per-batch.  Read them from
    ``QueryProgressEvent.progress.observedMetrics['gateway']``."""
    return classified.observe(
        "gateway",
        F.count(F.lit(1)).alias("n_frames"),
        F.count(F.when(F.col("reject_reason") != "valid", 1)).alias("n_rejected"),
    )


@dataclass
class QueryStats:
    batches: int = 0
    rows: int = 0
    total_batch_ms: float = 0.0
    observed: dict[str, int] = field(default_factory=dict)


class GatewayMetricsListener(StreamingQueryListener):
    """Accumulates per-query throughput stats from progress events."""

    def __init__(self) -> None:
        self.stats: dict[str, QueryStats] = defaultdict(QueryStats)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        s = self.stats[p.name or p.id]
        s.batches += 1
        s.rows += p.numInputRows
        s.total_batch_ms += p.batchDuration
        for name, row in (p.observedMetrics or {}).items():
            if name == "gateway":
                s.observed["n_frames"] = s.observed.get("n_frames", 0) + (
                    row["n_frames"] or 0
                )
                s.observed["n_rejected"] = s.observed.get("n_rejected", 0) + (
                    row["n_rejected"] or 0
                )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
