"""Streaming sources: the reference's listeners re-expressed as Spark
sources (SURVEY §2.1).

  S1 serial  -> sources/serial_source.py: Python DataSource (Spark 4)
               wrapping pyserial when present, else line-file replay with
               byte-offset exactly-tracked progress.
  S2 socket  -> built-in ``readStream.format("socket")`` (same line-delimited
               semantics); helper in frames_source.py.
  S3 RFM2Pi  -> S1/S2 + the decode transforms (functions/frames.py).
"""

from oem_gateway_spark.sources.frames_source import (  # noqa: F401
    file_frame_stream,
    socket_frame_stream,
)
