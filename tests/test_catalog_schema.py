"""Schema-drift canary (VERDICT r3 #9): the driver regenerates testdata
between rounds and has already shipped events.ts as TIMESTAMP(NANOS)
(round<=2) and TIMESTAMP(isAdjustedToUTC=false) / TIMESTAMP_NTZ (round 3).
Event-time operators (withWatermark, unix_millis) hard-require TIMESTAMP,
so the catalog must normalize whatever encoding arrives.  This test fails
loudly in-round on the next silent regeneration instead of at the driver.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import TimestampType

from oem_gateway_spark.catalog import load_table

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.exists(os.path.join(d, "events.parquet"))
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType == TimestampType(), (
        f"{sf_dir}: events.ts loaded as {df.schema['ts'].dataType}; "
        "catalog.normalize_event_ts must cover this encoding"
    )


def test_events_stream_ts_is_timestamp(spark):
    from oem_gateway_spark.suite.streaming_batch import _events_stream

    stream = _events_stream(spark, SF_DIRS[0])
    assert stream.schema["ts"].dataType == TimestampType()
