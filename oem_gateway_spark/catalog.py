"""Test-data catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

Scale note: at 100 TB these would be partitioned parquet/iceberg tables
(events by date, lineitem by ship-month); ``spark.read.parquet`` on a
directory picks up partition pruning automatically — nothing here changes
except the path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Older testdata generations stored events.ts as TIMESTAMP(NANOS),
    which Spark's parquet reader rejects unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set (current generations
    use TIMESTAMP_NTZ and don't need it — kept for backward compat; see
    :func:`normalize_event_ts`).  The conf is runtime-settable, and callers
    (the correctness driver in particular) may hand us a bare SparkSession
    that never went through ``session.get_spark`` — so assert it here,
    immediately before any read that could touch events."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events ``ts`` column to TIMESTAMP (TIMESTAMP_LTZ)
    regardless of how the parquet file encodes it.  The testdata generator
    has shipped it as TIMESTAMP(NANOS) (read as long under nanosAsLong) and
    as TIMESTAMP(isAdjustedToUTC=false) (read as TIMESTAMP_NTZ); event-time
    operators (withWatermark, unix_millis) require plain TIMESTAMP.  The
    session timezone is pinned UTC (session.py), so the NTZ->LTZ cast is
    deterministic and matches DuckDB's epoch_ms on the same file."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        # nanos-as-long; values are exact microseconds, conversion lossless.
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast(TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
