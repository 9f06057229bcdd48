"""Registry mapping query name -> (spark callable, optional DuckDB oracle).

Contract (driver): callable(spark, sf_dir) -> DataFrame; oracle is ANSI SQL
DuckDB runs on the same parquet registered as views.  Column names/types must
match between the two — alias every computed column identically on both
sides; cast count/sum-of-int outputs to BIGINT in the oracle (DuckDB sums to
HUGEINT otherwise).
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from oem_gateway_spark.session import ensure_runtime_conf

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver records weaker rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a suite query (and its DuckDB oracle twin)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver may pass a bare session (200 shuffle partitions, no
            # AQE, unpinned timezone, no nanos conf): pin the runtime-settable
            # conf so results and plans match get_spark sessions exactly.
            ensure_runtime_conf(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(name, wrapped, oracle, doc=(fn.__doc__ or "").strip())
        return wrapped

    return deco
