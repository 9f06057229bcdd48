"""Helpers over ``df.explain('formatted')`` output for plan assertions.

At 100 TB the difference between a correct plan and a fast plan is visible
right here: PushedFilters on the parquet scan, BroadcastHashJoin for dims,
Exchange count = the number of shuffles you actually pay for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def num_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (BroadcastExchange excluded): the count
    of shuffles the plan actually pays for."""
    text = explain_str(df)
    return len(re.findall(r"\(\d+\) Exchange\b", text))


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))
