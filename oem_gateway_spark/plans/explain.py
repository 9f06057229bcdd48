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


def _jchildren(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def innermost_join_leaf_names(df: DataFrame) -> list[str]:
    """Leaf-relation descriptions under the FIRST bottom-most Join of the
    optimized logical plan (a Join with no Join descendant).

    Walks the actual plan TREE instead of matching table-name substrings in
    the plan string (r7 ADVICE: names also appear in pushed-filter and
    file-listing annotations, so string positions can pass or fail for
    unrelated reasons).  Each returned entry is the first line of a leaf
    node's string form — for catalog relations that line carries the table
    identifier; callers substring-match their table names against it.
    """
    root = df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001

    def joins(node):
        found = []
        if node.nodeName() == "Join":
            found.append(node)
        for c in _jchildren(node):
            found.extend(joins(c))
        return found

    def leaves(node):
        ch = _jchildren(node)
        if not ch:
            return [node]
        return [leaf for c in ch for leaf in leaves(c)]

    all_joins = joins(root)
    inner = [j for j in all_joins if len(joins(j)) == 1]  # only itself
    if not inner:
        return []
    return [leaf.toString().splitlines()[0] for leaf in leaves(inner[0])]
