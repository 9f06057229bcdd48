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


def shared_python_tables(df: DataFrame) -> list[str]:
    """Python-DataSource tables referenced MORE THAN ONCE by one plan.

    The fresh-``load()``-per-plan contract
    (sources/framelog_source.py:57): a Python DataSource relation holds
    ONE reader, and on Spark 4.1.2 its last-built scan leaks into
    sibling references of the same relation (measured: filtered-union-
    full undercounts — pinned in
    test_framelog_pushdown_shared_relation_hazard_and_contract).  This
    walker makes the contract MECHANICAL: it returns the
    ``PythonTable`` instances (by name + JVM identity) that appear
    under two or more DataSourceV2Relation nodes of the ANALYZED plan.
    Dataset references clone the relation NODE per use, but one
    ``load()`` shares one underlying table object, while two
    ``load()`` calls make two — so table identity is exactly
    "same load() referenced twice" (probed on 4.1.2: shared load gave
    one identityHashCode twice, fresh loads gave two distinct ones).

    The full-registry oracle replay calls this on every suite query, so
    a FUTURE query violating the contract fails loudly in the suite
    instead of returning silently wrong rows (r11 VERDICT #2).
    """
    jvm = df._sc._jvm  # noqa: SLF001
    seen: dict[int, list] = {}  # identityHashCode -> table refs (collisions!)
    dups: list[str] = []

    def walk(node) -> None:
        if node.getClass().getName().endswith("DataSourceV2Relation"):
            table = node.table()
            if table.getClass().getName().endswith("PythonTable"):
                ident = jvm.java.lang.System.identityHashCode(table)
                name = f"{table.name()}@{ident}"
                # identityHashCode is a 32-bit NON-unique hash: verify a
                # repeat is the SAME object (reference equals) so two
                # distinct fresh loads colliding on the hash never flag
                # an innocent plan (r12 review).
                if any(t.equals(table) for t in seen.get(ident, [])):
                    if name not in dups:
                        dups.append(name)
                else:
                    seen.setdefault(ident, []).append(table)
        for c in _jchildren(node):
            walk(c)
        # Plans nested in EXPRESSIONS (scalar/EXISTS/IN subqueries) are
        # not children(); a same-load() reference hiding in one is the
        # same scan-state hazard (r12 review — probed: the subquery walk
        # finds the shared PythonTable, including via a temp view over
        # one load()).
        sub = node.subqueries()
        for i in range(sub.size()):
            walk(sub.apply(i))

    walk(df._jdf.queryExecution().analyzed())  # noqa: SLF001
    return dups
