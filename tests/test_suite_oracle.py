"""Run every registered suite query against its DuckDB oracle at sf0.001 —
a local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare


def _registry():
    from oem_gateway_spark.suite import REGISTRY

    return REGISTRY


@pytest.mark.parametrize("name", sorted(_registry().keys()))
def test_query_matches_oracle(name, spark, duck):
    spec = _registry()[name]
    sdf = spec.fn(spark, SF_ORACLE).toPandas()
    assert len(sdf) >= 0
    if spec.oracle is None:
        assert len(sdf) > 0, f"{name}: rows-only query returned empty"
        return
    ddf = duck.sql(spec.oracle).df()
    errs = compare(sdf, ddf, name)
    assert not errs, "\n".join(errs)


def test_no_conf_witness_violations_after_replay():
    """The full build->act replay above must never trip the conf-witness
    guard (q_bloom_prune / q_cbo_join_reorder executed out of order)."""
    from oem_gateway_spark.suite.registry import CONF_WITNESS_VIOLATIONS

    assert CONF_WITNESS_VIOLATIONS == []
