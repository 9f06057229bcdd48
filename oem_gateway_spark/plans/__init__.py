"""Plan inspection: assert the physical plans we designed for actually got
planned (pushdown reached the scan, dims broadcast, no stray shuffles)."""

from oem_gateway_spark.plans.explain import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    num_exchanges,
    pushed_filters,
)
