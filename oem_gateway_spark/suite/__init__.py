"""Query suite: every operator from SURVEY.md §2 (and the §2.6 engine
surface) as a named (spark_query, duckdb_oracle) pair.

``__spark_entry__.py`` exposes this registry to the driver; tests replay the
same compare locally at sf0.001.
"""

from oem_gateway_spark.suite.registry import REGISTRY, QuerySpec, query  # noqa: F401

# Import suite modules for their registration side effects.
from oem_gateway_spark.suite import gateway  # noqa: F401,E402
from oem_gateway_spark.suite import relational  # noqa: F401,E402
from oem_gateway_spark.suite import llm  # noqa: F401,E402
from oem_gateway_spark.suite import streaming_batch  # noqa: F401,E402
from oem_gateway_spark.suite import udf_surface  # noqa: F401,E402
from oem_gateway_spark.suite import scalar_extra  # noqa: F401,E402
from oem_gateway_spark.suite import relational_extra  # noqa: F401,E402
from oem_gateway_spark.suite import udtf_cogroup  # noqa: F401,E402
