"""oem_gateway_spark — a PySpark-native analytics/ETL engine with the query
and data-processing capabilities of ``lafrech/oem_gateway``, rebuilt
Spark-first (DataFrame / Spark SQL / Structured Streaming).

The reference (see SURVEY.md) is a single-threaded streaming gateway:
listeners (serial/RFM2Pi/TCP) -> parse/validate/decode -> timestamp ->
fan-out -> batched at-least-once HTTP delivery.  This engine re-expresses
that dataflow on Structured Streaming and adds the full relational surface
Spark provides, plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for 100 TB.

Layout:
  session      - SparkSession factory with scale-appropriate defaults
  catalog      - testdata table loading / view registration
  functions/   - scalar & array function layers (frames, hashing, text, vectors)
  operators/   - composite DataFrame operators (dedup, similarity, relational)
  sources/     - streaming sources (socket frames, file replay, serial stub)
  sinks/       - delivery sinks (emoncms-style HTTP foreachBatch, dead-letter)
  streaming/   - gateway pipeline assembly + stateful streaming ops
  plans/       - plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"

from oem_gateway_spark.session import get_spark  # noqa: F401
from oem_gateway_spark.catalog import TABLES, load_table, register_views  # noqa: F401
