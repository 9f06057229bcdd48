"""Streaming layer: the reference's main loop (C1) as Structured Streaming
queries — pipeline assembly, stateful ops, config-driven lifecycle."""

from oem_gateway_spark.streaming.pipeline import GatewayPipeline  # noqa: F401
