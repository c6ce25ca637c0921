"""Structured Streaming layer: windows, stateful joins, exactly-once sink,
metrics, lineage.

Replaces the reference's transaction/ack model
(/root/reference/internal/message/transaction.go:20-38) wholesale with
Spark's checkpoint/WAL + idempotent foreachBatch sink (exactly-once — a
strict upgrade over the reference's at-least-once).
"""

from bento_spark.streaming.windows import session_windowed, sliding_windowed, tumbling_windowed
from bento_spark.streaming.joins import stream_stream_join
from bento_spark.streaming.sink import IdempotentParquetSink, route_outputs
from bento_spark.streaming.metrics import BentoMetricsListener

__all__ = [
    "tumbling_windowed",
    "sliding_windowed",
    "session_windowed",
    "stream_stream_join",
    "IdempotentParquetSink",
    "route_outputs",
    "BentoMetricsListener",
]
