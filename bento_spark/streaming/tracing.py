"""Tracing: pipeline/micro-batch spans with OTLP-JSON export.

Reference: per-component tracing spans exported over OTel
(/root/reference/internal/tracing/v2/otel.go; span events
PRODUCE/CONSUME/DELETE/ERROR in internal/bundle/tracing/events.go:12-19).

Spark-first mapping: the reference traces per MESSAGE; at 10^12 rows a
per-row span is its own data problem, so the span unit here is the
micro-batch / pipeline stage (the Spark unit of progress), with row counts
as span attributes — the same design OTel's own spark instrumentation uses.
Spans nest via an explicit context stack (driver-side orchestration only —
never in the row path).

Export: OTLP/JSON (the protocol's file/HTTP body shape — readable by any
OTel collector's file receiver). If the `opentelemetry` SDK is installed
the same spans can be replayed through it (`to_otel`); the sandbox does not
ship it, so that path is availability-gated exactly like kafka/avro.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Any


def _rand_id(n_bytes: int) -> str:
    return os.urandom(n_bytes).hex()


@dataclass
class Span:
    trace_id: str
    span_id: str
    parent_id: str | None
    name: str
    start_ns: int
    end_ns: int | None = None
    attrs: dict[str, Any] = field(default_factory=dict)
    status: str = "OK"
    events: list[dict] = field(default_factory=list)


class Tracer:
    """Driver-side tracer: `with tracer.span("stage", rows=n): ...`."""

    def __init__(self, service_name: str = "bento-spark"):
        self.service_name = service_name
        self.spans: list[Span] = []
        self._stack: list[Span] = []
        self._lock = threading.Lock()

    def span(self, name: str, **attrs):
        tracer = self

        class _Ctx:
            def __enter__(self):
                parent = tracer._stack[-1] if tracer._stack else None
                self.s = Span(
                    trace_id=parent.trace_id if parent else _rand_id(16),
                    span_id=_rand_id(8),
                    parent_id=parent.span_id if parent else None,
                    name=name,
                    start_ns=time.time_ns(),
                    attrs=dict(attrs),
                )
                tracer._stack.append(self.s)
                return self.s

            def __exit__(self, exc_type, exc, tb):
                self.s.end_ns = time.time_ns()
                if exc is not None:
                    self.s.status = "ERROR"
                    self.s.events.append({"name": "exception", "attrs": {"message": str(exc)}})
                tracer._stack.pop()
                with tracer._lock:
                    tracer.spans.append(self.s)
                return False

        return _Ctx()

    def event(self, name: str, **attrs) -> None:
        """PRODUCE/CONSUME/DELETE/ERROR-style event on the current span
        (events.go:12-19)."""
        if self._stack:
            self._stack[-1].events.append({"name": name, "attrs": attrs})

    def batch_spans_from(self, listener) -> None:
        """One span per recorded micro-batch (BentoMetricsListener), with
        the reference metric names as attributes and lineage as events."""
        with self.span("streaming-query"):
            root = self._stack[-1]
            for b in listener.batches:
                s = Span(
                    trace_id=root.trace_id,
                    span_id=_rand_id(8),
                    parent_id=root.span_id,
                    name=f"micro-batch-{b.batch_id}",
                    start_ns=time.time_ns(),
                    end_ns=time.time_ns(),
                    attrs={
                        "input_received": b.input_received,
                        "output_sent": b.output_sent,
                        "state_rows_total": b.state_rows_total,
                        "watermark": b.watermark,
                    },
                    events=[{"name": "CONSUME", "attrs": src} for src in b.lineage],
                )
                with self._lock:
                    self.spans.append(s)

    # -- export --------------------------------------------------------------
    def to_otlp_json(self) -> dict:
        """OTLP/JSON resourceSpans body (file-exporter shape)."""

        def attr_kv(k: str, v: Any) -> dict:
            if isinstance(v, bool):
                val = {"boolValue": v}
            elif isinstance(v, int):
                val = {"intValue": str(v)}
            elif isinstance(v, float):
                val = {"doubleValue": v}
            else:
                val = {"stringValue": "" if v is None else str(v)}
            return {"key": k, "value": val}

        with self._lock:
            spans = [
                {
                    "traceId": s.trace_id,
                    "spanId": s.span_id,
                    **({"parentSpanId": s.parent_id} if s.parent_id else {}),
                    "name": s.name,
                    "startTimeUnixNano": str(s.start_ns),
                    "endTimeUnixNano": str(s.end_ns or s.start_ns),
                    "attributes": [attr_kv(k, v) for k, v in s.attrs.items()],
                    "status": {"code": 2 if s.status == "ERROR" else 1},
                    "events": [
                        {
                            "name": e["name"],
                            "timeUnixNano": str(s.start_ns),
                            "attributes": [attr_kv(k, v) for k, v in e["attrs"].items()],
                        }
                        for e in s.events
                    ],
                }
                for s in self.spans
            ]
        return {
            "resourceSpans": [
                {
                    "resource": {
                        "attributes": [attr_kv("service.name", self.service_name)]
                    },
                    "scopeSpans": [{"scope": {"name": "bento_spark"}, "spans": spans}],
                }
            ]
        }

    def export_file(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_otlp_json(), f, indent=2)


def otel_available() -> bool:
    try:
        import opentelemetry  # noqa: F401

        return True
    except ImportError:
        return False


def to_otel(tracer: Tracer, endpoint: str | None = None, exporter=None):
    """Replay recorded spans through the real OTel SDK, preserving
    trace/span ids, parent links, timestamps, events, and error status.

    Availability-gated (the opentelemetry-sdk package is an optional
    dependency, like the kafka/avro jars). `endpoint` wires the OTLP gRPC
    exporter when opentelemetry-exporter-otlp is installed; `exporter`
    accepts any SpanExporter (tests pass InMemorySpanExporter); with
    neither, spans print via ConsoleSpanExporter. Returns the SDK
    TracerProvider (callers may force_flush/shutdown again)."""
    if not otel_available():
        raise RuntimeError(
            "to_otel requires the opentelemetry-sdk package; "
            "pip install opentelemetry-sdk opentelemetry-exporter-otlp"
        )
    from opentelemetry.sdk.resources import Resource
    from opentelemetry.sdk.trace import TracerProvider
    from opentelemetry.sdk.trace.export import ConsoleSpanExporter, SimpleSpanProcessor
    from opentelemetry.sdk.trace.id_generator import IdGenerator
    from opentelemetry.trace import (
        NonRecordingSpan,
        SpanContext,
        Status,
        StatusCode,
        TraceFlags,
        set_span_in_context,
    )

    if exporter is None:
        if endpoint is not None:
            from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (
                OTLPSpanExporter,
            )

            exporter = OTLPSpanExporter(endpoint=endpoint)
        else:
            exporter = ConsoleSpanExporter()

    class _ReplayIds(IdGenerator):
        """The SDK mints ids via its IdGenerator; feeding it the recorded
        ids keeps the replayed trace graph identical to the recording."""

        trace_id = 0
        span_id = 0

        def generate_trace_id(self) -> int:
            return self.trace_id

        def generate_span_id(self) -> int:
            return self.span_id

    ids = _ReplayIds()
    provider = TracerProvider(
        resource=Resource.create({"service.name": tracer.service_name}),
        id_generator=ids,
    )
    provider.add_span_processor(SimpleSpanProcessor(exporter))
    sdk_tracer = provider.get_tracer("bento_spark")
    for s in tracer.spans:
        ids.trace_id = int(s.trace_id, 16)
        ids.span_id = int(s.span_id, 16)
        ctx = None
        if s.parent_id:
            parent_sc = SpanContext(
                int(s.trace_id, 16), int(s.parent_id, 16),
                is_remote=False, trace_flags=TraceFlags(TraceFlags.SAMPLED),
            )
            ctx = set_span_in_context(NonRecordingSpan(parent_sc))
        span = sdk_tracer.start_span(
            s.name, context=ctx, start_time=s.start_ns,
            attributes={k: v for k, v in s.attrs.items() if v is not None},
        )
        for ev in s.events:
            span.add_event(ev["name"], ev.get("attrs") or {})
        if s.status == "ERROR":
            span.set_status(Status(StatusCode.ERROR))
        span.end(end_time=s.end_ns or s.start_ns)
    provider.force_flush()
    return provider
