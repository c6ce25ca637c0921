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


# -- OTLP/gRPC export (dependency-free) --------------------------------------
# The published opentelemetry-proto schema subset the trace exporter needs
# (trace/v1/trace.proto, common/v1/common.proto, resource/v1/resource.proto,
# collector/trace/v1/trace_service.proto), encoded with the repo's own
# protobuf codec and shipped over the from-scratch gRPC/HTTP2 wire layer —
# the reference exports through otel-go's otlptracegrpc; same wire contract.

_OTLP_COMMON = """
syntax = "proto3";
package opentelemetry.proto.common.v1;

message AnyValue {
  oneof value {
    string string_value = 1;
    bool bool_value = 2;
    int64 int_value = 3;
    double double_value = 4;
  }
}

message KeyValue {
  string key = 1;
  AnyValue value = 2;
}

message InstrumentationScope {
  string name = 1;
  string version = 2;
}
"""

_OTLP_RESOURCE = """
syntax = "proto3";
package opentelemetry.proto.resource.v1;

message Resource {
  repeated opentelemetry.proto.common.v1.KeyValue attributes = 1;
  uint32 dropped_attributes_count = 2;
}
"""

_OTLP_TRACE = """
syntax = "proto3";
package opentelemetry.proto.trace.v1;

message ResourceSpans {
  opentelemetry.proto.resource.v1.Resource resource = 1;
  repeated ScopeSpans scope_spans = 2;
  string schema_url = 3;
}

message ScopeSpans {
  opentelemetry.proto.common.v1.InstrumentationScope scope = 1;
  repeated Span spans = 2;
  string schema_url = 3;
}

message Span {
  enum SpanKind {
    SPAN_KIND_UNSPECIFIED = 0;
    SPAN_KIND_INTERNAL = 1;
    SPAN_KIND_SERVER = 2;
    SPAN_KIND_CLIENT = 3;
    SPAN_KIND_PRODUCER = 4;
    SPAN_KIND_CONSUMER = 5;
  }
  message Event {
    fixed64 time_unix_nano = 1;
    string name = 2;
    repeated opentelemetry.proto.common.v1.KeyValue attributes = 3;
  }
  bytes trace_id = 1;
  bytes span_id = 2;
  string trace_state = 3;
  bytes parent_span_id = 4;
  string name = 5;
  SpanKind kind = 6;
  fixed64 start_time_unix_nano = 7;
  fixed64 end_time_unix_nano = 8;
  repeated opentelemetry.proto.common.v1.KeyValue attributes = 9;
  repeated Event events = 11;
  Status status = 15;
}

message Status {
  string message = 2;
  StatusCode code = 3;
  enum StatusCode {
    STATUS_CODE_UNSET = 0;
    STATUS_CODE_OK = 1;
    STATUS_CODE_ERROR = 2;
  }
}
"""

_OTLP_SERVICE = """
syntax = "proto3";
package opentelemetry.proto.collector.trace.v1;

message ExportTraceServiceRequest {
  repeated opentelemetry.proto.trace.v1.ResourceSpans resource_spans = 1;
}

message ExportTraceServiceResponse {
  ExportTracePartialSuccess partial_success = 1;
}

message ExportTracePartialSuccess {
  int64 rejected_spans = 1;
  string error_message = 2;
}
"""

OTLP_EXPORT_PATH = ("/opentelemetry.proto.collector.trace.v1"
                    ".TraceService/Export")
_REQ = "opentelemetry.proto.collector.trace.v1.ExportTraceServiceRequest"
_RESP = "opentelemetry.proto.collector.trace.v1.ExportTraceServiceResponse"


def _otlp_registry():
    from bento_spark.operators.protobuf_codec import parse_proto

    reg = parse_proto(_OTLP_COMMON)
    parse_proto(_OTLP_RESOURCE, reg)
    parse_proto(_OTLP_TRACE, reg)
    parse_proto(_OTLP_SERVICE, reg)
    return reg


def _any_value(v: Any) -> dict:
    if isinstance(v, bool):
        return {"bool_value": v}
    if isinstance(v, int):
        return {"int_value": v}
    if isinstance(v, float):
        return {"double_value": v}
    return {"string_value": "" if v is None else str(v)}


def otlp_request(tracer: "Tracer") -> dict:
    """ExportTraceServiceRequest body for the tracer's recorded spans —
    mirrors to_otlp_json's mapping (bools/ints/floats typed, else
    stringified; status OK=1 / ERROR=2)."""

    def kvs(attrs: dict) -> list[dict]:
        return [{"key": k, "value": _any_value(v)} for k, v in attrs.items()]

    with tracer._lock:
        spans = [
            {
                "trace_id": bytes.fromhex(s.trace_id),
                "span_id": bytes.fromhex(s.span_id),
                **({"parent_span_id": bytes.fromhex(s.parent_id)}
                   if s.parent_id else {}),
                "name": s.name,
                "kind": "SPAN_KIND_INTERNAL",
                "start_time_unix_nano": s.start_ns,
                "end_time_unix_nano": s.end_ns or s.start_ns,
                "attributes": kvs(s.attrs),
                "events": [
                    {"time_unix_nano": s.start_ns, "name": e["name"],
                     "attributes": kvs(e["attrs"])}
                    for e in s.events
                ],
                "status": {"code": "STATUS_CODE_ERROR" if s.status == "ERROR"
                           else "STATUS_CODE_OK"},
            }
            for s in tracer.spans
        ]
    return {
        "resource_spans": [{
            "resource": {"attributes": kvs(
                {"service.name": tracer.service_name})},
            "scope_spans": [{"scope": {"name": "bento_spark"},
                             "spans": spans}],
        }]
    }


def export_otlp_grpc(tracer: "Tracer", endpoint: str) -> int:
    """Ship the recorded spans to an OTLP/gRPC collector at
    `host:port` (plaintext h2c). Raises on a non-zero grpc-status or on
    partial_success rejections; returns the span count exported."""
    import urllib.parse

    from bento_spark.operators.protobuf_codec import (
        decode_message,
        encode_message,
    )
    from bento_spark.streaming.grpc_wire import GrpcChannel

    if "//" not in endpoint:
        endpoint = "otlp://" + endpoint
    u = urllib.parse.urlparse(endpoint)
    reg = _otlp_registry()
    req = otlp_request(tracer)
    n = len(req["resource_spans"][0]["scope_spans"][0]["spans"])
    ch = GrpcChannel(u.hostname or "127.0.0.1", u.port or 4317)
    try:
        raw = ch.unary(OTLP_EXPORT_PATH, encode_message(req, _REQ, reg))
    finally:
        ch.close()
    resp = decode_message(raw, _RESP, reg)
    partial = resp.get("partial_success") or {}
    if partial.get("rejected_spans"):
        raise ConnectionError(
            f"otlp export: {partial['rejected_spans']} spans rejected: "
            f"{partial.get('error_message', '')}")
    return n


class MiniOtlpCollector:
    """In-process OTLP/gRPC trace collector (protocol-verifying): decodes
    every ExportTraceServiceRequest with the same published schema and
    records the span dicts."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        from bento_spark.streaming.grpc_wire import MiniGrpcServer

        self.requests: list[dict] = []
        self._reg = _otlp_registry()
        self.grpc = MiniGrpcServer(host, port)
        self.grpc.handle(OTLP_EXPORT_PATH, self._export)

    @property
    def port(self) -> int:
        return self.grpc.port

    def start(self) -> "MiniOtlpCollector":
        self.grpc.start()
        return self

    def stop(self) -> None:
        self.grpc.stop()

    @property
    def spans(self) -> list[dict]:
        return [s for r in self.requests
                for rs in r.get("resource_spans", [])
                for ss in rs.get("scope_spans", [])
                for s in ss.get("spans", [])]

    def _export(self, st) -> None:
        from bento_spark.operators.protobuf_codec import (
            decode_message,
            encode_message,
        )

        raw = st.recv(timeout=15)
        if raw is not None:
            self.requests.append(decode_message(raw, _REQ, self._reg))
        st.send(encode_message({}, _RESP, self._reg))
        st.close()


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
