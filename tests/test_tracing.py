"""Tracing spans + OTLP-JSON export; sequence input ordering."""

from __future__ import annotations

import json

import pytest

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.tracing import Tracer, otel_available, to_otel


def test_span_nesting_and_status():
    t = Tracer("svc")
    with pytest.raises(RuntimeError, match="boom"):
        with t.span("pipeline", config="p1"):
            with t.span("stage-decode", rows=100):
                t.event("CONSUME", source="parquet")
            with t.span("stage-window"):
                raise RuntimeError("boom")
    by_name = {s.name: s for s in t.spans}
    assert set(by_name) == {"pipeline", "stage-decode", "stage-window"}
    root = by_name["pipeline"]
    assert root.parent_id is None and root.status == "ERROR"  # exc propagated through it
    for child in ("stage-decode", "stage-window"):
        assert by_name[child].parent_id == root.span_id
        assert by_name[child].trace_id == root.trace_id
    assert by_name["stage-window"].status == "ERROR"
    assert by_name["stage-decode"].events[0]["name"] == "CONSUME"


def test_otlp_export_shape(tmp_path):
    t = Tracer("bento-spark-test")
    with t.span("run", n=3, ratio=0.5, ok=True, note=None):
        pass
    out = tmp_path / "spans.json"
    t.export_file(str(out))
    doc = json.loads(out.read_text())
    rs = doc["resourceSpans"][0]
    assert {"key": "service.name", "value": {"stringValue": "bento-spark-test"}} in rs["resource"]["attributes"]
    span = rs["scopeSpans"][0]["spans"][0]
    assert span["name"] == "run" and len(span["traceId"]) == 32 and len(span["spanId"]) == 16
    kinds = {a["key"]: next(iter(a["value"])) for a in span["attributes"]}
    assert kinds == {"n": "intValue", "ratio": "doubleValue", "ok": "boolValue", "note": "stringValue"}
    assert span["status"] == {"code": 1}
    assert int(span["endTimeUnixNano"]) >= int(span["startTimeUnixNano"])


def test_otel_gated():
    if otel_available():
        pytest.skip("opentelemetry-sdk present: the real path is tested below")
    with pytest.raises(RuntimeError, match="opentelemetry-sdk"):
        to_otel(Tracer())


def test_otel_sdk_replay():
    """Real-SDK path: recorded spans replay with ids/parents/status/events
    preserved. Skips where the optional package is absent (this sandbox);
    runs for real wherever opentelemetry-sdk is installed."""
    if not otel_available():
        pytest.skip("opentelemetry-sdk not installed")
    from opentelemetry.sdk.trace.export.in_memory_span_exporter import (
        InMemorySpanExporter,
    )

    tr = Tracer("svc")
    with tr.span("parent", n=1) as p:
        tr.event("PRODUCE", part=0)
        with tr.span("child"):
            pass
    exp = InMemorySpanExporter()
    to_otel(tr, exporter=exp)
    got = {s.name: s for s in exp.get_finished_spans()}
    assert set(got) == {"parent", "child"}
    parent, child = got["parent"], got["child"]
    assert format(parent.context.span_id, "016x") == p.span_id
    assert child.parent.span_id == parent.context.span_id
    assert child.context.trace_id == parent.context.trace_id
    assert parent.events[0].name == "PRODUCE"
    assert parent.attributes["n"] == 1


def test_batch_spans_from_listener():
    from bento_spark.streaming.metrics import BatchMetrics

    class FakeListener:
        batches = [
            BatchMetrics(0, "t0", 10, 10, None, None, 0, 0, 1.0, 1.0,
                         lineage=[{"source": "p", "rows": 10}]),
            BatchMetrics(1, "t1", 5, 5, None, None, 0, 0, 1.0, 1.0),
        ]

    t = Tracer()
    t.batch_spans_from(FakeListener())
    names = sorted(s.name for s in t.spans)
    assert names == ["micro-batch-0", "micro-batch-1", "streaming-query"]
    b0 = next(s for s in t.spans if s.name == "micro-batch-0")
    assert b0.attrs["input_received"] == 10
    assert b0.events == [{"name": "CONSUME", "attrs": {"source": "p", "rows": 10}}]


def test_sequence_input(spark, tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    spark.createDataFrame([(1,), (2,)], ["x"]).write.parquet(str(a))
    spark.createDataFrame([(3,)], ["x"]).write.parquet(str(b))
    p = compile_yaml(f"""
input:
  sequence:
    inputs:
      - parquet: {{path: {a}}}
      - parquet: {{path: {b}}}
""")
    rows = sorted((r._seq_input, r.x) for r in p.build_batch(spark).collect())
    assert rows == [(0, 1), (0, 2), (1, 3)]
    with pytest.raises(ValueError, match="batch-only"):
        p.build_stream(spark)


def test_otlp_grpc_export_roundtrip():
    """Dependency-free OTLP/gRPC: spans encode with the published
    opentelemetry-proto schema, ship over the h2c wire layer, and the
    protocol-verifying collector decodes identical ids/links/attrs."""
    from bento_spark.streaming.tracing import (
        MiniOtlpCollector,
        export_otlp_grpc,
    )

    t = Tracer(service_name="svc-x")
    with t.span("parent", rows=42, ratio=0.25, flag=True, note="hi"):
        t.event("CONSUME", source="p", rows=42)
        with t.span("child"):
            pass
    with pytest.raises(RuntimeError):
        with t.span("boom"):
            raise RuntimeError("kaput")
    col = MiniOtlpCollector().start()
    try:
        assert export_otlp_grpc(t, f"127.0.0.1:{col.port}") == 3
    finally:
        col.stop()
    spans = {s["name"]: s for s in col.spans}
    assert set(spans) == {"parent", "child", "boom"}
    parent, child = spans["parent"], spans["child"]
    # ids survive as raw bytes; the child links to its parent
    assert child["trace_id"] == parent["trace_id"]
    assert child["parent_span_id"] == parent["span_id"]
    assert parent.get("parent_span_id") in (None, b"")
    # typed attributes (AnyValue oneof)
    attrs = {kv["key"]: kv["value"] for kv in parent["attributes"]}
    assert attrs["rows"] == {"int_value": 42}
    assert attrs["ratio"] == {"double_value": 0.25}
    assert attrs["flag"] == {"bool_value": True}
    assert attrs["note"] == {"string_value": "hi"}
    # events + error status + fixed64 nanos
    assert parent["events"][0]["name"] == "CONSUME"
    assert spans["boom"]["status"]["code"] == "STATUS_CODE_ERROR"
    assert parent["end_time_unix_nano"] >= parent["start_time_unix_nano"] > 0
    # resource carries service.name
    req = col.requests[0]
    res_attrs = {kv["key"]: kv["value"] for kv in
                 req["resource_spans"][0]["resource"]["attributes"]}
    assert res_attrs["service.name"] == {"string_value": "svc-x"}


def test_otlp_grpc_partial_rejection_raises():
    from bento_spark.streaming.grpc_wire import MiniGrpcServer
    from bento_spark.streaming.tracing import (
        OTLP_EXPORT_PATH,
        _otlp_registry,
        _RESP,
        export_otlp_grpc,
    )

    reg = _otlp_registry()

    def reject(st):
        from bento_spark.operators.protobuf_codec import encode_message

        st.recv(timeout=15)
        st.send(encode_message(
            {"partial_success": {"rejected_spans": 2,
                                 "error_message": "quota"}}, _RESP, reg))
        st.close()

    srv = MiniGrpcServer()
    srv.handle(OTLP_EXPORT_PATH, reject)
    srv.start()
    t = Tracer()
    with t.span("a"):
        pass
    try:
        with pytest.raises(ConnectionError, match="2 spans rejected: quota"):
            export_otlp_grpc(t, f"127.0.0.1:{srv.port}")
    finally:
        srv.stop()
