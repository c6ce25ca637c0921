"""sentry_capture processor (reference internal/impl/sentry/
processor_capture.go) and slack_webhook output (slack/
output_slack_webhook.go) — against an in-process capture server."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from bento_spark.operators.sentry import build_envelope, parse_dsn
from bento_spark.plans.compiler import compile_yaml


@pytest.fixture()
def capture_server():
    class Handler(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        store: list = []

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            type(self).store.append((self.path, dict(self.headers), body))
            out = b"{}"
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    handler = type("H", (Handler,), {"store": []})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], handler.store
    srv.shutdown()


def test_parse_dsn():
    assert parse_dsn("https://abc123@o111.ingest.sentry.io/42") == (
        "https", "o111.ingest.sentry.io", 443, "abc123", "42")
    assert parse_dsn("http://k@127.0.0.1:9999/7") == (
        "http", "127.0.0.1", 9999, "k", "7")
    with pytest.raises(ValueError, match="malformed DSN"):
        parse_dsn("not-a-dsn")


def test_envelope_format():
    env = build_envelope({"event_id": "e" * 32, "message": {"formatted": "x"}})
    lines = env.decode().strip().split("\n")
    assert json.loads(lines[0]) == {"event_id": "e" * 32}
    item = json.loads(lines[1])
    assert item["type"] == "event" and item["length"] == len(lines[2].encode())
    assert json.loads(lines[2])["message"] == {"formatted": "x"}


def test_yaml_sentry_capture(spark, capture_server, tmp_path):
    port, store = capture_server
    src = tmp_path / "in"
    spark.createDataFrame(
        [(1, "disk full"), (2, "oom")], "id int, what string"
    ).write.parquet(str(src))
    out = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - sentry_capture:
        dsn: http://pubkey@127.0.0.1:{port}/42
        message: "worker failed: ${{! this.what }}"
        level: WARN
        environment: ci
        tags:
          worker: w-${{! this.id }}
""").build_batch(spark)
    rows = out.collect()
    # rows pass through unchanged (plus the error column, all clean)
    assert sorted((r.id, r.what, r.error) for r in rows) == [
        (1, "disk full", None), (2, "oom", None)]
    assert len(store) == 2
    events = []
    for path, headers, body in store:
        assert path == "/api/42/envelope/"
        assert "sentry_key=pubkey" in headers.get("X-Sentry-Auth", "")
        lines = body.decode().strip().split("\n")
        events.append(json.loads(lines[2]))
    by_msg = {e["message"]["formatted"]: e for e in events}
    e1 = by_msg["worker failed: disk full"]
    assert e1["level"] == "warn" and e1["environment"] == "ci"
    assert e1["tags"] == {"worker": "w-1"}
    # per-capture uuid (Sentry drops duplicate ids, so recurrences must
    # get fresh ones); distinct events carry distinct ids
    assert len(e1["event_id"]) == 32
    assert len({e["event_id"] for e in events}) == 2


def test_yaml_slack_webhook_output(spark, capture_server, tmp_path):
    port, store = capture_server
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("r1\nr2")
    p = compile_yaml(f"""
input:
  lines:
    path: {src}
pipeline:
  processors:
    - mapping: 'root.text = "alert: " + this.line'
output:
  slack_webhook:
    webhook: http://127.0.0.1:{port}/services/T0/B0/secret
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(90)
    assert len(store) == 2
    texts = set()
    for path, _headers, body in store:
        assert path == "/services/T0/B0/secret"
        texts.add(json.loads(body)["text"])
    assert texts == {"alert: r1", "alert: r2"}


def test_lint_knows_sentry():
    from bento_spark.plans.lint import known_processors

    assert "sentry_capture" in known_processors()


def test_yaml_opensearch_alias(spark, tmp_path):
    """output.opensearch routes to the same bulk writer as elasticsearch
    (the reference maintains two near-identical outputs over one API)."""
    from bento_spark.streaming.elasticsearch import MiniEsServer

    srv = MiniEsServer().start()
    try:
        src = tmp_path / "src"
        src.mkdir()
        (src / "a.txt").write_text("r1\nr2")
        p = compile_yaml(f"""
input:
  lines:
    path: {src}
pipeline:
  processors:
    - mapping: 'root.line = this.line'
output:
  opensearch:
    urls: ["http://127.0.0.1:{srv.port}"]
    index: logs
    action: index
    id: doc-${{! this.line }}
""")
        q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt_os"))
        q.awaitTermination(90)
        docs = srv.indices.get("logs", {})
        assert sorted(docs) == ["doc-r1", "doc-r2"]
        assert sorted(d["line"] for d in docs.values()) == ["r1", "r2"]
    finally:
        srv.stop()
