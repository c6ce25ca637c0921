"""Splunk HEC output (reference internal/impl/splunk/template_output.yaml
— an http_client template with the HEC event envelope + Splunk-token
auth) and the InfluxDB line-protocol metrics exporter
(internal/impl/influxdb/metrics_influxdb.go) — driven against in-process
HTTP servers."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.metrics import influx_export, influx_lines


class _Capture(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    store: list = []  # (path, headers, body) — class-level per fixture

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        type(self).store.append((self.path, dict(self.headers), body))
        out = b'{"text":"Success","code":0}'
        self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass


@pytest.fixture()
def capture_server():
    handler = type("H", (_Capture,), {"store": []})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], handler.store
    srv.shutdown()


# --------------------------------------------------------------------------
# splunk_hec output
# --------------------------------------------------------------------------


def test_yaml_splunk_hec_output(spark, capture_server, tmp_path):
    port, store = capture_server
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("r1\nr2")
    p = compile_yaml(f"""
input:
  lines:
    path: {src}
output:
  splunk_hec:
    url: http://127.0.0.1:{port}/services/collector/event
    token: secret-token
    event_host: worker-1
    event_sourcetype: bento
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(90)
    assert len(store) == 2
    for path, headers, body in store:
        assert path == "/services/collector/event"
        # token auth (template_output.yaml: Authorization: Splunk <token>)
        assert headers.get("Authorization") == "Splunk secret-token"
        ev = json.loads(body)
        # HEC envelope: row under `event`, overrides alongside
        assert ev["host"] == "worker-1" and ev["sourcetype"] == "bento"
        assert ev["event"]["line"] in ("r1", "r2")
    assert {json.loads(b)["event"]["line"] for _p, _h, b in store} == {"r1", "r2"}


# --------------------------------------------------------------------------
# influxdb metrics exporter
# --------------------------------------------------------------------------


def test_influx_line_format():
    totals = {"input_received": 100, "output_sent": 90, "state_rows_last": 5}
    lines = influx_lines(totals, measurement="bento",
                         tags={"env": "prod", "host": "a b"}, timestamp_ns=1700000000000000000)
    assert lines[0] == (
        "bento,env=prod,host=a\\ b input_received=100i 1700000000000000000"
    )
    assert any("output_sent=90i" in ln for ln in lines)
    assert any("state_rows_last=5i" in ln for ln in lines)
    # absent metrics don't emit lines
    assert not any("max_watermark_lag_ms" in ln for ln in lines)
    assert influx_lines({}) == []


def test_influx_export_posts_to_write_endpoint(capture_server):
    port, store = capture_server
    n = influx_export(
        {"input_received": 7, "output_sent": 7},
        url=f"http://127.0.0.1:{port}", db="metrics", tags={"env": "ci"},
    )
    assert n == 2
    path, _headers, body = store[0]
    assert path == "/write?db=metrics"
    lines = body.decode().split("\n")
    assert lines == ["bento,env=ci input_received=7i", "bento,env=ci output_sent=7i"]


def test_influx_export_raises_on_error(capture_server):
    port, _store = capture_server

    class _Fail(http.server.BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            self.send_response(500)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Fail)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(ConnectionError, match="influxdb: write -> 500"):
            influx_export({"input_received": 1},
                          url=f"http://127.0.0.1:{srv.server_address[1]}")
    finally:
        srv.shutdown()


# --------------------------------------------------------------------------
# questdb output (ILP over TCP)
# --------------------------------------------------------------------------


def test_ilp_line_rendering(spark):
    from bento_spark.streaming.questdb import ilp_line

    df = spark.createDataFrame(
        [("eu west", 7, 2.5, True, 'say "hi"\\x', "2024-01-01 00:00:01")],
        "region string, n int, ratio double, ok boolean, note string, ts string",
    )
    out = ilp_line(df, "my table", symbols=["region"],
                   designated_timestamp_field="ts").first()._ilp
    # table + tag escape spaces; int gets i; string quoted with " and \ escaped
    assert out.startswith("my\\ table,region=eu\\ west ")
    assert "n=7i" in out and "ratio=2.5" in out and "ok=t" in out
    assert 'note="say \\"hi\\"\\\\x"' in out
    assert out.endswith(" 1704067201000000000")  # ns epoch of the ts
    # `doubles` forces float rendering of an integer column
    forced = ilp_line(df.select("n"), "t", doubles=["n"]).first()._ilp
    assert forced == "t n=7.0"


def test_ilp_newlines_cannot_inject_rows(spark):
    """ILP is newline-framed: a raw \\n or \\r in a string field or tag
    value must be escaped, never emitted — otherwise the remainder parses
    as injected extra rows (the questdb-client-go sanitization rule)."""
    from bento_spark.streaming.questdb import ilp_line

    df = spark.createDataFrame(
        [("tag\nval", 'line1\nfake,inj=1 x=9i\rline3')],
        "region string, note string",
    )
    out = ilp_line(df, "t", symbols=["region"]).first()._ilp
    assert "\n" not in out and "\r" not in out
    assert out.startswith("t,region=tag\\nval ")
    assert 'note="line1\\nfake,inj=1 x=9i\\rline3"' in out


def test_yaml_questdb_output(spark, tmp_path):
    from bento_spark.streaming.questdb import MiniQuestDbServer

    srv = MiniQuestDbServer().start()
    try:
        src = tmp_path / "src"
        src.mkdir()
        (src / "a.txt").write_text("a\nbb\nccc")
        p = compile_yaml(f"""
input:
  lines:
    path: {src}
pipeline:
  processors:
    - mapping: |
        root.word = this.line
        root.n = this.line.length()
output:
  questdb:
    address: 127.0.0.1:{srv.port}
    table: words
    symbols: [word]
""")
        q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
        q.awaitTermination(90)
        import time as _t

        deadline = _t.monotonic() + 5
        while _t.monotonic() < deadline and len(srv.lines) < 3:
            _t.sleep(0.05)
        # field order follows the schema: the mapping keeps `line` and
        # adds `n`; `word` rides as the symbol tag
        assert sorted(srv.lines) == [
            'words,word=a line="a",n=1i',
            'words,word=bb line="bb",n=2i',
            'words,word=ccc line="ccc",n=3i',
        ]
    finally:
        srv.stop()


# --------------------------------------------------------------------------
# pusher output (signed Channels REST API)
# --------------------------------------------------------------------------


def test_pusher_auth_signature_recipe():
    import hashlib
    import hmac as pyhmac

    from bento_spark.streaming.pusher import pusher_auth_query

    qs = pusher_auth_query("k1", "s3cret", "/apps/42/events", b'{"x":1}', 1700000000)
    parts = dict(p.split("=") for p in qs.split("&"))
    assert parts["auth_key"] == "k1" and parts["auth_version"] == "1.0"
    assert parts["body_md5"] == hashlib.md5(b'{"x":1}').hexdigest()
    unsigned = "&".join(f"{k}={parts[k]}" for k in
                        ["auth_key", "auth_timestamp", "auth_version", "body_md5"])
    expect = pyhmac.new(b"s3cret", f"POST\n/apps/42/events\n{unsigned}".encode(),
                        hashlib.sha256).hexdigest()
    assert parts["auth_signature"] == expect


def test_yaml_pusher_output(spark, capture_server, tmp_path):
    import hashlib
    import hmac as pyhmac

    port, store = capture_server
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("r1\nr2")
    p = compile_yaml(f"""
input:
  lines:
    path: {src}
output:
  pusher:
    address: 127.0.0.1:{port}
    https: false
    appId: "42"
    key: k1
    secret: s3cret
    event: line-arrived
    channel: chan-${{! this.line }}
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt_pusher"))
    q.awaitTermination(90)
    assert len(store) == 2
    seen = {}
    for path, _headers, body in store:
        base, _, qs = path.partition("?")
        assert base == "/apps/42/events"
        parts = dict(pair.split("=") for pair in qs.split("&"))
        # signature verifies against the shared secret + actual body
        unsigned = "&".join(f"{k}={parts[k]}" for k in
                            ["auth_key", "auth_timestamp", "auth_version", "body_md5"])
        expect = pyhmac.new(b"s3cret", f"POST\n{base}\n{unsigned}".encode(),
                            hashlib.sha256).hexdigest()
        assert parts["auth_signature"] == expect
        assert parts["body_md5"] == hashlib.md5(body).hexdigest()
        ev = json.loads(body)
        assert ev["name"] == "line-arrived"
        seen[ev["channels"][0]] = json.loads(ev["data"])["line"]
    assert seen == {"chan-r1": "r1", "chan-r2": "r2"}


def test_ilp_null_fields_omitted(spark):
    from bento_spark.streaming.questdb import ilp_line

    df = spark.createDataFrame(
        [("a", 1, None), (None, None, 2.0), (None, None, None)],
        "region string, n int, ratio double",
    )
    lines = [r._ilp for r in
             ilp_line(df, "t", symbols=["region"]).collect()]
    # NULL field/symbol omitted; all-NULL row dropped (invalid ILP)
    assert lines == ["t,region=a n=1i", "t ratio=2.0"]


def test_influx_measurement_escaping():
    # measurement escapes ONLY ',' and ' ' — '=' is legal in that position
    lines = influx_lines({"input_received": 1}, measurement="jobs=prod, x")
    assert lines == ["jobs=prod\\,\\ x input_received=1i"]
