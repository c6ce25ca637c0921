"""`output.http_server` (io/output_http_server.go): GET single-message,
chunked stream, and websocket serving endpoints over a bounded queue."""

from __future__ import annotations

import http.client
import json
import threading
import time

from bento_spark.plans.compiler import Pipeline, compile_yaml
from bento_spark.streaming.http_server import HttpServeOutput, ws_connect


def _get(server, path, timeout=10.0):
    c = http.client.HTTPConnection(server.host, server.port, timeout=timeout)
    try:
        c.request("GET", path)
        r = c.getresponse()
        return r.status, r.read()
    finally:
        c.close()


def test_get_pops_one_message_per_request():
    s = HttpServeOutput(timeout_s=0.3).start()
    try:
        for m in ("alpha", "beta"):
            s.push(m)
        assert _get(s, "/get") == (200, b"alpha")
        assert _get(s, "/get") == (200, b"beta")
        assert _get(s, "/get")[0] == 408  # drained -> timeout (reference 408-ish)
        assert _get(s, "/nope")[0] == 404
    finally:
        s.stop()


def test_post_is_rejected():
    s = HttpServeOutput().start()
    try:
        c = http.client.HTTPConnection(s.host, s.port, timeout=5)
        c.request("POST", "/get", body=b"x")
        assert c.getresponse().status == 405
        c.close()
    finally:
        s.stop()


def test_stream_endpoint_serves_line_delimited():
    s = HttpServeOutput().start()
    try:
        got = []

        def reader():
            c = http.client.HTTPConnection(s.host, s.port, timeout=10)
            c.request("GET", "/get/stream")
            r = c.getresponse()  # http.client decodes chunked transparently
            buf = b""
            while len(got) < 3:
                b = r.read1(4096)
                if not b:
                    break
                buf += b
                while b"\n" in buf:
                    ln, _, buf = buf.partition(b"\n")
                    got.append(ln.decode())
            c.close()

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        time.sleep(0.2)
        for m in ("one", "two", "three"):
            s.push(m)
        t.join(10)
        assert got == ["one", "two", "three"]
    finally:
        s.stop()


def test_websocket_endpoint_pushes_frames():
    s = HttpServeOutput().start()
    try:
        sock, rest = ws_connect(f"ws://{s.host}:{s.port}/get/ws")
        s.push("hello-ws")
        buf = rest
        while len(buf) < 2:
            buf += sock.recv(4096)
        assert buf[0] == 0x81  # FIN + text, server frame unmasked (§5.1)
        n = buf[1]
        assert n < 126
        while len(buf) < 2 + n:
            buf += sock.recv(4096)
        assert buf[2:2 + n] == b"hello-ws"
        sock.close()
    finally:
        s.stop()


def test_yaml_http_server_output_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    Pipeline.stage_clips(spark, src, 6)
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - mapping: |
        root.clip_id = this.clip_id
output:
  http_server:
    path: /get
    timeout: 0.5
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ck"))
    srv = p._http_serve
    try:
        got = set()
        deadline = time.monotonic() + 60
        while len(got) < 6 and time.monotonic() < deadline:
            status, body = _get(srv, "/get")
            if status == 200:
                got.add(json.loads(body)["clip_id"])
        q.awaitTermination(90)
        assert len(got) == 6
    finally:
        srv.stop()
