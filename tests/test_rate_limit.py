"""Shared `rate_limit` resource (rate_limit_local.go:31 "X every Y",
referenced by the http processor's `rate_limit` field,
processor_http.go:18). The per-partition token-bucket share is asserted
against a LIVE local server's request timestamps — the contract is the
admitted rate, not implementation detail."""

from __future__ import annotations

import http.server
import threading
import time

import pytest

from bento_spark.operators.rate_limit import TokenBucket, per_partition_share
from bento_spark.plans.compiler import compile_yaml
from bento_spark.plans.lint import lint_yaml


def test_token_bucket_paces():
    b = TokenBucket(rate_per_s=20.0, burst=2.0)
    t0 = time.monotonic()
    for _ in range(8):
        b.acquire()
    elapsed = time.monotonic() - t0
    # 2 burst + 6 spaced at 50ms => >= 0.3s; generous upper bound for CI
    assert elapsed >= 0.25, f"8 acquires finished in {elapsed:.3f}s — bucket not pacing"
    assert elapsed < 2.0


def test_per_partition_share_math():
    # 100 per 1s across 32 slots -> 3.125/s each, burst 3.125
    rate, burst = per_partition_share(100, 1000, 32)
    assert abs(rate - 3.125) < 1e-9 and abs(burst - 3.125) < 1e-9
    # fractional share still grants (burst floor 1.0)
    rate, burst = per_partition_share(10, 1000, 32)
    assert burst == 1.0 and rate == pytest.approx(0.3125)
    with pytest.raises(ValueError):
        per_partition_share(0, 1000, 1)


class _StampHandler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    stamps: list[float] = []
    lock = threading.Lock()

    def do_GET(self):  # noqa: N802
        with self.lock:
            self.stamps.append(time.monotonic())
        body = b'{"ok": true}'
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def stamp_port():
    _StampHandler.stamps = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _StampHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address[1]
    srv.shutdown()


def test_http_rate_limit_resource_caps_request_rate(spark, tmp_path, stamp_port):
    src = tmp_path / "in"
    spark.createDataFrame([(i,) for i in range(12)], "id int").coalesce(1).write.parquet(str(src))
    conf = f"""
input:
  parquet: {{path: {src}, schema: "id int"}}
rate_limit_resources:
  - label: api
    count: 5
    interval: 500 ms
    parallelism: 1
pipeline:
  processors:
    - http:
        url: "http://127.0.0.1:{stamp_port}/x?n=${{! this.id }}"
        out: resp
        rate_limit: api
        retries: 0
"""
    out = compile_yaml(conf).build_batch(spark).collect()
    assert len(out) == 12 and all(r.error is None for r in out)
    stamps = sorted(_StampHandler.stamps)
    assert len(stamps) == 12
    # token-bucket admission: burst (=count) immediately, then sustained
    # count/interval. Any sliding window of length W admits at most
    # burst + rate*W (+1 for edge landings): 5 + 5 + 1 = 11 per 500ms.
    for i in range(len(stamps)):
        in_window = sum(1 for t in stamps if stamps[i] <= t < stamps[i] + 0.5)
        assert in_window <= 11, f"{in_window} requests inside one 500ms window"
    # sustained-rate proof: the 7 post-burst requests are paced at
    # 1/rate = 100ms each => the run spans >= ~0.6s (allow 20% clock slop)
    assert stamps[-1] - stamps[0] >= 0.45, (
        f"12 requests finished in {stamps[-1] - stamps[0]:.3f}s — no pacing"
    )
    # and the tail (post-burst) inter-arrival gaps confirm the rate
    post = stamps[5:]
    assert post[-1] - post[0] >= (len(post) - 1) * 0.1 * 0.7


def test_unknown_rate_limit_resource_raises(spark, tmp_path):
    src = tmp_path / "in2"
    spark.createDataFrame([(1,)], "id int").write.parquet(str(src))
    conf = f"""
input:
  parquet: {{path: {src}, schema: "id int"}}
pipeline:
  processors:
    - http: {{url: "http://127.0.0.1:1/x", rate_limit: nope}}
"""
    with pytest.raises(ValueError, match="unknown rate_limit resource 'nope'"):
        compile_yaml(conf).build_batch(spark)


def test_lint_rate_limit_resources():
    assert lint_yaml("""
rate_limit_resources:
  - label: api
    count: 10
    interval: 1s
""") == []
    issues = lint_yaml("""
rate_limit_resources:
  - count: 10
  - label: bad
    count: -1
    interval: soon
""")
    assert any("needs a 'label'" in s for s in issues)
    assert any("count must be > 0" in s for s in issues)
    assert any("bad duration" in s for s in issues)
