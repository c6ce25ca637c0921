"""HTTP enrichment (against a local in-process server — deterministic, no
external network) and fallback output failover."""

from __future__ import annotations

import http.server
import json
import threading
import urllib.parse

import pytest
from pyspark.sql import functions as F

from bento_spark.functions.bloblang import compile_interpolated
from bento_spark.operators.errors import set_error_when
from bento_spark.operators.http_enrich import http_enrich
from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.sink import IdempotentParquetSink, fallback_writer


class _Handler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"  # keep-alive, so the conn pool is exercised

    def do_GET(self):  # noqa: N802
        u = urllib.parse.urlsplit(self.path)
        q = urllib.parse.parse_qs(u.query)
        if u.path == "/square":
            body = json.dumps({"sq": int(q["n"][0]) ** 2}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def http_port():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def test_http_enrich_and_error_protocol(spark, http_port):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], ["n"]).repartition(2)
    out = http_enrich(
        df, compile_interpolated(f"http://127.0.0.1:{http_port}/square?n=${{! this.n }}"),
        out_col="resp",
    )
    rows = {r.n: (r.resp, r.error) for r in out.collect()}
    for n in (1, 2, 3, 4):
        assert json.loads(rows[n][0]) == {"sq": n * n} and rows[n][1] is None

    # 404 -> errored row, NULL body; pre-errored rows short-circuit untouched
    flagged = set_error_when(df, F.col("n") == 1, "pre-existing")
    bad = http_enrich(
        flagged,
        compile_interpolated(f"http://127.0.0.1:{http_port}/missing?n=${{! this.n }}"),
        out_col="resp", retries=0,
    )
    got = {r.n: (r.resp, r.error) for r in bad.collect()}
    assert got[1] == (None, "pre-existing")
    assert got[2][0] is None and "http" in got[2][1]


def test_http_enrich_yaml(spark, http_port, tmp_path):
    src = tmp_path / "nums"
    spark.createDataFrame([(5,), (6,)], ["n"]).write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - http:
        url: "http://127.0.0.1:{http_port}/square?n=${{! this.n }}"
        out: resp
    - json_map:
        column: resp
        fields:
          sq: {{path: sq, type: int}}
""")
    assert {r.n: r.sq for r in p.build_batch(spark).collect()} == {5: 25, 6: 36}


def test_fallback_writer_tiers(spark, tmp_path):
    good = IdempotentParquetSink(str(tmp_path / "tier1"))

    class Failing(IdempotentParquetSink):
        def write_batch(self, batch_df, epoch_id):
            raise OSError("disk full")

    bad = Failing(str(tmp_path / "tier0"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    fallback_writer([bad, good])(df, 0)
    out = good.read(spark)
    assert out.count() == 2
    row = out.filter(F.col("id") == 1).collect()[0]
    assert row.fallback_tier == 1 and "disk full" in row.fallback_error
    # all tiers failing raises with the last cause chained
    with pytest.raises(RuntimeError, match="all 1 fallback sinks failed"):
        fallback_writer([Failing(str(tmp_path / "tier2"))])(df, 1)
    # first tier healthy -> lands there, tier-7 rows carry NO annotation
    # (epoch-0 rows in the same sink DO, so check the epoch-7 slice)
    fallback_writer([good])(df, 7)
    e7 = good.read(spark).filter(F.col("_bid") == 7) if "_bid" in good.read(spark).columns else None
    if e7 is not None and "fallback_tier" in e7.columns:
        assert e7.filter(F.col("fallback_tier").isNotNull()).count() == 0
    else:
        assert e7 is None or e7.count() == 2


def test_fallback_yaml_stream(spark, tmp_path):
    src = tmp_path / "src"
    spark.createDataFrame([(i, f"c{i}") for i in range(8)], ["i", "s"]).write.parquet(str(src))
    t0, t1 = tmp_path / "t0", tmp_path / "t1"
    # tier-0 is pre-broken: a regular FILE where the sink's data dir must go
    t0.mkdir()
    (t0 / "data").write_text("not a directory")
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}, schema: "i bigint, s string"}}
output:
  fallback: [{t0}, {t1}]
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ck"), available_now=True)
    q.awaitTermination(90)
    out = IdempotentParquetSink(str(t1)).read(spark)
    assert out.count() == 8
    assert set(out.columns) >= {"i", "s", "fallback_error", "fallback_tier"}


def test_interpolation_null_segment_renders_null(spark):
    from bento_spark.functions.bloblang import compile_interpolated

    df = spark.createDataFrame([(1, "a"), (2, None)], ["n", "s"])
    got = {r.n: r.m for r in df.select(
        "n", compile_interpolated("v=${! this.s }!").alias("m")).collect()}
    # a NULL segment renders as "null" (reference field interpolation) —
    # it must NOT null the whole message, which would unflag errored rows
    assert got == {1: "v=a!", 2: "v=null!"}


def test_http_bad_url_errors_row_not_job(spark, http_port):
    df = spark.createDataFrame([(1,), (2,)], ["n"])
    url = F.when(F.col("n") == 1, F.lit(None).cast("string")).otherwise(
        F.lit(f"http://127.0.0.1:{http_port}/square?n=2"))
    out = {r.n: (r.resp, r.error) for r in
           http_enrich(df, url, out_col="resp", retries=0).collect()}
    assert out[1][0] is None and "bad url" in out[1][1]
    assert json.loads(out[2][0]) == {"sq": 4} and out[2][1] is None


def test_fallback_replay_no_cross_tier_duplicate(spark, tmp_path):
    calls = {"n": 0}

    class FlakyOnce(IdempotentParquetSink):
        def write_batch(self, batch_df, epoch_id):
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError("transient fault")
            super().write_batch(batch_df, epoch_id)

    tier0 = FlakyOnce(str(tmp_path / "t0"))
    tier1 = IdempotentParquetSink(str(tmp_path / "t1"))
    df = spark.createDataFrame([(1,)], ["x"])
    w = fallback_writer([tier0, tier1])
    w(df, 0)  # tier0 fails transiently -> lands on tier1
    assert tier1.read(spark).count() == 1
    w(df, 0)  # replayed epoch: tier0 is healthy now but MUST NOT rewrite
    assert not tier0.is_committed(0)
    assert tier1.read(spark).count() == 1


def test_fallback_ignores_foreign_incarnation_markers(spark, tmp_path):
    """A marker left by an earlier pipeline incarnation must not make the
    fallback chain skip the new run's epoch."""
    import json

    from bento_spark.audio.generate import clips_df
    from bento_spark.streaming.sink import IdempotentParquetSink, fallback_writer

    ck = tmp_path / "fb_ck"
    ck.mkdir()
    (ck / "metadata").write_text(json.dumps({"id": "new-run"}))
    t0 = str(tmp_path / "tier0")
    IdempotentParquetSink(t0)  # creates commit dir
    (tmp_path / "tier0" / "commits" / "0").write_text(
        json.dumps({"epoch": 0, "rows": 5, "qid": "old-run"})
    )
    sinks = [
        IdempotentParquetSink(t0, checkpoint=str(ck)),
        IdempotentParquetSink(str(tmp_path / "tier1"), checkpoint=str(ck)),
    ]
    fallback_writer(sinks)(clips_df(spark, 6, partitions=1), 0)
    assert sinks[0].read(spark).count() == 6  # foreign epoch-0 overwritten
    assert sinks[0]._marker_qid(0) == "new-run"
