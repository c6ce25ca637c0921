"""`redis` generic-command and `redis_script` processors (reference
internal/impl/redis/processor.go + script_processor.go) against the
in-process RESP2 server; the script path exercises the real EVALSHA ->
-NOSCRIPT -> EVAL cache protocol with client-side SHA-1."""

from __future__ import annotations

import hashlib
import json

import pytest

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.redis import MiniRedisServer, RedisClient


@pytest.fixture()
def server():
    s = MiniRedisServer().start()
    yield s
    s.stop()


def _pipeline(server, body: str, spark, tmp_path, rows, schema):
    src = tmp_path / "in"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    return compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
{body.format(url=f"tcp://{server.host}:{server.port}")}
""").build_batch(spark)


# ---------------------------------------------------------------- command


def test_command_args_mapping_sadd_scard(spark, server, tmp_path):
    out = _pipeline(server, """
    - redis:
        url: {url}
        command: sadd
        args_mapping: '[ "teams", this.team ]'
""", spark, tmp_path, [("red",), ("blue",), ("red",)], "team string")
    rows = out.collect()
    assert sorted(json.loads(r.redis) for r in rows) == [0, 1, 1]
    c = RedisClient(server.host, server.port)
    assert c.cmd("SCARD", "teams") == 2
    c.close()


def test_legacy_operator_incrby(spark, server, tmp_path):
    c = RedisClient(server.host, server.port)
    c.cmd("SET", "visits-u1", "10")
    out = _pipeline(server, """
    - redis:
        url: {url}
        operator: incrby
        key: visits-${{! this.uid }}
        column: n
""", spark, tmp_path, [("u1", "5"), ("u2", "3")], "uid string, n string")
    got = {r.uid: json.loads(r.redis) for r in out.collect()}
    assert got == {"u1": 15, "u2": 3}
    assert c.cmd("GET", "visits-u2") == b"3"
    c.close()


def test_command_error_flags_row_not_batch(spark, server, tmp_path):
    c = RedisClient(server.host, server.port)
    c.cmd("RPUSH", "alist", "x")  # GET on a list -> WRONGTYPE
    c.close()
    out = _pipeline(server, """
    - redis:
        url: {url}
        command: get
        args_mapping: '[ this.k ]'
""", spark, tmp_path, [("alist",), ("missing",)], "k string")
    got = {r.k: (r.redis, r.error) for r in out.collect()}
    assert "WRONGTYPE" in got["alist"][1] and got["alist"][0] is None
    assert got["missing"] == ("null", None)  # absent key -> nil, no error


def test_operator_with_args_mapping_rejected(spark, server, tmp_path):
    with pytest.raises(ValueError, match="args_mapping is invalid"):
        _pipeline(server, """
    - redis:
        url: {url}
        operator: scard
        key: k
        args_mapping: '[ this.k ]'
""", spark, tmp_path, [("x",)], "k string")


# ----------------------------------------------------------------- script


def test_script_evalsha_noscript_fallback_and_state(spark, server, tmp_path):
    script = "return redis.call('INCRBY', KEYS[1], ARGV[1])"
    out = _pipeline(server, f"""
    - redis_script:
        url: {{url}}
        script: "{script}"
        keys_mapping: '[ "ctr-" + this.uid ]'
        args_mapping: '[ this.n ]'
""", spark, tmp_path, [("a", 5), ("a", 7), ("b", 2)], "uid string, n long")
    vals = sorted(json.loads(r.redis) for r in out.collect())
    # INCRBY per row; a's two increments land in either order
    assert vals in ([2, 5, 12], [2, 7, 12])
    # the EVAL fallback registered the script under its real SHA-1
    sha = hashlib.sha1(script.encode()).hexdigest()
    assert sha in server._scripts
    c = RedisClient(server.host, server.port)
    assert c.cmd("GET", "ctr-b") == b"2"
    # a warmed cache serves EVALSHA directly
    assert c.cmd("EVALSHA", sha, "1", "ctr-b", "10") == 12
    c.close()


def test_script_echo_argv(spark, server, tmp_path):
    out = _pipeline(server, """
    - redis_script:
        url: {url}
        script: "return ARGV[1]"
        args_mapping: '[ this.v ]'
""", spark, tmp_path, [("hello",)], "v string")
    assert json.loads(out.collect()[0].redis) == "hello"


def test_lint_knows_redis_processors():
    from bento_spark.plans.lint import known_processors

    assert {"redis", "redis_script"} <= known_processors()
