"""DynamoDB cache backend (reference internal/impl/aws/cache_dynamodb.go):
JSON-protocol client over SigV4, conditional-put add, BatchGetItem
enrichment, ttl_key expiry, YAML cache_resources wiring — against the
signature-verifying MiniDynamoServer."""

from __future__ import annotations

import time

import pytest

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.dynamodb import (
    DynamoCache,
    DynamoClient,
    KeyExistsError,
    MiniDynamoServer,
)


@pytest.fixture()
def server():
    s = MiniDynamoServer().start()
    yield s
    s.stop()


def _cache(spark, server, **kw):
    return DynamoCache(spark, server.endpoint, "cache", server.access_key,
                       server.secret_key, **kw)


def test_client_put_get_delete_conditional(server):
    c = DynamoClient(server.endpoint, server.access_key, server.secret_key)
    c.call("PutItem", {"TableName": "t",
                       "Item": {"key": {"S": "a"}, "value": {"S": "1"}}})
    out = c.call("GetItem", {"TableName": "t", "Key": {"key": {"S": "a"}}})
    assert out["Item"]["value"]["S"] == "1"
    with pytest.raises(KeyExistsError):
        c.call("PutItem", {"TableName": "t",
                           "Item": {"key": {"S": "a"}, "value": {"S": "x"}},
                           "ConditionExpression": "attribute_not_exists(#k)",
                           "ExpressionAttributeNames": {"#k": "key"}})
    c.call("DeleteItem", {"TableName": "t", "Key": {"key": {"S": "a"}}})
    assert "Item" not in c.call("GetItem", {"TableName": "t",
                                            "Key": {"key": {"S": "a"}}})


def test_bad_signature_rejected(server):
    c = DynamoClient(server.endpoint, server.access_key, "wrong")
    with pytest.raises(ConnectionError, match="403"):
        c.call("GetItem", {"TableName": "t", "Key": {"key": {"S": "a"}}})


@pytest.mark.parametrize("err_type", [
    "com.amazonaws.dynamodb.v20120810#ProvisionedThroughputExceededException",
    "com.amazon.coral.availability#ThrottlingException",
    "RequestLimitExceeded",
])
def test_throttling_400s_retry_in_call(err_type):
    """AWS throttling surfaces under several 400-level names — all must
    heal inside call() (a raise in foreachPartition fails the task)."""
    import http.server
    import json
    import threading

    hits = {"n": 0}

    class Handler(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_POST(self):  # noqa: N802
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            hits["n"] += 1
            if hits["n"] == 1:
                body = json.dumps({"__type": err_type}).encode()
                self.send_response(400)
            else:
                body = b"{}"
                self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = DynamoClient(f"http://127.0.0.1:{srv.server_address[1]}",
                         "ak", "sk")
        assert c.call("PutItem", {"TableName": "t", "Item": {}},
                      backoff_s=0.01) == {}
        assert hits["n"] == 2  # throttled once, retried, succeeded
    finally:
        srv.shutdown()


def test_cache_contract(spark, server):
    c = _cache(spark, server)
    kv = spark.createDataFrame([("a", "1"), ("b", "2")], "key string, value string")
    c.set(kv)
    probe = spark.createDataFrame([("a",), ("b",), ("miss",)], "key string")
    got = {r.key: r.value for r in c.get(probe).collect()}
    assert got == {"a": "1", "b": "2", "miss": None}
    rejected = c.add(spark.createDataFrame(
        [("a", "x"), ("c", "3")], "key string, value string"))
    assert [r.key for r in rejected.collect()] == ["a"]
    c.delete(spark.createDataFrame([("a",)], "key string"))
    got = {r.key: r.value for r in c.get(probe).collect()}
    assert got["a"] is None and got["b"] == "2"


def test_ttl_key_expiry(spark, server):
    c = _cache(spark, server, ttl_key="expires", default_ttl=1)
    c.set(spark.createDataFrame([("gone", "v")], "key string, value string"))
    c.set(spark.createDataFrame([("keep", "v")], "key string, value string"),
          ttl=60)
    time.sleep(1.2)
    probe = spark.createDataFrame([("gone",), ("keep",)], "key string")
    got = {r.key: r.value for r in c.get(probe).collect()}
    assert got == {"gone": None, "keep": "v"}
    # expired counts as absent for add
    assert c.add(spark.createDataFrame(
        [("gone", "v2")], "key string, value string")).count() == 0


def test_default_ttl_requires_ttl_key(spark, server):
    with pytest.raises(ValueError, match="needs `ttl_key`"):
        _cache(spark, server, default_ttl=60)


def test_yaml_dynamodb_cache_resource(spark, server, tmp_path):
    src = tmp_path / "in"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id int, name string"
    ).write.parquet(str(src))
    resources = f"""
cache_resources:
  - label: ddb
    aws_dynamodb:
      endpoint: {server.endpoint}
      table: cache
      region: us-east-1
      access_key: {server.access_key}
      secret_key: {server.secret_key}
"""
    compile_yaml(f"""
input:
  parquet: {{path: {src}}}
{resources}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: ddb, operator: set, key: k, columns: [name]}}
""").build_batch(spark)
    rows = {
        r.id: r.value
        for r in compile_yaml(f"""
input:
  parquet: {{path: {src}}}
{resources}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: ddb, operator: get, key: k}}
""").build_batch(spark).collect()
    }
    assert rows == {1: "alpha", 2: "beta"}


# --------------------------------------------------------------------------
# aws_dynamodb OUTPUT (output_dynamodb.go)
# --------------------------------------------------------------------------


def test_attr_value_typed_tree():
    from bento_spark.streaming.dynamodb import attr_value

    got = attr_value({"s": "x", "n": 3, "f": 1.5, "b": True,
                      "z": None, "l": [1, "a"], "m": {"k": 2}})
    assert got == {"M": {
        "s": {"S": "x"}, "n": {"N": "3"}, "f": {"N": "1.5"},
        "b": {"BOOL": True}, "z": {"NULL": True},
        "l": {"L": [{"N": "1"}, {"S": "a"}]},
        "m": {"M": {"k": {"N": "2"}}},
    }}


def test_output_sink_batch_write(spark, server):
    from pyspark.sql import functions as F

    from bento_spark.streaming.dynamodb import dynamodb_sink

    # 60 rows -> 3 BatchWriteItem chunks (25-cap)
    df = spark.range(60).select(
        F.format_string("k%03d", F.col("id")).alias("key"),
        F.to_json(F.struct(F.col("id").alias("n"))).alias("doc"),
    )
    dynamodb_sink(server.endpoint, "t", server.access_key, server.secret_key,
                  string_cols=["key"], json_map_cols={"doc": "doc"})(df, 0)
    c = DynamoClient(server.endpoint, server.access_key, server.secret_key)
    item = c.call("GetItem", {"TableName": "t",
                              "Key": {"key": {"S": "k042"}}})["Item"]
    # json_map column landed as a TYPED attribute tree, not a string
    assert item["doc"] == {"M": {"n": {"N": "42"}}}
    assert c.call("GetItem", {"TableName": "t",
                              "Key": {"key": {"S": "k059"}}})["Item"]


def test_yaml_dynamodb_output_stream(spark, server, tmp_path):
    src = tmp_path / "words"
    src.mkdir()
    (src / "w.txt").write_text("dog\nemu")
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
  aws_dynamodb:
    endpoint: {server.endpoint}
    table: words
    access_key: {server.access_key}
    secret_key: {server.secret_key}
    string_columns:
      key: '${{! this.word }}'
      upper: '${{! this.word.uppercase() }}'
    json_map_columns:
      doc: '.'
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(90)
    c = DynamoClient(server.endpoint, server.access_key, server.secret_key)
    item = c.call("GetItem", {"TableName": "words",
                              "Key": {"key": {"S": "dog"}}})["Item"]
    assert item["upper"] == {"S": "DOG"}
    # '.' path = the whole (pre-interpolation) row as a typed map
    assert item["doc"]["M"]["word"] == {"S": "dog"}
    assert item["doc"]["M"]["n"] == {"N": "3"}


def test_output_ttl_requires_ttl_key(server):
    from bento_spark.streaming.dynamodb import dynamodb_sink

    with pytest.raises(ValueError, match="ttl_key"):
        dynamodb_sink(server.endpoint, "t", "a", "s",
                      string_cols=["key"], ttl=60)
    with pytest.raises(ValueError, match="string_columns"):
        dynamodb_sink(server.endpoint, "t", "a", "s")
