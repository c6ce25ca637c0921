"""Couchbase connector (reference internal/impl/couchbase/processor.go,
cache.go): KV binary-protocol client with SASL PLAIN + SELECT_BUCKET,
processor operations, cache backend — against MiniCouchbaseServer."""

from __future__ import annotations

import time

import pytest

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.couchbase import (
    CouchbaseCache,
    CouchbaseClient,
    MiniCouchbaseServer,
)


@pytest.fixture()
def server():
    s = MiniCouchbaseServer().start()
    yield s
    s.stop()


def test_kv_roundtrip(server):
    c = CouchbaseClient(server.host, server.port)
    try:
        assert c.get("missing") is None
        c.upsert("a", b"1")
        assert c.get("a") == b"1"
        assert c.insert("a", b"x") is False  # ADD rejects existing
        assert c.insert("b", b"2") is True
        assert c.replace("b", b"2v2") is True
        assert c.replace("nope", b"x") is False
        assert c.get("b") == b"2v2"
        assert c.remove("a") is True
        assert c.remove("a") is False
        assert c.get("a") is None
    finally:
        c.close()


def test_sasl_and_bucket_selection():
    s = MiniCouchbaseServer(username="admin", password="pw",
                            buckets=("default", "other")).start()
    try:
        with pytest.raises(ConnectionError, match="SASL auth failed"):
            CouchbaseClient(s.host, s.port, username="admin", password="wrong")
        c = CouchbaseClient(s.host, s.port, bucket="other",
                            username="admin", password="pw")
        c.upsert("k", b"in-other")
        c.close()
        # buckets isolate keyspaces
        c2 = CouchbaseClient(s.host, s.port, bucket="default",
                             username="admin", password="pw")
        assert c2.get("k") is None
        c2.close()
        with pytest.raises(ConnectionError, match="select bucket"):
            CouchbaseClient(s.host, s.port, bucket="missing",
                            username="admin", password="pw")
    finally:
        s.stop()


def test_expiry(server):
    c = CouchbaseClient(server.host, server.port)
    try:
        c.upsert("gone", b"v", expiry_s=1)
        c.upsert("keep", b"v", expiry_s=60)
        time.sleep(1.2)
        assert c.get("gone") is None and c.get("keep") == b"v"
        assert c.insert("gone", b"v2") is True  # expired counts as absent
    finally:
        c.close()


def test_yaml_couchbase_processor_ops(spark, server, tmp_path):
    src = tmp_path / "in"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id int, name string"
    ).write.parquet(str(src))
    # upsert documents keyed by interpolated id
    compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - couchbase:
        url: {server.address}
        id: doc-${{! this.id }}
        operation: upsert
        content: this.name.uppercase()
""").build_batch(spark).collect()
    direct = CouchbaseClient(server.host, server.port)
    assert direct.get("doc-1") == b"ALPHA" and direct.get("doc-2") == b"BETA"
    direct.close()
    # get back + miss errors the row (error protocol)
    probe = tmp_path / "probe"
    spark.createDataFrame([(1,), (2,), (9,)], "id int").write.parquet(str(probe))
    got = compile_yaml(f"""
input:
  parquet: {{path: {probe}}}
pipeline:
  processors:
    - couchbase:
        url: {server.address}
        id: doc-${{! this.id }}
        operation: get
""").build_batch(spark)
    rows = {r.id: (r.couchbase, r.error) for r in got.collect()}
    assert rows[1] == ("ALPHA", None) and rows[2] == ("BETA", None)
    assert rows[9][0] is None and "not found" in rows[9][1]
    # insert rejection flags the error column
    rej = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - couchbase:
        url: {server.address}
        id: doc-${{! this.id }}
        operation: insert
        content: this.name
""").build_batch(spark)
    assert all("already exists" in r.error for r in rej.collect())


def test_yaml_couchbase_requires_content_for_writes(spark, tmp_path):
    src = tmp_path / "in2"
    spark.range(1).write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - couchbase: {{url: "127.0.0.1:1", id: "x", operation: upsert}}
""")
    with pytest.raises(ValueError, match="content must be set"):
        p.build_batch(spark)


def test_cache_backend_contract(spark, server):
    c = CouchbaseCache(spark, server.address)
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


def test_yaml_couchbase_cache_resource(spark, server, tmp_path):
    src = tmp_path / "in3"
    spark.createDataFrame([(1, "x")], "id int, name string").write.parquet(str(src))
    resources = f"""
cache_resources:
  - label: docs
    couchbase: {{url: "{server.address}"}}
"""
    compile_yaml(f"""
input:
  parquet: {{path: {src}}}
{resources}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: docs, operator: set, key: k, columns: [name]}}
""").build_batch(spark)
    rows = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
{resources}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: docs, operator: get, key: k}}
""").build_batch(spark).collect()
    assert rows[0].value == "x"


def test_lint_knows_couchbase():
    from bento_spark.plans.lint import known_processors

    assert "couchbase" in known_processors()


def test_vbucket_mapping_is_deterministic(server):
    """Requests carry the public crc32-derived vbucket id (single-node
    parity) — the mini server ignores it, but the bytes must be stable."""
    import zlib

    from bento_spark.streaming.couchbase import _HDR

    key = b"doc-42"
    assert ((zlib.crc32(key) >> 16) & 0x7FFF) % 1024 == \
        ((zlib.crc32(key) >> 16) & 0x7FFF) % 1024
    c = CouchbaseClient(server.host, server.port)
    c.upsert("doc-42", b"v")
    assert c.get("doc-42") == b"v"
    c.close()


def test_yaml_struct_content_stores_json(spark, server, tmp_path):
    """Non-string Bloblang content must store as JSON, not Python repr."""
    import json

    src = tmp_path / "in4"
    spark.createDataFrame([(1, "alpha")], "id int, name string").write.parquet(str(src))
    compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - mapping: |
        root.doc = ("{{\\"k\\":\\"" + this.name + "\\",\\"n\\":" + this.id.string() + "}}").parse_json("k string, n bigint")
    - couchbase:
        url: {server.address}
        id: j-${{! this.id }}
        operation: upsert
        content: this.doc
""").build_batch(spark).collect()
    direct = CouchbaseClient(server.host, server.port)
    stored = direct.get("j-1")
    direct.close()
    assert stored is not None and json.loads(stored) == {"k": "alpha", "n": 1}
