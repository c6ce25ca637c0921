"""Memcached cache backend (reference internal/impl/memcached/cache.go):
text-protocol client + MemcachedCache operator contract, driven end-to-end
against the in-process MiniMemcachedServer."""

from __future__ import annotations

import time

import pytest

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.memcached import (
    MemcachedCache,
    MemcachedClient,
    MiniMemcachedServer,
    _exptime_s,
)


@pytest.fixture()
def server():
    s = MiniMemcachedServer().start()
    yield s
    s.stop()


def _kv(spark, *pairs):
    return spark.createDataFrame(list(pairs), "key string, value string")


# --------------------------------------------------------------------------
# client / protocol
# --------------------------------------------------------------------------


def test_client_protocol_roundtrip(server):
    c = MemcachedClient(server.host, server.port)
    try:
        c.set("a", b"1")
        c.set("b", b"two words \r\n binary \x00ok")
        assert c.get_many(["a", "b", "missing"]) == {
            "a": b"1",
            "b": b"two words \r\n binary \x00ok",
        }
        assert c.add("a", b"x") is False  # NOT_STORED -> ErrKeyAlreadyExists
        assert c.add("c", b"3") is True
        assert c.get_many(["a", "c"]) == {"a": b"1", "c": b"3"}
        assert c.delete("a") is True
        assert c.delete("a") is False
        assert c.get_many(["a"]) == {}
        with pytest.raises(ValueError, match="invalid key"):
            c.set("bad key", b"v")
    finally:
        c.close()


def test_client_expiry(server):
    c = MemcachedClient(server.host, server.port)
    try:
        c.set("gone", b"v", exptime_s=1)
        c.set("keep", b"v", exptime_s=60)
        time.sleep(1.2)
        assert c.get_many(["gone", "keep"]) == {"keep": b"v"}
        # expired counts as absent for add
        assert c.add("gone", b"v2") is True
    finally:
        c.close()


def test_exptime_rounds_up():
    assert _exptime_s(None) == 0  # never
    assert _exptime_s(100) == 1  # 100ms never becomes 0/never-expire
    assert _exptime_s(1000) == 1
    assert _exptime_s(1001) == 2


# --------------------------------------------------------------------------
# cache operator contract (same surface as RedisCache)
# --------------------------------------------------------------------------


def test_cache_set_get_delete(spark, server):
    c = MemcachedCache(spark, server.address)
    c.set(_kv(spark, ("a", "1"), ("b", "2")))
    enriched = c.get(spark.createDataFrame([("a",), ("b",), ("miss",)], "key string"))
    got = {r.key: r.value for r in enriched.collect()}
    assert got == {"a": "1", "b": "2", "miss": None}
    c.set(_kv(spark, ("a", "9")))  # set overwrites
    c.delete(spark.createDataFrame([("a",)], "key string"))
    probe = spark.createDataFrame([("a",), ("b",)], "key string")
    assert {r.key: r.value for r in c.get(probe).collect()} == {"a": None, "b": "2"}


def test_cache_add_rejects_existing(spark, server):
    c = MemcachedCache(spark, server.address)
    c.set(_kv(spark, ("a", "1")))
    rejected = c.add(_kv(spark, ("a", "x"), ("b", "2")))
    assert [r.key for r in rejected.collect()] == ["a"]
    direct = MemcachedClient(server.host, server.port)
    # existing value untouched, new key written
    assert direct.get_many(["a", "b"]) == {"a": b"1", "b": b"2"}
    direct.close()


def test_cache_ttl_expiry(spark, server):
    c = MemcachedCache(spark, server.address)
    c.set(_kv(spark, ("keep", "v")), ttl=60)
    c.set(_kv(spark, ("gone", "v")), ttl=1)
    time.sleep(1.2)
    probe = spark.createDataFrame([("keep",), ("gone",)], "key string")
    got = {r.key: r.value for r in c.get(probe).collect()}
    assert got == {"keep": "v", "gone": None}
    assert c.add(_kv(spark, ("gone", "v2"))).count() == 0
    assert {r.key: r.value for r in c.get(probe).collect()}["gone"] == "v2"


def test_cache_prefix_isolation(spark, server):
    c = MemcachedCache(spark, server.address, prefix="svc:")
    c.set(_kv(spark, ("k", "v")))
    direct = MemcachedClient(server.host, server.port)
    # prefixed on the wire (cache.go prefix field)
    assert direct.get_many(["svc:k"]) == {"svc:k": b"v"}
    direct.close()
    probe = spark.createDataFrame([("k",)], "key string")
    assert {r.key: r.value for r in c.get(probe).collect()} == {"k": "v"}


# --------------------------------------------------------------------------
# YAML cache_resources wiring
# --------------------------------------------------------------------------


def test_yaml_memcached_cache_roundtrip(spark, server, tmp_path):
    """Two compile_yaml invocations share state through the server — the
    same restart-survival contract as the redis backend."""
    src = tmp_path / "in"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id int, name string"
    ).write.parquet(str(src))
    resources = f"""
cache_resources:
  - label: names
    memcached: {{addresses: ["{server.address}"], prefix: "n:"}}
"""
    compile_yaml(f"""
input:
  parquet: {{path: {src}}}
{resources}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: names, operator: set, key: k, columns: [name]}}
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
    - cache: {{resource: names, operator: get, key: k}}
""").build_batch(spark).collect()
    }
    assert rows == {1: "alpha", 2: "beta"}


def test_yaml_memcached_requires_addresses(spark, tmp_path):
    src = tmp_path / "in2"
    spark.range(1).write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
cache_resources:
  - label: bad
    memcached: {{}}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: bad, operator: get, key: k}}
""")
    with pytest.raises(ValueError, match="memcached backend needs `addresses`"):
        p.build_batch(spark)
