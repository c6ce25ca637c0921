"""Redis-backed shared state: the `redis` cache backend
(reference internal/impl/redis/cache.go — GET/SET PX/SET NX/DEL with
prefix + default_ttl) and the `redis` rate limit (rate_limit.go:89 —
shared fixed window via INCR/PEXPIRE/PTTL), both driven end-to-end
against the in-process MiniRedisServer."""

from __future__ import annotations

import threading
import time

import pytest

from bento_spark.operators.rate_limit import RedisWindowLimiter, TokenBucket, make_limiter
from bento_spark.plans.compiler import compile_yaml
from bento_spark.plans.lint import lint_yaml
from bento_spark.streaming.redis import MiniRedisServer, RedisCache, RedisClient


@pytest.fixture()
def server():
    s = MiniRedisServer().start()
    yield s
    s.stop()


# --------------------------------------------------------------------------
# cache backend
# --------------------------------------------------------------------------


def _kv(spark, *pairs):
    return spark.createDataFrame(list(pairs), "key string, value string")


def test_cache_set_get_delete(spark, server):
    c = RedisCache(spark, f"tcp://{server.host}:{server.port}")
    c.set(_kv(spark, ("a", "1"), ("b", "2")))
    enriched = c.get(spark.createDataFrame([("a",), ("b",), ("miss",)], "key string"))
    got = {r.key: r.value for r in enriched.collect()}
    assert got == {"a": "1", "b": "2", "miss": None}
    # set overwrites
    c.set(_kv(spark, ("a", "9")))
    assert {r.key: r.value for r in c.snapshot().collect()} == {"a": "9", "b": "2"}
    c.delete(spark.createDataFrame([("a",)], "key string"))
    assert {r.key for r in c.snapshot().collect()} == {"b"}


def test_cache_add_rejects_existing(spark, server):
    c = RedisCache(spark, f"{server.host}:{server.port}")
    c.set(_kv(spark, ("a", "1")))
    rejected = c.add(_kv(spark, ("a", "x"), ("b", "2")))
    assert [r.key for r in rejected.collect()] == ["a"]
    # existing value untouched, new key written (cache.go:182 NX semantics)
    assert {r.key: r.value for r in c.snapshot().collect()} == {"a": "1", "b": "2"}


def test_cache_ttl_expiry(spark, server):
    c = RedisCache(spark, f"{server.host}:{server.port}")
    # long TTL survives the Spark-action latency; short TTL expires
    c.set(_kv(spark, ("keep", "v")), ttl=60)
    c.set(_kv(spark, ("gone", "v")), ttl=0.2)
    time.sleep(0.5)
    probe = spark.createDataFrame([("keep",), ("gone",)], "key string")
    got = {r.key: r.value for r in c.get(probe).collect()}
    assert got == {"keep": "v", "gone": None}
    # an expired key counts as absent for add
    assert c.add(_kv(spark, ("gone", "v2"))).count() == 0
    assert c.get(probe).collect() and {
        r.key: r.value for r in c.get(probe).collect()
    }["gone"] == "v2"


def test_cache_prefix_isolation(spark, server):
    direct = RedisClient(server.host, server.port)
    direct.cmd("SET", "other_service_key", "noise")
    c = RedisCache(spark, f"{server.host}:{server.port}", prefix="svc:")
    c.set(_kv(spark, ("k", "v")))
    # prefixed on the wire (cache.go prefix field), stripped in the snapshot
    assert direct.cmd("GET", "svc:k") == b"v"
    assert {r.key: r.value for r in c.snapshot().collect()} == {"k": "v"}
    direct.close()


def test_cache_default_ttl(spark, server):
    c = RedisCache(spark, f"{server.host}:{server.port}", default_ttl=0.3)
    c.set(_kv(spark, ("d", "v")))  # no per-call ttl -> resource default
    direct = RedisClient(server.host, server.port)
    assert int(direct.cmd("PTTL", "d")) > 0
    direct.close()


def test_yaml_redis_cache_roundtrip(spark, server, tmp_path):
    """Two compile_yaml invocations share state through the server — the
    same restart-survival contract as the file backend."""
    src = tmp_path / "in"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id int, name string"
    ).write.parquet(str(src))
    resources = f"""
cache_resources:
  - label: names
    redis: {{url: "tcp://{server.host}:{server.port}", prefix: "n:"}}
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


def test_yaml_redis_multi_column_set_raises(spark, server, tmp_path):
    src = tmp_path / "in2"
    spark.createDataFrame([(1, "a", "b")], "id int, x string, y string").write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
cache_resources:
  - label: c
    redis: {{url: "{server.host}:{server.port}"}}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: c, operator: set, key: k}}
""")
    with pytest.raises(ValueError, match="single value column"):
        p.build_batch(spark)


# --------------------------------------------------------------------------
# rate limit backend
# --------------------------------------------------------------------------


def test_limiter_caps_rate_per_window(server):
    # count=2 per 250ms: 6 acquires need >= 3 windows => >= ~500ms total
    lim = RedisWindowLimiter(server.host, server.port, "rl1", count=2, interval_ms=250)
    t0 = time.monotonic()
    for _ in range(6):
        lim.acquire()
    elapsed = time.monotonic() - t0
    lim.close()
    assert elapsed >= 0.45, f"6 acquires at 2/250ms finished in {elapsed:.3f}s"
    assert elapsed < 3.0


def test_limiter_shared_across_instances(server):
    """Two limiter objects (two 'workers') share ONE window — the
    distributed property the local token bucket can only approximate by
    dividing the cap."""
    a = RedisWindowLimiter(server.host, server.port, "rl2", count=4, interval_ms=600_000)
    b = RedisWindowLimiter(server.host, server.port, "rl2", count=4, interval_ms=600_000)
    for _ in range(2):
        a.acquire()
        b.acquire()
    # window is full: a 5th acquire from EITHER instance blocks
    blocked = threading.Event()

    def fifth():
        a.acquire()
        blocked.set()

    t = threading.Thread(target=fifth, daemon=True)
    t.start()
    assert not blocked.wait(0.4), "5th acquire was admitted over a full shared window"
    # deleting the key opens a fresh window and releases the waiter
    direct = RedisClient(server.host, server.port)
    direct.cmd("DEL", "rl2")
    direct.close()
    assert blocked.wait(2.0), "acquire did not recover after the window reset"
    a.close()
    b.close()


def test_limiter_heals_missing_expiry(server):
    """A counter left without PEXPIRE (crashed client) must not block
    forever — acquire re-arms the expiry and proceeds next window."""
    direct = RedisClient(server.host, server.port)
    direct.cmd("SET", "rl3", "99")  # over-cap counter, no expiry
    assert int(direct.cmd("PTTL", "rl3")) == -1
    lim = RedisWindowLimiter(server.host, server.port, "rl3", count=5, interval_ms=200)
    t0 = time.monotonic()
    lim.acquire()  # re-arms expiry, waits out the window, then admits
    assert time.monotonic() - t0 < 5.0
    assert int(direct.cmd("PTTL", "rl3")) > 0 or direct.cmd("GET", "rl3") is None
    lim.close()
    direct.close()


def test_make_limiter_dispatch(server):
    assert make_limiter(None) is None
    assert isinstance(make_limiter((5.0, 2.0)), TokenBucket)
    lim = make_limiter({
        "kind": "redis", "host": server.host, "port": server.port,
        "key": "rl4", "count": 3, "interval_ms": 1000,
    })
    assert isinstance(lim, RedisWindowLimiter)
    lim.acquire()
    lim.close()


def test_compiler_resolves_redis_rate_limit_spec(spark, server, tmp_path):
    src = tmp_path / "in3"
    spark.createDataFrame([(1,)], "id int").write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
rate_limit_resources:
  - label: api
    redis:
      url: "tcp://{server.host}:{server.port}"
      key: shared_api
      count: 7
      interval: 2s
""")
    df = spark.read.parquet(str(src))
    spec = p._rate_limit_share("api", df)
    assert spec == {
        "kind": "redis", "host": server.host, "port": server.port,
        "key": "shared_api", "count": 7, "interval_ms": 2000,
    }
    # pickles into executors (sockets excluded), then connects lazily
    import pickle

    lim = pickle.loads(pickle.dumps(make_limiter(spec)))
    lim.acquire()
    lim.close()


def test_lint_redis_resources():
    assert lint_yaml("""
cache_resources:
  - label: a
    redis: {url: "tcp://h:6379", prefix: "x:", default_ttl: 5m}
rate_limit_resources:
  - label: b
    redis: {url: "tcp://h:6379", key: k, count: 10, interval: 1s}
""") == []
    issues = lint_yaml("""
cache_resources:
  - label: a
    redis: {prefix: "x:"}
rate_limit_resources:
  - label: b
    redis: {key: k}
  - label: c
    redis: {url: "tcp://h:6379", interval: nope}
""")
    assert any("(redis): missing 'url'" in s for s in issues)
    assert sum("missing 'url'" in s for s in issues) == 2
    assert any("bad duration" in s for s in issues)
