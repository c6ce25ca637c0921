"""Shared `rate_limit` resources — named token buckets capping request
rates across components.

Reference: rate limits are registered as named resources
(/root/reference/internal/impl/pure/rate_limit_local.go:31 — "X every Y",
sharable across any number of components, explicitly NOT distributed
across running instances) and referenced by components — the `http`
processor caps request rate service-wide via its `rate_limit` field
(internal/impl/io/processor_http.go:18).

Spark-first mapping: a rate limit declared once in YAML
(`rate_limit_resources: [{label: api, count: 10, interval: 1s}]`) is
resolved at compile time to a PER-PARTITION share: each partition's
Python worker runs its own token bucket at `count / P` tokens per
`interval`, where P is the maximum task concurrency
(`sparkContext.defaultParallelism` — Spark never runs more than P tasks
at once, so the AGGREGATE request rate across all partitions is bounded
by `count / interval` regardless of how many partitions the stage has).
This is the honest distributed analogue of the reference's local
limiter: no coordination, guaranteed aggregate cap, at the cost of
underutilization when fewer than P tasks are enriching concurrently.
On a real cluster P = executors x cores (pass `parallelism:` on the
resource to override when the session's defaultParallelism differs from
the cluster's true slot count).

The bucket is a standard token bucket (smooth refill at `count/interval`
tokens/sec, burst capacity `count/P`) rather than the reference's
windowed reset — over any horizon >= one interval the admitted count is
identical, and smooth spacing is kinder to the remote service than a
full-window burst.
"""

from __future__ import annotations

import time


class RedisWindowLimiter:
    """Distributed fixed-window limiter — the reference's `redis` rate
    limit (/root/reference/internal/impl/redis/rate_limit.go:89: Lua
    `INCR key`; the first increment arms `PEXPIRE interval`; a count
    beyond the cap waits out `PTTL`). Every worker that references the
    resource shares ONE window keyed in Redis, so the aggregate cap needs
    no per-partition division — this is the coordinated alternative to
    the local token bucket's divide-by-parallelism share, at the cost of
    one Redis round-trip per admitted request.

    The reference runs INCR+PEXPIRE atomically in Lua; over two plain
    commands a client crash in between could leave a counter with no
    expiry (a stuck-full window). `acquire` heals that: when over the cap
    it checks PTTL and re-arms a missing expiry instead of waiting
    forever.

    The connection opens lazily on first acquire (the object is built
    driver-side and pickled into executors; sockets don't pickle)."""

    def __init__(self, host: str, port: int, key: str, count: int, interval_ms: int):
        if count <= 0:
            raise ValueError(f"rate_limit count must be > 0, got {count}")
        if interval_ms <= 0:
            raise ValueError(f"rate_limit interval must be > 0 ms, got {interval_ms}")
        self.host, self.port, self.key = host, int(port), key
        self.count, self.interval_ms = int(count), int(interval_ms)
        self._client = None

    def __getstate__(self):
        return {k: v for k, v in self.__dict__.items() if k != "_client"}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._client = None

    def _cmd(self, *args):
        if self._client is None:
            from bento_spark.streaming.redis import RedisClient

            self._client = RedisClient(self.host, self.port)
        return self._client.cmd(*args)

    def acquire(self) -> None:
        while True:
            n = int(self._cmd("INCR", self.key))
            if n == 1:
                self._cmd("PEXPIRE", self.key, str(self.interval_ms))
            if n <= self.count:
                return
            ttl = int(self._cmd("PTTL", self.key))
            if ttl < 0:  # counter with no expiry (lost PEXPIRE) — re-arm
                self._cmd("PEXPIRE", self.key, str(self.interval_ms))
                ttl = self.interval_ms
            time.sleep(min(max(ttl, 1) / 1000.0, 0.25))

    def close(self) -> None:
        if self._client is not None:
            self._client.close()
            self._client = None


def make_limiter(spec):
    """Build a worker-side limiter from the picklable spec the compiler
    resolved: None → None; (rate_per_s, burst) → per-partition
    TokenBucket share; a dict with kind='redis' → shared
    RedisWindowLimiter. Components call `limiter.acquire()` before each
    request regardless of kind."""
    if spec is None:
        return None
    if isinstance(spec, RedisWindowLimiter):
        return spec
    if isinstance(spec, dict):
        if spec.get("kind") == "redis":
            return RedisWindowLimiter(
                spec["host"], spec["port"], spec["key"],
                spec["count"], spec["interval_ms"],
            )
        return TokenBucket(spec["rate_per_s"], spec.get("burst", 1.0))
    return TokenBucket(*spec)


class TokenBucket:
    """Blocking token bucket: `acquire()` sleeps until a token is granted.

    rate_per_s — sustained tokens/sec; burst — bucket capacity (starts
    full). Fractional rates are fine (a partition whose share is 0.3
    tokens/interval grants one request every ~3.3 intervals)."""

    def __init__(self, rate_per_s: float, burst: float = 1.0):
        if rate_per_s <= 0:
            raise ValueError(f"rate_per_s must be > 0, got {rate_per_s}")
        self.rate = float(rate_per_s)
        self.capacity = max(float(burst), 1.0)
        self.tokens = self.capacity
        self.last = time.monotonic()

    def acquire(self) -> None:
        while True:
            now = time.monotonic()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            # sleep just long enough for the next token (capped so a
            # clock hiccup can't oversleep a slow bucket by much)
            time.sleep(min((1.0 - self.tokens) / self.rate, 0.25))


def per_partition_share(count: int, interval_ms: int, parallelism: int) -> tuple[float, float]:
    """(rate_per_s, burst) for one partition's bucket given the resource's
    aggregate `count` per `interval` and the max task concurrency."""
    if count <= 0:
        raise ValueError(f"rate_limit count must be > 0, got {count}")
    if interval_ms <= 0:
        raise ValueError(f"rate_limit interval must be > 0 ms, got {interval_ms}")
    p = max(int(parallelism), 1)
    rate = (count * 1000.0 / interval_ms) / p
    return rate, max(1.0, count / p)
