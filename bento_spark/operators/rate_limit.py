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
