"""Stateful stream-stream join: clip stream ⋈ transcript stream.

Reference realization: the cache-hydration pattern — each stream writes
itself to a TTL'd cache keyed by id and probes for the other side
(/root/reference/config/examples/joining_streams.yaml:32-56; cache ops
/root/reference/internal/impl/pure/processor_cache.go:267-273). That is a
hand-rolled, at-least-once, single-node stateful join.

Spark-first: the native watermarked stream-stream join. State is bounded
by the watermark + time-bound condition (state rows older than watermark
are evicted — the TTL analogue), stored in RocksDB for scale, and the
result is exactly-once through checkpointing. The time-bound condition is
REQUIRED for state eviction on both sides; without it state grows forever
at 10^12-clip scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "clip_id",
    left_ts: str = "event_ts",
    right_ts: str = "t_event_ts",
    watermark: str = "10 seconds",
    max_lag: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on `key` with an event-time bound:
    right_ts ∈ [left_ts, left_ts + max_lag].

    Both sides carry a watermark of `watermark`; Spark derives state
    eviction from watermark + the range condition. `how` supports inner /
    leftOuter (outer emits nulls only after watermark passes — same
    late-data contract as the reference's window flush).
    """
    # explicit side aliases: lw[...]/rw[...] attribute refs are ambiguous
    # when both streams derive from the SAME staged frame (self-join
    # lineage), and drop(rw[key]) leaves a trivially-true `key == key`
    # self-comparison in the resolved plan's warning path
    lw = left.withWatermark(left_ts, watermark).alias("__l")
    rw = right.withWatermark(right_ts, watermark).alias("__r")
    lcol = lambda c: F.col(f"__l.{c}")  # noqa: E731
    rcol = lambda c: F.col(f"__r.{c}")  # noqa: E731
    cond = (
        (lcol(key) == rcol(key))
        & (rcol(right_ts) >= lcol(left_ts))
        & (rcol(right_ts) <= lcol(left_ts) + F.expr(f"INTERVAL {max_lag}"))
    )
    joined = lw.join(rw, cond, how)
    return joined.select(*[lcol(c) for c in left.columns],
                         *[rcol(c) for c in right.columns if c != key])
