"""CEP sequence matching: "A then B then C within T" per key.

The north star calls for a structured-streaming/CEP engine; the reference
approximates event patterns with cache writes + checks (the hydration
pattern, config/examples/joining_streams.yaml) — here it is a first-class
operator with identical batch and streaming semantics:

- every step-0 event OPENS a pattern instance;
- each subsequent step matches the FIRST qualifying event (strictly later
  than the previous step, and no later than `within` after the pattern
  start — Flink-CEP-style `within` anchored at the start);
- a completed instance emits one match row (key, per-step timestamps,
  duration); an instance whose window passes unfinished expires.

Batch plan: per-step filtered frames chained with equi-key joins + range
filters and a min() per prefix — Catalyst extracts the equi key, so this is
a sort-merge join per step, never a cartesian. The per-key shuffle happens
once and is reused across steps (same key). SQL-mirrorable, so the operator
is oracle-gated.

Streaming plan: the step id is computed JVM-side (one CASE projection);
applyInPandasWithState keeps open instances per key as an
array<array<bigint>> of matched epoch-ms prefixes — state is bounded by
`within` (instances expire as event time passes) and the watermark bounds
replay. Processing per key is in event-time order within each batch, which
reproduces the batch first-match semantics for in-order (watermark-bounded)
streams.
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_DUR_RE = re.compile(r"^\s*(\d+)\s*(ms|milliseconds?|s|seconds?|m|minutes?|h|hours?)\s*$")
_DUR_MS = {"ms": 1, "millisecond": 1, "milliseconds": 1,
           "s": 1000, "second": 1000, "seconds": 1000,
           "m": 60_000, "minute": 60_000, "minutes": 60_000,
           "h": 3_600_000, "hour": 3_600_000, "hours": 3_600_000}


def duration_ms(src: str) -> int:
    m = _DUR_RE.match(src)
    if not m:
        raise ValueError(f"bad duration: {src!r} (e.g. '500 ms', '60 seconds', '2 minutes')")
    return int(m.group(1)) * _DUR_MS[m.group(2)]


def _names(steps: Sequence, step_names: Sequence[str] | None) -> list[str]:
    names = list(step_names) if step_names else [f"step_{i}" for i in range(len(steps))]
    if len(names) != len(steps):
        raise ValueError(f"{len(steps)} steps but {len(names)} names")
    return names


def match_sequence(
    df: DataFrame,
    key: str,
    ts_col: str,
    steps: Sequence[Column],
    within: str,
    step_names: Sequence[str] | None = None,
) -> DataFrame:
    """Batch pattern match. Returns one row per completed instance:
    (key, <name>_ms per step, duration_ms), ordered semantics as in the
    module docstring."""
    if len(steps) < 2:
        raise ValueError("match_sequence needs at least 2 steps")
    names = _names(steps, step_names)
    w_ms = duration_ms(within)
    # cast covers TIMESTAMP_NTZ sources (numeric no-op under the session's
    # UTC timezone, which bento_spark.session.get_spark pins)
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    # classify each event as its EARLIEST matching step (same CASE the
    # streaming twin uses) — an event satisfying several step predicates
    # must not enter multiple step frames, or batch and streaming diverge
    staged = df.withColumn("_step", step_index_expr(steps))
    frames = [
        staged.filter(F.col("_step") == i)
        .select(F.col(key), ts_ms.alias(f"_ts{i}"))
        .dropDuplicates()
        for i in range(len(steps))
    ]
    cur = frames[0]
    for i in range(1, len(steps)):
        nxt = frames[i].withColumnRenamed(key, "_k")
        prefix = [f"_ts{j}" for j in range(i)]
        cond = (
            (cur[key] == nxt["_k"])
            & (nxt[f"_ts{i}"] > cur[f"_ts{i - 1}"])
            & (nxt[f"_ts{i}"] <= cur["_ts0"] + F.lit(w_ms))
        )
        cur = (
            cur.join(nxt, cond)
            .groupBy(key, *prefix)
            .agg(F.min(f"_ts{i}").alias(f"_ts{i}"))
        )
    n = len(steps)
    return cur.select(
        key,
        *[F.col(f"_ts{i}").alias(f"{names[i]}_ms") for i in range(n)],
        (F.col(f"_ts{n - 1}") - F.col("_ts0")).alias("duration_ms"),
    )


def step_index_expr(steps: Sequence[Column]) -> Column:
    """First-matching-step id as ONE JVM-side CASE projection (an event
    matching several step predicates counts as the earliest step)."""
    out = None
    for i, s in enumerate(steps):
        out = F.when(s, i) if out is None else out.when(s, i)
    return out


def match_sequence_stream(
    df: DataFrame,
    key: str,
    ts_col: str,
    steps: Sequence[Column],
    within: str,
    watermark: str = "2 minutes",
    step_names: Sequence[str] | None = None,
) -> DataFrame:
    """Streaming twin of match_sequence over applyInPandasWithState."""
    if len(steps) < 2:
        raise ValueError("match_sequence needs at least 2 steps")
    names = _names(steps, step_names)
    n = len(steps)
    w_ms = duration_ms(within)
    key_type = df.schema[key].dataType.simpleString()
    ev = (
        df.withWatermark(ts_col, watermark)
        .withColumn("_step", step_index_expr(steps))
        .filter(F.col("_step").isNotNull())
        # the watermarked column must survive into the stateful operator for
        # event-time timeouts to resolve
        .select(key, F.col(ts_col),
                F.unix_millis(F.col(ts_col).cast("timestamp")).alias("_ts_ms"), "_step")
    )
    out_schema = (
        f"{key} {key_type}, "
        + ", ".join(f"{nm}_ms bigint" for nm in names)
        + ", duration_ms bigint"
    )

    def fn(k: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            pending = [list(p) for p in state.get[0]]
            opened = set(state.get[1])
        else:
            pending, opened = [], set()
        completed: list[list[int]] = []
        if not state.hasTimedOut:
            frames = [p for p in batches if len(p)]
            if frames:
                rows = pd.concat(frames).sort_values("_ts_ms", kind="mergesort")
                for ts, st in zip(rows["_ts_ms"].astype("int64"), rows["_step"].astype("int64")):
                    ts, st = int(ts), int(st)
                    if st == 0:
                        # `opened` remembers every start EVER opened within the
                        # horizon — a duplicate start row in a later batch must
                        # not re-open an instance that was already extended or
                        # completed (the batch twin dropDuplicates-es starts)
                        if ts not in opened:
                            opened.add(ts)
                            pending.append([ts])
                    else:
                        for p in pending:
                            if len(p) == st and ts > p[-1] and ts <= p[0] + w_ms:
                                p.append(ts)  # first qualifying event extends (in-order => min)
                                if len(p) == n:
                                    completed.append(p)
        # expiry horizon: the watermark ONLY. It is the engine's promise
        # that no older event arrives — anything whose window closed before
        # it can never complete. Tightening by this batch's max event time
        # would expire instances that a permitted-late event (inside the
        # watermark delay) arriving in a LATER batch could still complete —
        # missed matches vs the batch twin.
        wm = state.getCurrentWatermarkMs()
        pending = [p for p in pending if len(p) < n and p[0] + w_ms >= wm]
        opened = {t for t in opened if t + w_ms >= wm}
        if pending or opened:
            state.update((pending, sorted(opened)))
            # event-time timeout wakes the key to garbage-collect state even
            # if it never sees another event (idle-key leak fix); must be
            # strictly beyond the current watermark
            timeout = max(min(p[0] for p in pending) if pending else min(opened),
                          state.getCurrentWatermarkMs()) + w_ms + 1
            state.setTimeoutTimestamp(timeout)
        else:
            state.remove()
        if completed:
            yield pd.DataFrame(
                [[k[0], *p, p[-1] - p[0]] for p in completed],
                columns=[key, *[f"{nm}_ms" for nm in names], "duration_ms"],
            )

    return ev.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="pending array<array<bigint>>, opened array<bigint>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
