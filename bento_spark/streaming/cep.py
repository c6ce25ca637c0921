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
replay.

Late-data semantics are a policy choice (`late_policy`):

- ``"eager"`` (default): events are applied to open instances as they
  arrive, in event-time order WITHIN each micro-batch. Emission is timely
  (a completed funnel emits in the batch that delivered its final step),
  but a permitted-late event — one inside the watermark delay that arrives
  in a LATER micro-batch than an already-applied later-timestamp event —
  cannot displace that event, so an emitted step timestamp may exceed the
  batch twin's minimum. Exactly equivalent to the batch operator only for
  streams that are in-order across micro-batches per key.
- ``"buffer"``: events are buffered in state and applied only once the
  watermark has passed them, so the per-key replay is globally event-time
  ordered and the output rows are EXACTLY the batch operator's for any
  arrival order the watermark admits. The cost is emission latency: a
  match emits only after the watermark passes its final step (the same
  trade append-mode windowed aggregation makes), so tail-of-stream matches
  inside the final watermark delay are not emitted until the watermark
  moves.
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
    late_policy: str = "eager",
) -> DataFrame:
    """Streaming twin of match_sequence over applyInPandasWithState.

    late_policy: "eager" (timely, in-order equivalence) or "buffer"
    (watermark-gated, exact batch equivalence) — module docstring has the
    full contract.
    """
    if len(steps) < 2:
        raise ValueError("match_sequence needs at least 2 steps")
    if late_policy not in ("eager", "buffer"):
        raise ValueError(f"late_policy must be 'eager' or 'buffer', got {late_policy!r}")
    buffered = late_policy == "buffer"
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
            buf = {(int(e[0]), int(e[1])) for e in state.get[0]}
            pending = [list(p) for p in state.get[1]]
            opened = set(state.get[2])
        else:
            buf, pending, opened = set(), [], set()
        wm = state.getCurrentWatermarkMs()
        arrived: list[tuple[int, int]] = []
        if not state.hasTimedOut:
            frames = [p for p in batches if len(p)]
            if frames:
                rows = pd.concat(frames)
                arrived = [(int(t), int(s)) for t, s in
                           zip(rows["_ts_ms"].astype("int64"), rows["_step"].astype("int64"))]
        if buffered:
            # exact batch equivalence: an event is applied only once the
            # watermark passes it (ts <= wm — nothing with ts < wm can
            # arrive anymore), so replay is globally event-time ordered per
            # key and late events land in their rightful position. Events
            # still ahead of the watermark wait in state; the (ts, step)
            # set dedups re-deliveries like the batch twin's dropDuplicates.
            buf.update(arrived)
            ready = sorted(e for e in buf if e[0] <= wm)
            buf = {e for e in buf if e[0] > wm}
        else:
            # eager: apply this batch's events now, in event-time order
            # within the batch (in-order streams => batch-equal; see module
            # docstring for the permitted-late caveat).
            ready = sorted(arrived)
        completed: list[list[int]] = []
        for ts, st in ready:
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
                        p.append(ts)  # first qualifying event in replay order = min
                        if len(p) == n:
                            completed.append(p)
        # expiry horizon: the watermark ONLY. It is the engine's promise
        # that no older event arrives — anything whose window closed before
        # it can never complete. Tightening by this batch's max event time
        # would expire instances that a permitted-late event (inside the
        # watermark delay) arriving in a LATER batch could still complete —
        # missed matches vs the batch twin.
        pending = [p for p in pending if len(p) < n and p[0] + w_ms >= wm]
        opened = {t for t in opened if t + w_ms >= wm}
        if pending or opened or buf:
            state.update((sorted(buf), pending, sorted(opened)))
            # event-time timeout wakes the key as soon as the watermark can
            # make progress for it: past a buffered event (so it gets
            # applied), or past an instance window (so state is
            # garbage-collected even if the key never sees another event).
            # Must be strictly beyond the current watermark.
            cands = []
            if pending:
                cands.append(min(p[0] for p in pending) + w_ms)
            if opened:
                cands.append(min(opened) + w_ms)
            if buf:
                cands.append(min(e[0] for e in buf))
            state.setTimeoutTimestamp(max(min(cands), wm) + 1)
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
        stateStructType=("buffer array<array<bigint>>, "
                         "pending array<array<bigint>>, opened array<bigint>"),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
