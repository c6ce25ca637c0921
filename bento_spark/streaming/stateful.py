"""Custom stateful streaming operators (applyInPandasWithState).

Covers the reference capabilities that are stateful-but-not-a-window:
- the `count("name")` shared counter function
  (/root/reference/internal/bloblang/query/functions.go:270) — a named,
  monotonically increasing counter across messages;
- the batch policy: flush an accumulating batch when `count` / `byte_size`
  thresholds are crossed or a period elapses
  (/root/reference/internal/batch/policy/policy.go:22-41, Add triggers
  :103-135, flush :139-184) — used by outputs and the `batched` input;
- cache-with-TTL-style per-key state (cache resources, e.g.
  internal/impl/pure/cache_ttlru.go) via state timeouts.

Spark-first: `applyInPandasWithState` keeps per-key state in the state
store (RocksDB provider at scale), processes each key's rows as Arrow
batches (no per-row Python), and supports processing-time timeouts for the
period trigger. State is checkpointed — counters survive restarts, which is
strictly stronger than the reference's in-process counters (reset on
restart).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counter(
    df: DataFrame,
    key_col: str,
    out_schema: str | None = None,
) -> DataFrame:
    """Per-key running counter: each row gains `counter_value` = how many
    rows of this key have been seen so far (1-based, ordered by arrival
    within the stream). The streaming analogue of `count("name")`.

    Batch fallback: for bounded frames use row_number() over a window — this
    operator is for unbounded streams where the count must persist across
    micro-batches.
    """
    schema = out_schema or f"{key_col} string, n_rows int, counter_start long, counter_end long"

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (start,) = state.get if state.exists else (0,)
        n = 0
        for pdf in batches:
            n += len(pdf)
        state.update((start + n,))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_rows": [n],
                "counter_start": [start],
                "counter_end": [start + n],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="total long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_policy(
    df: DataFrame,
    key_col: str,
    payload_col: str,
    max_count: int = 0,
    max_bytes: int = 0,
    period_ms: int = 0,
    check: "object | str | None" = None,
) -> DataFrame:
    """Batch-policy accumulator (policy.go:22-41): per key, accumulate rows
    until `max_count` rows or `max_bytes` payload bytes, a row satisfies
    the `check` predicate, or `period_ms` elapses with a partial batch
    (the period trigger, policy.go:127-135); emit one row per flushed
    batch with the archived payload.

    `check` is the Bloblang content trigger (policy.go Add's check query,
    evaluated against the just-added part): a Column/expression string
    compiled to a per-row boolean BEFORE the stateful stage — the
    predicate runs JVM-side in codegen; only the resulting flag crosses
    into Python. Trigger order matches the reference: count -> byte_size
    -> check -> period.

    Output: (key, batch_seq, n_parts, n_bytes, payload) where payload is
    the newline-archive of the batch (archive processor semantics at the
    flush point, policy.go:139-184 runs per-batch processors on flush).
    """
    if not (max_count or max_bytes or period_ms or check is not None):
        raise ValueError("at least one of max_count/max_bytes/period_ms/check required")
    check_col = None
    if check is not None:
        from pyspark.sql import Column, functions as F

        if isinstance(check, str):
            from bento_spark.functions.bloblang import compile_expr

            check = compile_expr(check)
        if not isinstance(check, Column):
            raise ValueError("check must be a Column or Bloblang expression string")
        check_col = "_bp_check"
        df = df.withColumn(check_col, F.coalesce(check.cast("boolean"), F.lit(False)))

    out_schema = (
        f"{key_col} string, batch_seq long, n_parts int, n_bytes long, payload string"
    )
    timeout = GroupStateTimeout.ProcessingTimeTimeout if period_ms else GroupStateTimeout.NoTimeout

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            seq, pending_n, pending_bytes, pending_payload, deadline = state.get
        else:
            seq, pending_n, pending_bytes, pending_payload, deadline = 0, 0, 0, "", 0

        flushed: list[tuple] = []

        if state.hasTimedOut:
            if pending_n:
                flushed.append((key[0], seq, pending_n, pending_bytes, pending_payload))
                seq, pending_n, pending_bytes, pending_payload = seq + 1, 0, 0, ""
            deadline = 0
            state.update((seq, pending_n, pending_bytes, pending_payload, deadline))
        else:
            for pdf in batches:
                checks = pdf[check_col] if check_col else None
                for i, val in enumerate(pdf[payload_col]):
                    if val is None or (isinstance(val, float) and val != val):
                        continue  # a NULL part has no content — astype(str)
                        # would archive the literal string 'None'
                    val = str(val)
                    if pending_n == 0 and period_ms:
                        # the period measures time since the BATCH STARTED
                        # (policy.go:127-135), not time since last arrival
                        deadline = state.getCurrentProcessingTimeMs() + period_ms
                    pending_payload = val if not pending_n else pending_payload + "\n" + val
                    pending_n += 1
                    pending_bytes += len(val.encode())
                    # reference trigger order (policy.go:103-135):
                    # count -> byte_size -> check -> period
                    hit_count = max_count and pending_n >= max_count
                    hit_bytes = max_bytes and pending_bytes >= max_bytes
                    hit_check = checks is not None and bool(checks.iloc[i])
                    if hit_count or hit_bytes or hit_check:
                        flushed.append((key[0], seq, pending_n, pending_bytes, pending_payload))
                        seq, pending_n, pending_bytes, pending_payload = seq + 1, 0, 0, ""
                        deadline = 0
            state.update((seq, pending_n, pending_bytes, pending_payload, deadline))
            if period_ms and pending_n:
                # arm to the REMAINING time, never the full period — re-arming
                # period_ms per arrival lets a steady trickle postpone the
                # flush forever
                remaining = deadline - state.getCurrentProcessingTimeMs()
                state.setTimeoutDuration(max(1, remaining))

        yield pd.DataFrame(
            flushed, columns=[key_col, "batch_seq", "n_parts", "n_bytes", "payload"]
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seq long, pending_n int, pending_bytes long, pending_payload string, deadline long",
        outputMode="append",
        timeoutConf=timeout,
    )
