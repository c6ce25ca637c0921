"""`subprocess` processor: pipe message contents through an external command.

Reference: the subprocess processor keeps a child process alive for the
pipeline's lifetime; each message's content is written to its stdin followed
by a newline, and one response is expected back before the next message is
fed in. A stdout response replaces the message; a stderr response marks the
message as errored and leaves it unchanged; an early-exiting child is
restarted (/root/reference/internal/impl/io/processor_subprocess.go:47-66).
Framing codecs: lines, length_prefixed_uint32_be, netstring
(processor_subprocess.go:80-118).

Spark-first mapping: one long-lived child PER PARTITION inside mapInPandas
(the distributed analogue of one child per pipeline thread) with the same
lockstep write-then-read protocol. Reader threads drain stdout/stderr into
queues so a response on either stream is observed without blocking the
other; the error-column protocol carries stderr/timeout failures in-band.
Total child concurrency = #partitions — size it with `repartition`, exactly
like the http processor's note.

At scale the child is the bottleneck, not Spark: the per-row round trip
through two pipes dominates. That is inherent to the operator's contract
(the reference has the same shape); bulk transforms belong in Bloblang /
native columns, this exists for genuinely-external logic.
"""

from __future__ import annotations

import time
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bento_spark.operators.errors import ERROR_COL, ensure_error_col

_CODECS = ("lines", "length_prefixed_uint32_be", "netstring")


def frame_payload(data: bytes, codec: str) -> bytes:
    """Encode one payload for the child's stdin (codec_send)."""
    if codec == "lines":
        return data + b"\n"
    if codec == "length_prefixed_uint32_be":
        return len(data).to_bytes(4, "big") + data
    if codec == "netstring":
        return str(len(data)).encode("ascii") + b":" + data + b","
    raise ValueError(f"unsupported subprocess codec {codec!r} (supported: {_CODECS})")


def _read_exact(f, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = f.read(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def read_framed(f, codec: str) -> bytes | None:
    """Read one framed payload from the child's stdout (codec_recv).
    Returns None on EOF / malformed frame (treated as child death)."""
    if codec == "lines":
        line = f.readline()
        if not line:
            return None
        return line.rstrip(b"\n")
    if codec == "length_prefixed_uint32_be":
        header = _read_exact(f, 4)
        if header is None:
            return None
        return _read_exact(f, int.from_bytes(header, "big"))
    if codec == "netstring":
        digits = b""
        while True:
            ch = f.read(1)
            if not ch:
                return None
            if ch == b":":
                break
            if not ch.isdigit() or len(digits) > 9:
                return None
            digits += ch
        body = _read_exact(f, int(digits or b"0"))
        if body is None or _read_exact(f, 1) != b",":
            return None
        return body
    raise ValueError(f"unsupported subprocess codec {codec!r} (supported: {_CODECS})")


def subprocess_map(
    df: DataFrame,
    name: str,
    args: Sequence[str] = (),
    col: str = "text",
    codec_send: str = "lines",
    codec_recv: str = "lines",
    timeout: float = 10.0,
    rate_limit: tuple[float, float] | None = None,
) -> DataFrame:
    """Replace `col` with the child's stdout response per row; stderr lines
    follow the error-column protocol (row errored, value unchanged). NULL
    values pass through untouched. The child must flush its pipes per
    response (the reference documents the same requirement).

    `rate_limit` is a per-partition (rate_per_s, burst) share of a named
    rate_limit resource (see operators/rate_limit.py) — each message
    exchange first takes a token."""
    if codec_send not in _CODECS or codec_recv not in _CODECS:
        raise ValueError(f"unsupported subprocess codec (supported: {_CODECS})")
    df = ensure_error_col(df)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if col not in fields:
        raise ValueError(f"subprocess col {col!r} not in {sorted(fields)}")
    is_binary = fields[col] == "binary"
    out_schema = ", ".join(f"{c} {fields[c]}" for c in df.columns)
    argv = [name, *args]
    cols = list(df.columns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imports inside the closure: cloudpickled submodule references must
        # re-resolve on the worker (repo invariant)
        import queue as _queue
        import select as _select
        import subprocess as _sp
        import threading as _threading

        from bento_spark.operators.rate_limit import make_limiter

        bucket = make_limiter(rate_limit)
        state: dict = {"proc": None, "q_out": None, "q_err": None}

        def start() -> None:
            proc = _sp.Popen(argv, stdin=_sp.PIPE, stdout=_sp.PIPE, stderr=_sp.PIPE, bufsize=0)
            q_out: _queue.Queue = _queue.Queue()
            q_err: _queue.Queue = _queue.Queue()

            def pump_out() -> None:
                try:
                    while True:
                        payload = read_framed(proc.stdout, codec_recv)
                        if payload is None:
                            return
                        q_out.put(payload)
                except Exception:  # noqa: BLE001 — reader death == child death
                    return

            def pump_err() -> None:
                try:
                    for line in iter(proc.stderr.readline, b""):
                        # signal BEFORE the (preemptible) queue put: once
                        # readline returned, the pipe bytes are consumed, so
                        # a zero-timeout select on the raw fd goes dark — a
                        # GIL deschedule here (ms under load) would let the
                        # consumer misread "no stderr". err_seen closes that
                        # window: the consumer compares it to its taken
                        # count and waits for the in-flight line.
                        state["err_seen"] += 1
                        q_err.put(line.rstrip(b"\n"))
                except Exception:  # noqa: BLE001
                    return

            state.update(proc=proc, q_out=q_out, q_err=q_err,
                         err_seen=0, err_taken=0)
            for target in (pump_out, pump_err):
                _threading.Thread(target=target, daemon=True).start()

        def stop() -> None:
            proc = state["proc"]
            state["proc"] = None
            if proc is not None:
                try:
                    proc.kill()
                    proc.wait(timeout=5)
                except Exception:  # noqa: BLE001
                    pass

        def drain(q) -> int:
            # lockstep hygiene: leftovers from a row that produced BOTH a
            # stdout response and a stderr line (only one is consumed) must
            # not be dequeued by the NEXT row — that mis-attributes the
            # message and desyncs the protocol for the rest of the partition
            n = 0
            while True:
                try:
                    q.get_nowait()
                    n += 1
                    if q is state.get("q_err"):
                        state["err_taken"] += 1
                except _queue.Empty:
                    return n

        def settle_drain() -> None:
            # after ANY stderr activity the previous row may have an
            # in-flight companion (written by the child before it blocked on
            # the next read, but not yet through the pump threads — GIL
            # scheduling can lag them by ms under load). Bounded quiesce:
            # sleep yields the GIL so the pumps run; stop after one fully
            # quiet pass. Only suspect rows pay this; clean pipelines skip.
            deadline = time.monotonic() + 0.05
            while time.monotonic() < deadline:
                moved = drain(state["q_out"]) + drain(state["q_err"])
                pipes = [p for p in (state["proc"].stdout, state["proc"].stderr) if p]
                readable = _select.select(pipes, [], [], 0)[0] if pipes else []
                if not moved and not readable:
                    return
                time.sleep(0.001)

        def exchange(value):
            """One lockstep round trip -> (new_value, error)."""
            if value is None:
                return None, None
            if bucket is not None:
                bucket.acquire()
            data = bytes(value) if is_binary else str(value).encode("utf-8")
            # two attempts: a child that died mid-stream is restarted once
            # per row (the reference restarts early-exiting children)
            for attempt in (0, 1):
                if state["proc"] is None or state["proc"].poll() is not None:
                    stop()
                    try:
                        start()
                    except OSError as e:
                        return value, f"subprocess start failed: {e}"
                if state.get("suspect"):
                    settle_drain()
                    state["suspect"] = False
                elif drain(state["q_out"]) + drain(state["q_err"]):
                    settle_drain()
                try:
                    state["proc"].stdin.write(frame_payload(data, codec_send))
                    state["proc"].stdin.flush()
                except (BrokenPipeError, OSError):
                    stop()
                    continue
                deadline = time.monotonic() + timeout
                died = False
                while time.monotonic() < deadline:
                    try:
                        err = state["q_err"].get_nowait()
                        state["err_taken"] += 1
                        # a both-streams child (stderr verdict + stdout echo
                        # for the same message) leaves the echo in flight; a
                        # bounded companion-consume plus the suspect-row
                        # settle before the NEXT write keeps it from
                        # offsetting later rows
                        state["suspect"] = True
                        try:
                            state["q_out"].get(timeout=0.02)
                        except _queue.Empty:
                            pass
                        return value, f"subprocess stderr: {err.decode('utf-8', 'replace')}"
                    except _queue.Empty:
                        pass
                    try:
                        out = state["q_out"].get(timeout=0.005)
                        # a child that ALSO wrote stderr for this message
                        # (out-of-contract: processor_subprocess.go:54 says
                        # "either ... or"): the stderr verdict wins. The
                        # child writes sequentially, so its stderr hit the
                        # OS pipe before this stdout — check the queue, then
                        # the raw pipe for bytes the pump thread hasn't
                        # drained yet (zero-cost select on the happy path).
                        err = None
                        try:
                            err = state["q_err"].get_nowait()
                        except _queue.Empty:
                            # two late-stderr windows: bytes still in the OS
                            # pipe (select sees them), or already consumed by
                            # the pump but not yet queued (err_seen counter —
                            # the GIL-deschedule window a loaded host hits)
                            if (_select.select([state["proc"].stderr],
                                               [], [], 0)[0]
                                    or state["err_seen"] > state["err_taken"]):
                                try:
                                    err = state["q_err"].get(timeout=0.2)
                                except _queue.Empty:
                                    pass
                        if err is not None:
                            state["err_taken"] += 1
                            state["suspect"] = True
                            return value, f"subprocess stderr: {err.decode('utf-8', 'replace')}"
                        return (bytes(out) if is_binary else out.decode("utf-8", "replace")), None
                    except _queue.Empty:
                        pass
                    if state["proc"].poll() is not None:
                        # give the reader threads one last drain pass
                        try:
                            out = state["q_out"].get(timeout=0.05)
                            return (bytes(out) if is_binary else out.decode("utf-8", "replace")), None
                        except _queue.Empty:
                            died = True
                            break
                stop()
                if not died:
                    return value, f"subprocess timeout after {timeout}s"
            return value, "subprocess exited before responding"

        # finally, not a trailing call: early generator termination (limit,
        # task kill, downstream exception) raises GeneratorExit out of the
        # yield, and a reused Python worker would otherwise leak the child
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vals, errs = [], []
                for i in range(len(pdf)):
                    prior = pdf[ERROR_COL].iloc[i]
                    if isinstance(prior, str):  # already-errored rows short-circuit
                        vals.append(pdf[col].iloc[i])
                        errs.append(prior)
                        continue
                    new_val, err = exchange(pdf[col].iloc[i])
                    vals.append(new_val)
                    errs.append(err)
                out = pdf[cols].copy()
                out[col] = vals
                out[ERROR_COL] = errs
                yield out
        finally:
            stop()

    return df.mapInPandas(run, schema=out_schema)


_ARGS_COL = "_cmd_args"


def command_map(
    df: DataFrame,
    name: str,
    args: Sequence[str] | Column = (),
    col: str = "text",
    timeout: float = 10.0,
    stderr_col: str = "command_stderr",
    rate_limit: tuple[float, float] | None = None,
) -> DataFrame:
    """`command` processor: one process execution PER MESSAGE
    (/root/reference/internal/impl/io/processor_command.go:17-28) — message
    content on stdin, stdout replaces it. Non-zero exit -> error column set
    to stderr (or a generic message); zero exit with stderr output ->
    `stderr_col` populated (the reference's command_stderr metadata field).

    `args` may be a Column resolving to array<string> per row (the
    reference's args_mapping Bloblang field, e.g.
    `compile_expr('["-c", this.script]')`) — evaluated JVM-side before the
    Python stage — or a static list. The reference documents this processor
    as slow by design (a fork per message); prefer subprocess_map for
    throughput."""
    df = ensure_error_col(df)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if col not in fields:
        raise ValueError(f"command col {col!r} not in {sorted(fields)}")
    is_binary = fields[col] == "binary"
    if isinstance(args, Column):
        df = df.withColumn(_ARGS_COL, args)
    else:
        df = df.withColumn(_ARGS_COL, F.array(*[F.lit(str(a)) for a in args]))
    cols = [c for c in df.columns if c != _ARGS_COL]
    if stderr_col in cols:
        # a duplicate name would desync the declared Arrow schema (listed
        # twice) from the yielded frame (present once)
        raise ValueError(f"command: stderr_col {stderr_col!r} collides with an input column")
    out_schema = ", ".join(
        [f"{c} {fields[c]}" for c in cols] + [f"{stderr_col} string"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import subprocess as _sp

        from bento_spark.operators.rate_limit import make_limiter

        bucket = make_limiter(rate_limit)

        def one(value, row_args):
            """-> (new_value, stderr_text, error)."""
            if value is None:
                return None, None, None
            if bucket is not None:
                bucket.acquire()
            data = bytes(value) if is_binary else str(value).encode("utf-8")
            argv = [name, *(list(row_args) if row_args is not None else [])]
            try:
                proc = _sp.run(
                    argv, input=data, capture_output=True, timeout=timeout, check=False
                )
            except OSError as e:
                return value, None, f"command failed to start: {e}"
            except _sp.TimeoutExpired:
                return value, None, f"command timeout after {timeout}s"
            err_txt = proc.stderr.decode("utf-8", "replace").strip() or None
            if proc.returncode != 0:
                return value, None, err_txt or f"command exited {proc.returncode}"
            out = proc.stdout if is_binary else proc.stdout.decode("utf-8", "replace")
            return out, err_txt, None

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals, stderrs, errs = [], [], []
            for i in range(len(pdf)):
                prior = pdf[ERROR_COL].iloc[i]
                if isinstance(prior, str):
                    vals.append(pdf[col].iloc[i])
                    stderrs.append(None)
                    errs.append(prior)
                    continue
                new_val, err_txt, err = one(pdf[col].iloc[i], pdf[_ARGS_COL].iloc[i])
                vals.append(new_val)
                stderrs.append(err_txt)
                errs.append(err)
            out = pdf[cols].copy()
            out[col] = vals
            out[ERROR_COL] = errs
            out[stderr_col] = stderrs
            yield out

    return df.mapInPandas(run, schema=out_schema)
