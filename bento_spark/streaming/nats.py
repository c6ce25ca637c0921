"""NATS input/output — dependency-free client for the core NATS text
protocol (public spec: docs.nats.io "Client Protocol": INFO/CONNECT/PUB/
SUB/UNSUB/MSG/PING/PONG/+OK/-ERR), plus an in-process test server.

Reference: internal/impl/nats/input.go (subject with `*`/`>` wildcards,
optional queue group; per-message `nats_subject`/`nats_reply_subject`
metadata) and output.go (interpolated subject). The reference uses
nats.go; no NATS wheel ships in this sandbox, so — like the MQTT and
RFC 6455 connectors — the wire protocol is implemented from the published
spec, which makes the connector REAL and e2e-testable in-process instead
of availability-gated.

Spark-first mapping (same spool-bridge rationale as every push source):
- input  -> NatsSpooler subscribes and persists each MSG payload as a
  durable spool file; the stream is the replayable file source, so offset
  log + exactly-once downstream hold. Core NATS is fire-and-forget
  (at-most-once — no acks in the protocol; JetStream adds them but is a
  different protocol layer), matching the reference core-`nats` input's
  delivery guarantee. The subject and reply subject ride the spool
  FILENAME hex-encoded and surface as `nats_subject` /
  `nats_reply_subject` columns, decoded JVM-side.
- output -> foreachBatch publisher: one pooled connection per partition,
  rows publish as JSON executor-side. The subject supports `${! expr }`
  interpolation (output.go's InterpolatedStringField) — computed as a
  COLUMN next to the payload, so per-row subjects never touch Python
  row-at-a-time.

Queue groups (§"Queue Groups"): subscribers sharing a queue name split
the subject's traffic — the mini server round-robins within each group,
the production behavior a horizontally-scaled consumer fleet relies on.
"""

from __future__ import annotations

import json
import socket
import threading
import uuid
from dataclasses import dataclass, field
from pathlib import Path

_CRLF = b"\r\n"


# --------------------------------------------------------------------------
# wire helpers
# --------------------------------------------------------------------------


def subject_matches(filt: str, subject: str) -> bool:
    """Core NATS subject matching: dot-separated tokens, `*` = exactly one
    token, `>` = one-or-more trailing tokens (last token only)."""
    fparts, sparts = filt.split("."), subject.split(".")
    for i, fp in enumerate(fparts):
        if fp == ">":
            return len(sparts) > i
        if i >= len(sparts):
            return False
        if fp != "*" and fp != sparts[i]:
            return False
    return len(fparts) == len(sparts)


class _LineSocket:
    """Buffered reader over a socket: CRLF-terminated protocol lines plus
    exact-size payload reads (MSG/PUB bodies)."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self._buf = bytearray()

    def read_line(self) -> bytes:
        while True:
            i = self._buf.find(_CRLF)
            if i >= 0:
                line = bytes(self._buf[:i])
                del self._buf[: i + 2]
                return line
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("nats: connection closed")
            self._buf += chunk

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("nats: connection closed mid-payload")
            self._buf += chunk
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out


# --------------------------------------------------------------------------
# client
# --------------------------------------------------------------------------


class NatsClient:
    """Minimal synchronous core-NATS client: connect (INFO/CONNECT
    handshake), publish, subscribe (with optional queue group), blocking
    receive. One socket, no background thread — PING is answered inline
    by `recv_msg()`."""

    def __init__(self, host: str, port: int, name: str | None = None,
                 timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._io = _LineSocket(self.sock)
        self._sid = 0
        info = self._io.read_line()
        if not info.startswith(b"INFO "):
            raise ConnectionError(f"nats: expected INFO, got {info[:40]!r}")
        self.server_info = json.loads(info[5:])
        opts = {"verbose": False, "pedantic": False, "tls_required": False,
                "name": name or f"bento-spark-{uuid.uuid4().hex[:12]}",
                "lang": "python", "version": "0", "protocol": 1}
        self.sock.sendall(b"CONNECT " + json.dumps(opts).encode() + _CRLF)
        # flush barrier so CONNECT errors surface deterministically
        self.sock.sendall(b"PING" + _CRLF)
        line = self._io.read_line()
        if line.startswith(b"-ERR"):
            raise ConnectionError(f"nats: {line.decode(errors='replace')}")
        if line != b"PONG":
            raise ConnectionError(f"nats: expected PONG, got {line[:40]!r}")

    def publish(self, subject: str, payload: bytes, reply: str | None = None) -> None:
        head = f"PUB {subject} {reply + ' ' if reply else ''}{len(payload)}"
        self.sock.sendall(head.encode() + _CRLF + payload + _CRLF)

    def subscribe(self, subject: str, queue: str | None = None) -> int:
        self._sid += 1
        q = f"{queue} " if queue else ""
        self.sock.sendall(f"SUB {subject} {q}{self._sid}".encode() + _CRLF)
        return self._sid

    def unsubscribe(self, sid: int) -> None:
        self.sock.sendall(f"UNSUB {sid}".encode() + _CRLF)

    def recv_msg(self) -> tuple[str, int, str | None, bytes]:
        """Block for the next MSG -> (subject, sid, reply_subject, payload);
        answers PING inline; skips +OK."""
        while True:
            line = self._io.read_line()
            if line.startswith(b"MSG "):
                parts = line.decode().split(" ")
                # MSG <subject> <sid> [reply-to] <#bytes>
                subject, sid = parts[1], int(parts[2])
                reply = parts[3] if len(parts) == 5 else None
                nbytes = int(parts[-1])
                payload = self._io.read_exact(nbytes)
                self._io.read_exact(2)  # trailing CRLF
                return subject, sid, reply, payload
            if line == b"PING":
                self.sock.sendall(b"PONG" + _CRLF)
                continue
            if line in (b"PONG", b"+OK"):
                continue
            if line.startswith(b"-ERR"):
                raise ConnectionError(f"nats: {line.decode(errors='replace')}")

    def flush(self) -> None:
        """PING/PONG round-trip — everything written before it has been
        processed by the server when this returns."""
        self.sock.sendall(b"PING" + _CRLF)
        while self._io.read_line() != b"PONG":
            pass

    def request(self, subject: str, payload: bytes, timeout: float = 5.0,
                inbox_prefix: str = "_INBOX") -> bytes:
        """Core-NATS request-reply: publish with a unique inbox reply
        subject, block for the responder's reply (nats.go's Request;
        inbox_prefix per processor_request_reply.go). Raises TimeoutError
        when no responder answers in time."""
        inbox = f"{inbox_prefix}.{uuid.uuid4().hex}"
        sid = self.subscribe(inbox)
        old = self.sock.gettimeout()
        try:
            self.publish(subject, payload, reply=inbox)
            self.sock.settimeout(timeout)
            while True:
                _subj, msid, _r, data = self.recv_msg()
                if msid == sid:
                    return data
        finally:
            self.sock.settimeout(old)
            try:
                self.unsubscribe(sid)
            except OSError:
                pass

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


# --------------------------------------------------------------------------
# input bridge
# --------------------------------------------------------------------------


@dataclass
class NatsSpooler:
    """`nats` input (input.go): subscribe (optionally as a queue-group
    member) and spool each message as one durable file. Core NATS is
    at-most-once — a message the spooler never saw was never delivered;
    everything it did see is durable before the next recv."""

    host: str
    port: int
    subject: str
    spool_dir: str
    queue: str | None = None
    _client: NatsClient | None = field(default=None, repr=False)
    _thread: threading.Thread | None = field(default=None, repr=False)
    _stop: threading.Event = field(default_factory=threading.Event, repr=False)

    def start(self) -> "NatsSpooler":
        spool = Path(self.spool_dir)
        spool.mkdir(parents=True, exist_ok=True)
        # subscribe + flush BEFORE returning so no publish races it
        client = NatsClient(self.host, self.port)
        client.subscribe(self.subject, queue=self.queue)
        client.flush()
        # block forever on push traffic — the connect-time timeout would
        # otherwise kill an IDLE subscriber after 10s
        client.sock.settimeout(None)
        self._client = client
        seq = {"n": 0}

        def run() -> None:
            while not self._stop.is_set():
                try:
                    got = client.recv_msg()
                except (ConnectionError, OSError, ValueError):
                    return  # socket closed by stop() or server
                subject, _sid, reply, payload = got
                seq["n"] += 1
                # subject + reply ride the filename hex-encoded ->
                # nats_subject / nats_reply_subject columns decodable
                # JVM-side (input.go:200-201 metadata)
                name = (f"{seq['n']:012d}-{subject.encode().hex()}"
                        f"-{(reply or '').encode().hex()}-{uuid.uuid4().hex}.msg")
                tmp = spool / f".{name}.tmp"
                tmp.write_bytes(payload)
                tmp.rename(spool / name)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._client is not None:
            self._client.close()  # unblocks the recv loop
            self._client = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


def read_nats_stream(spark, spool_dir: str, max_files_per_trigger: int | None = None):
    """File stream over a NatsSpooler's dir: `value string` +
    `nats_subject` / `nats_reply_subject` (decoded from the filename
    JVM-side — input.go's metadata fields; reply is NULL when absent)."""
    from pyspark.sql import functions as F

    from bento_spark.streaming.http_server import read_spool_stream

    df = read_spool_stream(spark, spool_dir, whole_body=True,
                           max_files_per_trigger=max_files_per_trigger)
    fname = F.input_file_name()
    pat = r"/\d{12}-([0-9a-f]*)-([0-9a-f]*)-[0-9a-f]{32}\.msg$"
    reply = F.decode(F.unhex(F.regexp_extract(fname, pat, 2)), "UTF-8")
    return (
        df.withColumn("nats_subject",
                      F.decode(F.unhex(F.regexp_extract(fname, pat, 1)), "UTF-8"))
          .withColumn("nats_reply_subject", F.when(reply != "", reply))
    )


# --------------------------------------------------------------------------
# output
# --------------------------------------------------------------------------


def nats_sink(host: str, port: int, subject_col: str):
    """`nats` output (output.go: interpolated subject): rows publish as
    JSON, serialized JVM-side (to_json); the per-row subject arrives as a
    pre-computed COLUMN (interpolation compiled by the caller), one
    connection per partition executor-side. Fire-and-forget like core
    NATS itself; a flush per partition bounds loss to the final batch of
    a crashed executor — the same at-most-once contract as the
    reference's core-nats output."""
    from pyspark.sql import functions as F

    def write_batch(batch_df, epoch_id: int) -> None:
        data_cols = [c for c in batch_df.columns if c != subject_col]
        payloads = batch_df.select(
            F.col(subject_col).alias("s"),
            F.to_json(F.struct(*[F.col(c) for c in data_cols])).alias("v"),
        )

        def send(rows) -> None:
            # imported here: worker closures must re-resolve submodules
            from bento_spark.streaming.nats import NatsClient

            client = None
            try:
                for row in rows:
                    if client is None:
                        client = NatsClient(host, port)
                    client.publish(row.s, row.v.encode("utf-8"))
            finally:
                if client is not None:
                    try:
                        client.flush()
                    finally:
                        client.close()

        payloads.foreachPartition(send)

    return write_batch


def nats_request_reply_enrich(df, host: str, port: int, subject,
                              out_col: str = "nats_reply",
                              timeout: float = 5.0,
                              inbox_prefix: str = "_INBOX"):
    """`nats_request_reply` processor (nats/processor_request_reply.go):
    each row publishes to the interpolated subject with a unique inbox
    reply-to and the responder's reply lands in `out_col` — the http
    enrichment shape (payload rendered JVM-side, one client per
    partition, timeouts follow the error-column protocol)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    from bento_spark.operators.errors import ERROR_COL, ensure_error_col

    df = ensure_error_col(df)
    df = df.withColumn("_nats_subject",
                       subject if isinstance(subject, Column) else F.lit(str(subject)))
    in_cols = [c for c in df.columns if c != "_nats_subject"]
    if out_col in in_cols:
        raise ValueError(
            f"nats_request_reply: out_col {out_col!r} collides with an input column")
    payload = F.to_json(F.struct(*[F.col(c) for c in in_cols if c != ERROR_COL]))
    df = df.withColumn("_nats_payload", payload)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join([f"{c} {fields[c]}" for c in in_cols]
                           + [f"{out_col} string"])

    def ask(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imported here: worker closures must re-resolve submodules
        from bento_spark.streaming.nats import NatsClient

        client = None
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                outs, errs = [], []
                for i in range(len(pdf)):
                    prior = pdf[ERROR_COL].iloc[i]
                    if isinstance(prior, str):  # errored rows short-circuit
                        outs.append(None)
                        errs.append(prior)
                        continue
                    try:
                        if client is None:
                            client = NatsClient(host, port)
                        reply = client.request(
                            pdf["_nats_subject"].iloc[i],
                            pdf["_nats_payload"].iloc[i].encode("utf-8"),
                            timeout=timeout, inbox_prefix=inbox_prefix)
                        outs.append(reply.decode("utf-8", "replace"))
                        errs.append(None)
                    except (TimeoutError, ConnectionError, OSError) as e:
                        outs.append(None)
                        errs.append(f"nats request failed: "
                                    f"{type(e).__name__}: {e}")
                        if client is not None:
                            client.close()
                            client = None
                out = pdf[in_cols].copy()
                out[out_col] = outs
                out[ERROR_COL] = errs
                yield out
        finally:
            if client is not None:
                client.close()

    return df.mapInPandas(ask, schema=out_schema)


# --------------------------------------------------------------------------
# in-process server (test-grade)
# --------------------------------------------------------------------------


class MiniNatsServer:
    """Single-host core-NATS server subset for e2e tests: INFO/CONNECT,
    PUB routing to SUB filters with `*`/`>` wildcards, queue-group
    round-robin (one member per group per message), PING/PONG, UNSUB.
    Not a production server — the deliverable is the CLIENT; this exists
    so the connector can be driven end-to-end without external services."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self._server: socket.socket | None = None
        # (sock, filter, sid, queue)
        self._subs: list[tuple[socket.socket, str, int, str | None]] = []
        self._rr: dict[str, int] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []

    def start(self) -> "MiniNatsServer":
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        srv.listen(16)
        self.port = srv.getsockname()[1]
        self._server = srv
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._server is not None:
            try:
                self._server.close()
            except OSError:
                pass
        with self._lock:
            for s, *_ in self._subs:
                try:
                    s.close()
                except OSError:
                    pass
            self._subs.clear()
        for t in self._threads:
            t.join(timeout=2)

    def _accept_loop(self) -> None:
        assert self._server is not None
        while not self._stop.is_set():
            try:
                conn, _ = self._server.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _serve(self, conn: socket.socket) -> None:
        io = _LineSocket(conn)
        info = {"server_id": "mini", "version": "0.0-test", "proto": 1,
                "max_payload": 1 << 20}
        try:
            conn.sendall(b"INFO " + json.dumps(info).encode() + _CRLF)
            while not self._stop.is_set():
                line = io.read_line()
                if not line:
                    continue
                verb = line.split(b" ", 1)[0].upper()
                if verb == b"CONNECT":
                    continue
                if verb == b"PING":
                    conn.sendall(b"PONG" + _CRLF)
                elif verb == b"SUB":
                    parts = line.decode().split(" ")
                    # SUB <subject> [queue] <sid>
                    subject = parts[1]
                    queue = parts[2] if len(parts) == 4 else None
                    sid = int(parts[-1])
                    with self._lock:
                        self._subs.append((conn, subject, sid, queue))
                elif verb == b"UNSUB":
                    sid = int(line.decode().split(" ")[1])
                    with self._lock:
                        self._subs = [s for s in self._subs
                                      if not (s[0] is conn and s[2] == sid)]
                elif verb == b"PUB":
                    parts = line.decode().split(" ")
                    # PUB <subject> [reply-to] <#bytes>
                    subject = parts[1]
                    reply = parts[2] if len(parts) == 4 else None
                    nbytes = int(parts[-1])
                    payload = io.read_exact(nbytes)
                    io.read_exact(2)
                    self._route(subject, reply, payload)
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            with self._lock:
                self._subs = [s for s in self._subs if s[0] is not conn]
            try:
                conn.close()
            except OSError:
                pass

    def _route(self, subject: str, reply: str | None, payload: bytes) -> None:
        with self._lock:
            matches = [s for s in self._subs if subject_matches(s[1], subject)]
            # queue groups: exactly one member per (filter, queue) group,
            # round-robin; plain subscribers all receive
            targets: list[tuple[socket.socket, int]] = []
            grouped: dict[tuple[str, str], list[tuple[socket.socket, int]]] = {}
            for sock, filt, sid, queue in matches:
                if queue is None:
                    targets.append((sock, sid))
                else:
                    grouped.setdefault((filt, queue), []).append((sock, sid))
            for key, members in grouped.items():
                k = f"{key[0]}|{key[1]}"
                i = self._rr.get(k, 0) % len(members)
                self._rr[k] = i + 1
                targets.append(members[i])
            for sock, sid in targets:
                head = f"MSG {subject} {sid} {reply + ' ' if reply else ''}{len(payload)}"
                try:
                    sock.sendall(head.encode() + _CRLF + payload + _CRLF)
                except OSError:
                    pass
