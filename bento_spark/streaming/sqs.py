"""AWS SQS input/output — dependency-free client over the public SQS
JSON protocol (POST / with `X-Amz-Target: AmazonSQS.<Op>`,
application/x-amz-json-1.0 bodies — the wire format AWS SDKs speak) and
a full AWS Signature Version 4 implementation (the published SigV4
recipe: canonical request -> string-to-sign -> derived-key HMAC chain),
plus an in-process queue service that VERIFIES signatures.

Reference: internal/impl/aws/input_sqs.go (url, wait_time_seconds,
delete_message, max_number_of_messages; ack = DeleteMessage after the
message is handled) and output_sqs.go. The reference uses aws-sdk-go-v2;
no boto3 ships in this sandbox, so protocol + signing are implemented
from their public specifications — the connector is REAL and
e2e-testable in-process (the mini service recomputes and checks every
signature with the shared secret, so the signer is validated, not
assumed). Against real AWS, point `endpoint` at the regional URL — the
same override contract as localstack/elasticmq.

Spark-first mapping (same spool-bridge rationale as every pull source):
- input  -> SqsSpooler long-polls ReceiveMessage and persists each
  message as a durable spool file BEFORE DeleteMessage (ack-after-
  durability = at-least-once: an un-deleted message re-appears after its
  visibility timeout, the SQS contract). MessageId rides the spool
  FILENAME and surfaces as `sqs_message_id`.
- output -> foreachBatch SendMessageBatch in <=10-entry chunks (the API
  cap), bodies serialized JVM-side.

The x-amz-date header is request-time wall clock — transport metadata
SigV4 requires, never row content (the determinism invariant governs
data paths)."""

from __future__ import annotations

import hashlib
import hmac
import json
import threading
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path


# --------------------------------------------------------------------------
# SigV4 (public recipe)
# --------------------------------------------------------------------------


def sigv4_signature(method: str, path: str, query: str,
                    headers: dict[str, str], payload: bytes,
                    secret_key: str, region: str, service: str,
                    amz_date: str,
                    payload_hash: str | None = None) -> tuple[str, str]:
    """-> (signed_headers, signature) for arbitrary requests — the
    published recipe verbatim (canonical request -> string-to-sign ->
    derived-key HMAC chain). Pinned by AWS's own documented example
    vector in the tests. `payload_hash` overrides the computed hash for
    presigned-query flows whose canonical form carries the literal
    UNSIGNED-PAYLOAD (botocore SigV4QueryAuth — the MSK IAM signer)."""
    date = amz_date[:8]
    lower = {k.lower(): v.strip() for k, v in headers.items()}
    signed = ";".join(sorted(lower))
    canonical = "\n".join([
        method, path, query,
        "".join(f"{k}:{lower[k]}\n" for k in sorted(lower)),
        signed, payload_hash or hashlib.sha256(payload).hexdigest(),
    ])
    scope = f"{date}/{region}/{service}/aws4_request"
    to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical.encode()).hexdigest(),
    ])

    def hm(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = hm(hm(hm(hm(b"AWS4" + secret_key.encode(), date), region), service),
           "aws4_request")
    return signed, hmac.new(k, to_sign.encode(), hashlib.sha256).hexdigest()


def sigv4_headers(method: str, host: str, path: str, payload: bytes,
                  access_key: str, secret_key: str, region: str,
                  service: str, amz_target: str,
                  amz_date: str | None = None,
                  content_type: str = "application/x-amz-json-1.0",
                  ) -> dict[str, str]:
    """-> headers incl. Authorization for an x-amz-json / Query-protocol
    request (content_type selects the wire dialect; the Query protocol's
    form-encoded services pass no X-Amz-Target — give amz_target ''
    to omit the header from signing and the wire)."""
    if amz_date is None:
        amz_date = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
    headers = {
        "content-type": content_type,
        "host": host,
        "x-amz-date": amz_date,
    }
    if amz_target:
        headers["x-amz-target"] = amz_target
    signed, sig = sigv4_signature(method, path, "", headers, payload,
                                  secret_key, region, service, amz_date)
    scope = f"{amz_date[:8]}/{region}/{service}/aws4_request"
    out = {
        "Content-Type": content_type,
        "X-Amz-Date": amz_date,
        "Authorization": (
            f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
            f"SignedHeaders={signed}, Signature={sig}"),
    }
    if amz_target:
        out["X-Amz-Target"] = amz_target
    return out


class SqsClient:
    """Minimal SQS JSON-protocol client: SendMessage / ReceiveMessage /
    DeleteMessage, SigV4-signed."""

    def __init__(self, endpoint: str, access_key: str, secret_key: str,
                 region: str = "us-east-1", timeout: float = 35.0):
        import urllib.parse

        u = urllib.parse.urlsplit(endpoint)
        self._https = u.scheme == "https"
        self.host = u.hostname
        self.port = u.port or (443 if self._https else 80)
        self.host_hdr = u.netloc
        self.access_key, self.secret_key, self.region = access_key, secret_key, region
        self.timeout = timeout

    def _call(self, op: str, body: dict, retries: int = 3,
              backoff_s: float = 0.25) -> dict:
        """One signed request with bounded in-call retry on transport
        errors / 5xx / 429 — a raise inside foreachBatch kills the whole
        query (the repo's http_post_writer contract), so transient AWS
        throttling must heal here. Permanent 4xx fail fast."""
        import http.client

        payload = json.dumps(body).encode("utf-8")
        attempt = 0
        while True:
            headers = sigv4_headers(
                "POST", self.host_hdr, "/", payload, self.access_key,
                self.secret_key, self.region, "sqs", f"AmazonSQS.{op}")
            cls = (http.client.HTTPSConnection if self._https
                   else http.client.HTTPConnection)
            conn = cls(self.host, self.port, timeout=self.timeout)
            status, data, fault = None, b"", None
            try:
                conn.request("POST", "/", body=payload, headers=headers)
                resp = conn.getresponse()
                status, data = resp.status, resp.read()
            except (OSError, http.client.HTTPException) as e:
                fault = e
            finally:
                conn.close()
            if status is not None and status // 100 == 2:
                return json.loads(data) if data else {}
            transient = fault is not None or status >= 500 or status == 429
            if not transient or attempt >= retries:
                if fault is not None:
                    raise ConnectionError(f"sqs: {op} -> {fault}") from fault
                raise ConnectionError(f"sqs: {op} -> {status} {data[:160]!r}")
            attempt += 1
            time.sleep(backoff_s * (2 ** (attempt - 1)))

    def send_message(self, queue_url: str, body: str,
                     group_id: str | None = None) -> str:
        req: dict = {"QueueUrl": queue_url, "MessageBody": body}
        if group_id is not None:
            req["MessageGroupId"] = group_id
        return self._call("SendMessage", req).get("MessageId", "")

    def send_message_batch(self, queue_url: str,
                           entries: list[tuple[str, str | None]]) -> None:
        """entries: [(body, group_id)] — SendMessageBatch, <=10 per request
        (the API cap); per-entry failures raise naming the entries."""
        for i in range(0, len(entries), 10):
            chunk = entries[i : i + 10]
            req_entries = []
            for j, (body, gid) in enumerate(chunk):
                e: dict = {"Id": str(j), "MessageBody": body}
                if gid is not None:
                    e["MessageGroupId"] = gid
                req_entries.append(e)
            out = self._call("SendMessageBatch",
                             {"QueueUrl": queue_url, "Entries": req_entries})
            failed = out.get("Failed") or []
            if failed:
                raise ConnectionError(
                    f"sqs: SendMessageBatch rejected {len(failed)} entries: "
                    f"{failed[:3]!r}")

    def receive_message(self, queue_url: str, max_messages: int = 10,
                        wait_time_s: int = 0) -> list[dict]:
        out = self._call("ReceiveMessage", {
            "QueueUrl": queue_url,
            "MaxNumberOfMessages": max_messages,
            "WaitTimeSeconds": wait_time_s,
        })
        return out.get("Messages") or []

    def delete_message(self, queue_url: str, receipt_handle: str) -> None:
        self._call("DeleteMessage", {"QueueUrl": queue_url,
                                     "ReceiptHandle": receipt_handle})

    def close(self) -> None:  # connections are per-request
        pass


# --------------------------------------------------------------------------
# input bridge
# --------------------------------------------------------------------------


@dataclass
class SqsSpooler:
    """`aws_sqs` input (input_sqs.go): long-poll ReceiveMessage and spool
    each message as one durable file; DeleteMessage fires only AFTER the
    atomic rename — at-least-once (un-deleted messages re-appear after
    the visibility timeout). `delete_message: false` (the reference's
    leave-in-queue mode) skips the ack."""

    endpoint: str
    queue_url: str
    access_key: str
    secret_key: str
    spool_dir: str
    region: str = "us-east-1"
    wait_time_s: int = 1
    max_messages: int = 10
    delete_message: bool = True
    error: str | None = field(default=None, repr=False)
    _thread: threading.Thread | None = field(default=None, repr=False)
    _stop: threading.Event = field(default_factory=threading.Event, repr=False)

    def start(self) -> "SqsSpooler":
        spool = Path(self.spool_dir)
        spool.mkdir(parents=True, exist_ok=True)
        client = SqsClient(self.endpoint, self.access_key, self.secret_key,
                           region=self.region)
        seq = {"n": 0}
        # leave-in-queue mode only: remember spooled ids so re-visible
        # messages don't duplicate; delete_message mode never consults it
        # (tracking there would be an unbounded leak for zero benefit)
        seen: set[str] | None = None if self.delete_message else set()

        def run() -> None:
            import sys

            while not self._stop.is_set():
                try:
                    msgs = client.receive_message(
                        self.queue_url, max_messages=self.max_messages,
                        wait_time_s=self.wait_time_s)
                except (ConnectionError, OSError):
                    if self._stop.wait(0.5):
                        return
                    continue
                if not msgs:
                    self._stop.wait(0.05)
                    continue
                try:
                    for m in msgs:
                        mid = m.get("MessageId", "")
                        if seen is not None:
                            if mid in seen:
                                continue
                            seen.add(mid)
                        seq["n"] += 1
                        # message id rides the filename hex-encoded (ids
                        # are service-defined strings, not filename-safe)
                        name = (f"{seq['n']:012d}-{mid.encode().hex()}"
                                f"-{uuid.uuid4().hex}.msg")
                        tmp = spool / f".{name}.tmp"
                        tmp.write_bytes(m.get("Body", "").encode("utf-8"))
                        tmp.rename(spool / name)
                        if self.delete_message:
                            try:
                                client.delete_message(self.queue_url,
                                                      m["ReceiptHandle"])
                            except (ConnectionError, OSError, KeyError):
                                pass  # visibility timeout re-delivers
                except Exception as e:  # disk/decode faults: surface, don't vanish
                    self.error = f"aws_sqs: {e}"
                    print(self.error, file=sys.stderr)
                    return

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


def read_sqs_stream(spark, spool_dir: str, max_files_per_trigger: int | None = None):
    """File stream over an SqsSpooler's dir: `value string` +
    `sqs_message_id` decoded from the filename JVM-side."""
    from pyspark.sql import functions as F

    from bento_spark.streaming.http_server import read_spool_stream

    df = read_spool_stream(spark, spool_dir, whole_body=True,
                           max_files_per_trigger=max_files_per_trigger)
    fname = F.input_file_name()
    pat = r"/\d{12}-([0-9a-f]*)-[0-9a-f]{32}\.msg$"
    mid = F.decode(F.unhex(F.regexp_extract(fname, pat, 1)), "UTF-8")
    return df.withColumn("sqs_message_id", F.when(mid != "", mid))


# --------------------------------------------------------------------------
# output
# --------------------------------------------------------------------------


def sqs_sink(endpoint: str, queue_url: str, access_key: str, secret_key: str,
             region: str = "us-east-1", group_id_col: str | None = None):
    """`aws_sqs` output (output_sqs.go): one SendMessage per row, body
    serialized JVM-side; the optional FIFO MessageGroupId arrives as a
    pre-computed COLUMN."""
    from pyspark.sql import functions as F

    def write_batch(batch_df, epoch_id: int) -> None:
        data_cols = [c for c in batch_df.columns if c != group_id_col]
        payloads = batch_df.select(
            *([F.col(group_id_col).alias("g")] if group_id_col
              else [F.lit(None).cast("string").alias("g")]),
            F.to_json(F.struct(*[F.col(c) for c in data_cols])).alias("v"),
        )

        def send(rows) -> None:
            # imported here: worker closures must re-resolve submodules
            from bento_spark.streaming.sqs import SqsClient

            client = SqsClient(endpoint, access_key, secret_key, region=region)
            pending: list[tuple[str, str | None]] = []
            for row in rows:
                pending.append((row.v, row.g))
                if len(pending) >= 10:  # SendMessageBatch API cap
                    client.send_message_batch(queue_url, pending)
                    pending = []
            if pending:
                client.send_message_batch(queue_url, pending)

        payloads.foreachPartition(send)

    return write_batch


# --------------------------------------------------------------------------
# in-process queue service (test-grade, signature-VERIFYING)
# --------------------------------------------------------------------------


class MiniSqsServer:
    """SQS JSON-protocol subset for e2e tests: SendMessage /
    ReceiveMessage (visibility timeout re-delivery) / DeleteMessage.
    Every request's SigV4 signature is RECOMPUTED with the shared secret
    and rejected on mismatch — this catches payload/header tampering and
    credential mismatches (same-recipe recompute); the recipe ITSELF is
    pinned by AWS's published example vector in the tests, so the check
    is not merely self-consistent."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 access_key: str = "AKIATEST", secret_key: str = "testsecret",
                 region: str = "us-east-1", visibility_timeout_s: float = 2.0):
        self.host, self.port = host, port
        self.access_key, self.secret_key, self.region = access_key, secret_key, region
        self.visibility_timeout_s = visibility_timeout_s
        # queue_url -> [(message_id, body, visible_after_monotonic)]
        self._queues: dict[str, list[list]] = {}
        self._seq = 0
        self._lock = threading.Lock()
        self._srv = None
        self._thread: threading.Thread | None = None

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"

    def queue_size(self, queue_url: str) -> int:
        with self._lock:
            return len(self._queues.get(queue_url, []))

    def start(self) -> "MiniSqsServer":
        import http.server

        svc = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def _reply(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/x-amz-json-1.0")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length", 0))
                payload = self.rfile.read(n)
                target = self.headers.get("X-Amz-Target", "")
                # independent SigV4 verification with the shared secret
                expect = sigv4_headers(
                    "POST", self.headers.get("Host", ""), "/", payload,
                    svc.access_key, svc.secret_key, svc.region, "sqs",
                    target, amz_date=self.headers.get("X-Amz-Date", ""),
                )["Authorization"]
                if self.headers.get("Authorization") != expect:
                    return self._reply(403, {"__type": "InvalidSignatureException"})
                req = json.loads(payload) if payload else {}
                op = target.split(".")[-1]
                if op == "SendMessage":
                    with svc._lock:
                        svc._seq += 1
                        mid = f"m-{svc._seq:08d}"
                        svc._queues.setdefault(req["QueueUrl"], []).append(
                            [mid, req["MessageBody"], 0.0])
                    return self._reply(200, {"MessageId": mid})
                if op == "SendMessageBatch":
                    ok = []
                    with svc._lock:
                        q = svc._queues.setdefault(req["QueueUrl"], [])
                        for e in req.get("Entries", []):
                            svc._seq += 1
                            mid = f"m-{svc._seq:08d}"
                            q.append([mid, e["MessageBody"], 0.0])
                            ok.append({"Id": e["Id"], "MessageId": mid})
                    return self._reply(200, {"Successful": ok, "Failed": []})
                if op == "ReceiveMessage":
                    deadline = time.monotonic() + float(req.get("WaitTimeSeconds", 0))
                    while True:
                        now = time.monotonic()
                        with svc._lock:
                            q = svc._queues.setdefault(req["QueueUrl"], [])
                            visible = [m for m in q if m[2] <= now]
                            picked = visible[: int(req.get("MaxNumberOfMessages", 1))]
                            for m in picked:
                                m[2] = now + svc.visibility_timeout_s
                        if picked or time.monotonic() >= deadline:
                            break
                        time.sleep(0.02)
                    return self._reply(200, {"Messages": [
                        {"MessageId": m[0], "Body": m[1],
                         # receipt handle encodes id + claim epoch
                         "ReceiptHandle": f"{m[0]}|{m[2]}"}
                        for m in picked
                    ] or None})
                if op == "DeleteMessage":
                    rid = req["ReceiptHandle"].split("|")[0]
                    with svc._lock:
                        q = svc._queues.setdefault(req["QueueUrl"], [])
                        svc._queues[req["QueueUrl"]] = [m for m in q if m[0] != rid]
                    return self._reply(200, {})
                return self._reply(400, {"__type": "UnknownOperationException"})

            def log_message(self, *a):
                pass

        self._srv = http.server.ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._srv is not None:
            self._srv.shutdown()
            self._srv = None
