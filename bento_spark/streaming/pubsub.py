"""GCP Pub/Sub input/output — dependency-free client for the public
Pub/Sub REST API (cloud.google.com/pubsub/docs/reference/rest:
`POST /v1/projects/{p}/topics/{t}:publish` with base64 message data,
`:pull` + `:acknowledge` on subscriptions) with real service-account
auth: the OAuth2 JWT-bearer grant (developers.google.com/identity —
an RS256 self-signed assertion exchanged at the token endpoint), signed
by this repo's own RSA implementation (functions/crypto_prims.py).

Reference: internal/impl/gcp/input_pubsub.go (project, subscription,
endpoint override — the PUBSUB_EMULATOR_HOST contract) and
output_pubsub.go (project, interpolated topic). The reference uses
cloud.google.com/go/pubsub (gRPC); the REST surface is the same public
API, so the connector is REAL and e2e-testable in-process — the mini
service VERIFIES the RS256 assertion with the service account's public
key before minting a token, so the whole auth chain is exercised, not
mocked away.

Spark-first mapping (same spool-bridge rationale as every pull source):
- input  -> PubSubSpooler pulls and spools each message BEFORE
  acknowledge (ack-after-durability = at-least-once: an un-acked message
  re-delivers after the ack deadline, the Pub/Sub contract). messageId
  rides the spool FILENAME as `pubsub_message_id`.
- output -> foreachBatch publish; the interpolated topic arrives as a
  COLUMN, data is base64 of the JVM-serialized JSON row.
"""

from __future__ import annotations

import base64
import json
import threading
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path


# --------------------------------------------------------------------------
# service-account OAuth (JWT-bearer grant)
# --------------------------------------------------------------------------

_GRANT = "urn:ietf:params:oauth:grant-type:jwt-bearer"
_SCOPE = "https://www.googleapis.com/auth/pubsub"


def build_assertion(client_email: str, private_key_pem: str, token_uri: str,
                    issued_at: int, lifetime_s: int = 3600) -> str:
    """RS256 self-signed JWT assertion for the token exchange."""
    from bento_spark.functions.crypto_prims import parse_rsa_private, rsa_sign

    def b64url(b: bytes) -> str:
        return base64.urlsafe_b64encode(b).rstrip(b"=").decode("ascii")

    header = b64url(json.dumps({"alg": "RS256", "typ": "JWT"},
                               separators=(",", ":")).encode())
    claims = b64url(json.dumps({
        "iss": client_email, "scope": _SCOPE, "aud": token_uri,
        "iat": issued_at, "exp": issued_at + lifetime_s,
    }, separators=(",", ":")).encode())
    signing_input = f"{header}.{claims}"
    key = parse_rsa_private(private_key_pem)
    sig = rsa_sign(key, signing_input.encode("ascii"), 256)
    return f"{signing_input}.{b64url(sig)}"


class PubSubClient:
    """Minimal synchronous REST client: publish / pull / acknowledge /
    createSubscription. `credentials` = dict with client_email /
    private_key / token_uri (the service-account JSON's fields) enables
    the JWT-bearer token flow; None = unauthenticated (the emulator
    contract)."""

    def __init__(self, endpoint: str, credentials: dict | None = None,
                 timeout: float = 35.0):
        import urllib.parse

        u = urllib.parse.urlsplit(endpoint)
        self._https = u.scheme == "https"
        self.host = u.hostname
        self.port = u.port or (443 if self._https else 80)
        self.timeout = timeout
        self._creds = credentials
        self._token: str | None = None
        self._token_exp = 0.0

    def _bearer(self) -> str | None:
        if self._creds is None:
            return None
        if self._token is not None and time.time() < self._token_exp - 60:
            return self._token
        assertion = build_assertion(
            self._creds["client_email"], self._creds["private_key"],
            self._creds["token_uri"], int(time.time()))
        body = (f"grant_type={_GRANT.replace(':', '%3A')}"
                f"&assertion={assertion}").encode("ascii")
        import urllib.parse as up

        tu = up.urlsplit(self._creds["token_uri"])
        resp = self._raw_request(
            tu.hostname, tu.port or (443 if tu.scheme == "https" else 80),
            tu.scheme == "https", "POST", tu.path, body,
            {"Content-Type": "application/x-www-form-urlencoded"})
        self._token = resp["access_token"]
        self._token_exp = time.time() + float(resp.get("expires_in", 3600))
        return self._token

    def _raw_request(self, host, port, https, method, path, body, headers,
                     retries: int = 3, backoff_s: float = 0.25) -> dict:
        """Bounded in-call retry on transport errors / 5xx / 429 (a raise
        inside foreachBatch kills the query); permanent 4xx fail fast."""
        import http.client

        cls = http.client.HTTPSConnection if https else http.client.HTTPConnection
        attempt = 0
        while True:
            conn = cls(host, port, timeout=self.timeout)
            status, data, fault = None, b"", None
            try:
                conn.request(method, path, body=body, headers=headers)
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
                    raise ConnectionError(
                        f"pubsub: {method} {path} -> {fault}") from fault
                raise ConnectionError(
                    f"pubsub: {method} {path} -> {status} {data[:160]!r}")
            attempt += 1
            time.sleep(backoff_s * (2 ** (attempt - 1)))

    def _call(self, method: str, path: str, body: dict | None = None) -> dict:
        headers = {"Content-Type": "application/json"}
        tok = self._bearer()
        if tok:
            headers["Authorization"] = f"Bearer {tok}"
        payload = None if body is None else json.dumps(body).encode("utf-8")
        return self._raw_request(self.host, self.port, self._https, method,
                                 path, payload, headers)

    def publish(self, project: str, topic: str,
                messages: list[tuple[bytes, dict]]) -> list[str]:
        """messages: [(data, attributes)] -> messageIds."""
        out = self._call("POST", f"/v1/projects/{project}/topics/{topic}:publish", {
            "messages": [
                {"data": base64.b64encode(d).decode("ascii"), "attributes": a}
                for d, a in messages
            ],
        })
        return out.get("messageIds", [])

    def pull(self, project: str, subscription: str,
             max_messages: int = 10) -> list[dict]:
        out = self._call(
            "POST",
            f"/v1/projects/{project}/subscriptions/{subscription}:pull",
            {"maxMessages": max_messages})
        return out.get("receivedMessages") or []

    def acknowledge(self, project: str, subscription: str,
                    ack_ids: list[str]) -> None:
        if ack_ids:
            self._call(
                "POST",
                f"/v1/projects/{project}/subscriptions/{subscription}:acknowledge",
                {"ackIds": ack_ids})

    def create_subscription(self, project: str, subscription: str,
                            topic: str) -> None:
        """Idempotent: the real API's 409 ALREADY_EXISTS on a restart is
        success, not failure (the reference input ignores AlreadyExists)."""
        try:
            self._call("PUT",
                       f"/v1/projects/{project}/subscriptions/{subscription}",
                       {"topic": f"projects/{project}/topics/{topic}"})
        except ConnectionError as e:
            if "409" not in str(e) and "ALREADY_EXISTS" not in str(e):
                raise

    def close(self) -> None:  # connections are per-request
        pass


# --------------------------------------------------------------------------
# input bridge
# --------------------------------------------------------------------------


@dataclass
class PubSubSpooler:
    """`gcp_pubsub` input (input_pubsub.go): pull-loop the subscription
    and spool each message as one durable file; acknowledge fires only
    AFTER the atomic rename — at-least-once via the ack deadline.
    `create_subscription` mirrors the reference's create_subscription
    object (enabled + topic)."""

    endpoint: str
    project: str
    subscription: str
    spool_dir: str
    credentials: dict | None = None
    max_messages: int = 10
    create_topic: str | None = None
    error: str | None = field(default=None, repr=False)
    _thread: threading.Thread | None = field(default=None, repr=False)
    _stop: threading.Event = field(default_factory=threading.Event, repr=False)

    def start(self) -> "PubSubSpooler":
        spool = Path(self.spool_dir)
        spool.mkdir(parents=True, exist_ok=True)
        client = PubSubClient(self.endpoint, credentials=self.credentials)
        if self.create_topic:
            client.create_subscription(self.project, self.subscription,
                                       self.create_topic)
        seq = {"n": 0}

        def run() -> None:
            while not self._stop.is_set():
                try:
                    got = client.pull(self.project, self.subscription,
                                      max_messages=self.max_messages)
                except (ConnectionError, OSError):
                    if self._stop.wait(0.5):
                        return
                    continue
                if not got:
                    self._stop.wait(0.05)
                    continue
                try:
                    acks = []
                    for rm in got:
                        msg = rm.get("message") or {}
                        data = base64.b64decode(msg.get("data", ""))
                        mid = msg.get("messageId", "")
                        seq["n"] += 1
                        name = (f"{seq['n']:012d}-{mid.encode().hex()}"
                                f"-{uuid.uuid4().hex}.msg")
                        tmp = spool / f".{name}.tmp"
                        tmp.write_bytes(data)
                        tmp.rename(spool / name)
                        acks.append(rm["ackId"])
                except Exception as e:  # disk/decode faults: surface loudly
                    import sys

                    self.error = f"gcp_pubsub: {e}"
                    print(self.error, file=sys.stderr)
                    return
                try:
                    client.acknowledge(self.project, self.subscription, acks)
                except (ConnectionError, OSError):
                    pass  # ack deadline re-delivers; dedupe downstream

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


def read_pubsub_stream(spark, spool_dir: str,
                       max_files_per_trigger: int | None = None):
    """File stream over a PubSubSpooler's dir: `value string` +
    `pubsub_message_id` decoded from the filename JVM-side."""
    from pyspark.sql import functions as F

    from bento_spark.streaming.http_server import read_spool_stream

    df = read_spool_stream(spark, spool_dir, whole_body=True,
                           max_files_per_trigger=max_files_per_trigger)
    fname = F.input_file_name()
    pat = r"/\d{12}-([0-9a-f]*)-[0-9a-f]{32}\.msg$"
    mid = F.decode(F.unhex(F.regexp_extract(fname, pat, 1)), "UTF-8")
    return df.withColumn("pubsub_message_id", F.when(mid != "", mid))


# --------------------------------------------------------------------------
# output
# --------------------------------------------------------------------------


def pubsub_sink(endpoint: str, project: str, topic_col: str,
                credentials: dict | None = None, batch_size: int = 100):
    """`gcp_pubsub` output (output_pubsub.go: interpolated topic): rows
    serialize JVM-side; the executor groups by topic and publishes
    size-bounded batches."""
    from pyspark.sql import functions as F

    def write_batch(batch_df, epoch_id: int) -> None:
        data_cols = [c for c in batch_df.columns if c != topic_col]
        payloads = batch_df.select(
            F.col(topic_col).alias("t"),
            F.to_json(F.struct(*[F.col(c) for c in data_cols])).alias("v"),
        )

        def send(rows) -> None:
            # imported here: worker closures must re-resolve submodules
            from bento_spark.streaming.pubsub import PubSubClient

            client = PubSubClient(endpoint, credentials=credentials)
            pending: dict[str, list] = {}
            for row in rows:
                pending.setdefault(row.t, []).append(
                    (row.v.encode("utf-8"), {}))
                if len(pending[row.t]) >= batch_size:
                    client.publish(project, row.t, pending.pop(row.t))
            for t, msgs in pending.items():
                client.publish(project, t, msgs)

        payloads.foreachPartition(send)

    return write_batch


# --------------------------------------------------------------------------
# in-process service (test-grade, assertion-VERIFYING token endpoint)
# --------------------------------------------------------------------------


class MiniPubSubServer:
    """Pub/Sub REST subset for e2e tests: publish / pull (ack-deadline
    redelivery) / acknowledge / createSubscription, plus an OAuth token
    endpoint that VERIFIES the RS256 service-account assertion with the
    account's PUBLIC key before minting a bearer token (rejected
    otherwise) — the full auth chain is exercised. Unauthenticated mode
    (no `service_accounts`) mirrors the emulator contract."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 service_accounts: dict[str, str] | None = None,
                 ack_deadline_s: float = 2.0):
        self.host, self.port = host, port
        # client_email -> public key PEM
        self.service_accounts = dict(service_accounts or {})
        self.ack_deadline_s = ack_deadline_s
        # topic -> [(data_b64, attributes)]
        self._topics: dict[str, list] = {}
        # subscription -> {"topic": t, "queue": [[mid, data_b64, attrs, visible_after]]}
        self._subs: dict[str, dict] = {}
        self._tokens: set[str] = set()
        self._seq = 0
        self._lock = threading.Lock()
        self._srv = None
        self._thread = None

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"

    @property
    def token_uri(self) -> str:
        return f"http://{self.host}:{self.port}/token"

    def create_topic(self, name: str) -> None:
        with self._lock:
            self._topics.setdefault(name, [])

    def subscription_size(self, name: str) -> int:
        with self._lock:
            return len(self._subs.get(name, {}).get("queue", []))

    def start(self) -> "MiniPubSubServer":
        import http.server
        import re

        svc = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def _reply(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authed(self) -> bool:
                if not svc.service_accounts:
                    return True  # emulator mode
                auth = self.headers.get("Authorization", "")
                return auth.removeprefix("Bearer ") in svc._tokens

            def _handle_token(self, payload: bytes) -> None:
                import urllib.parse as up

                from bento_spark.functions.crypto_prims import (
                    parse_rsa_public,
                    rsa_verify,
                )

                form = up.parse_qs(payload.decode("ascii"))
                assertion = (form.get("assertion") or [""])[0]
                try:
                    h, c, s = assertion.split(".")
                    pad = lambda x: x + "=" * (-len(x) % 4)  # noqa: E731
                    claims = json.loads(base64.urlsafe_b64decode(pad(c)))
                    pub_pem = svc.service_accounts.get(claims.get("iss", ""))
                    if pub_pem is None:
                        return self._reply(401, {"error": "unknown client_email"})
                    ok = rsa_verify(parse_rsa_public(pub_pem),
                                    f"{h}.{c}".encode("ascii"),
                                    base64.urlsafe_b64decode(pad(s)), 256)
                    if not ok:
                        return self._reply(401, {"error": "invalid_grant"})
                except (ValueError, KeyError):
                    return self._reply(400, {"error": "malformed assertion"})
                with svc._lock:
                    svc._seq += 1
                    tok = f"ya29.mini-{svc._seq}"
                    svc._tokens.add(tok)
                return self._reply(200, {"access_token": tok,
                                         "token_type": "Bearer",
                                         "expires_in": 3600})

            def do_PUT(self):  # noqa: N802
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if not self._authed():
                    return self._reply(401, {"error": "unauthorized"})
                m = re.match(r"/v1/projects/[^/]+/subscriptions/([^/:]+)$", self.path)
                if m:
                    topic = body.get("topic", "").split("/")[-1]
                    with svc._lock:
                        if m.group(1) in svc._subs:
                            # the real API's restart behavior — clients
                            # must treat this as success
                            return self._reply(409, {"error": {
                                "code": 409, "status": "ALREADY_EXISTS"}})
                        svc._topics.setdefault(topic, [])
                        svc._subs[m.group(1)] = {"topic": topic, "queue": []}
                    return self._reply(200, {"name": self.path[4:]})
                return self._reply(404, {"error": "unknown path"})

            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length", 0))
                payload = self.rfile.read(n)
                if self.path == "/token":
                    return self._handle_token(payload)
                if not self._authed():
                    return self._reply(401, {"error": "unauthorized"})
                body = json.loads(payload or b"{}")
                m = re.match(r"/v1/projects/[^/]+/topics/([^/:]+):publish$",
                             self.path)
                if m:
                    topic = m.group(1)
                    mids = []
                    with svc._lock:
                        svc._topics.setdefault(topic, [])
                        for msg in body.get("messages", []):
                            svc._seq += 1
                            mid = str(svc._seq)
                            mids.append(mid)
                            for sub in svc._subs.values():
                                if sub["topic"] == topic:
                                    sub["queue"].append(
                                        [mid, msg.get("data", ""),
                                         msg.get("attributes") or {}, 0.0])
                    return self._reply(200, {"messageIds": mids})
                m = re.match(r"/v1/projects/[^/]+/subscriptions/([^/:]+):pull$",
                             self.path)
                if m:
                    now = time.monotonic()
                    with svc._lock:
                        sub = svc._subs.get(m.group(1))
                        if sub is None:
                            return self._reply(404, {"error": "no such subscription"})
                        visible = [e for e in sub["queue"] if e[3] <= now]
                        picked = visible[: int(body.get("maxMessages", 1))]
                        for e in picked:
                            e[3] = now + svc.ack_deadline_s
                    return self._reply(200, {"receivedMessages": [
                        {"ackId": f"{e[0]}|{e[3]}",
                         "message": {"messageId": e[0], "data": e[1],
                                     "attributes": e[2]}}
                        for e in picked
                    ] or None})
                m = re.match(
                    r"/v1/projects/[^/]+/subscriptions/([^/:]+):acknowledge$",
                    self.path)
                if m:
                    ids = {a.split("|")[0] for a in body.get("ackIds", [])}
                    with svc._lock:
                        sub = svc._subs.get(m.group(1))
                        if sub is not None:
                            sub["queue"] = [e for e in sub["queue"]
                                            if e[0] not in ids]
                    return self._reply(200, {})
                return self._reply(404, {"error": "unknown path"})

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
