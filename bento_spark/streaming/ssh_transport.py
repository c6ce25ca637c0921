"""SSH 2.0 transport + userauth + connection layers, dependency-free —
the substrate for the `sftp` connector (streaming/sftp.py).

Implemented from the public RFCs:
- RFC 4253 (transport): version exchange, binary packet protocol,
  algorithm negotiation, diffie-hellman-group14-sha256 kex (RFC 4419
  naming; the group is RFC 3526 §3's 2048-bit MODP group), `aes128-ctr`
  encryption (RFC 4344), `hmac-sha2-256` MACs (RFC 6668), `ssh-rsa`
  host keys with `rsa-sha2-256` signatures (RFC 8332).
- RFC 4252 (userauth): password method.
- RFC 4254 (connection): session channels, subsystem requests, data +
  window accounting.
- FIPS-197 AES: the S-box and round constants are DERIVED here from the
  GF(2^8) arithmetic the spec defines (multiplicative inverse + affine
  transform) rather than pasted as tables — the same
  constants-from-first-principles posture as the repo's bcrypt
  (pi-digit Blowfish boxes). Encrypt-only: CTR mode needs only the
  forward cipher for both directions.

Both the CLIENT (SshClient) and the test-grade SERVER (SshServerConn,
used by streaming/sftp.py's MiniSftpServer) speak through the same
SshTransport, so every byte each side emits is parsed by the shared
spec implementation — the signer/cipher/MAC are validated end-to-end,
not assumed. Randomness here (kex secrets, padding, cookies) is
transport-level only and never reaches row content, preserving the
engine's replay-identity contract.

Reference context: internal/impl/sftp/shared.go connects with
github.com/pkg/sftp over golang.org/x/crypto/ssh; no paramiko wheel
ships in this sandbox, so the wire protocols are implemented from the
RFCs — the posture every other connector in this repo takes."""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import os
import socket
import struct

# ---------------------------------------------------------------------------
# AES (FIPS-197), encrypt-only, constants derived from the spec's GF(2^8)
# ---------------------------------------------------------------------------


def _gf_mul(a: int, b: int) -> int:
    """GF(2^8) multiply modulo the AES polynomial x^8+x^4+x^3+x+1."""
    out = 0
    while b:
        if b & 1:
            out ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return out


def _build_sbox() -> bytes:
    """FIPS-197 §5.1.1: S(x) = affine(inverse(x)); inverse(0) = 0."""
    # multiplicative inverses via x^254 (Fermat in GF(2^8))
    inv = [0] * 256
    for x in range(1, 256):
        v = 1
        for _ in range(254):
            v = _gf_mul(v, x)
        inv[x] = v
    sbox = bytearray(256)
    for x in range(256):
        b = inv[x]
        y = 0x63  # the affine constant c
        for i in range(8):
            bit = ((b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                   ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8))) & 1
            y ^= bit << i
        sbox[x] = y
    return bytes(sbox)


_SBOX = _build_sbox()
_RCON = []
_r = 1
for _ in range(10):
    _RCON.append(_r)
    _r = _gf_mul(_r, 2)

# T-tables: SubBytes+ShiftRows+MixColumns folded per byte (standard
# construction from the spec's round definition)
_T0 = []
for _x in range(256):
    s = _SBOX[_x]
    s2, s3 = _gf_mul(s, 2), _gf_mul(s, 3)
    _T0.append((s2 << 24) | (s << 16) | (s << 8) | s3)
_T1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T0]
_T2 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T1]
_T3 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T2]


class AES:
    """Encrypt-only AES (128/192/256-bit keys), T-table implementation."""

    def __init__(self, key: bytes):
        nk = len(key) // 4
        if nk not in (4, 6, 8):
            raise ValueError("AES key must be 16/24/32 bytes")
        self.rounds = nk + 6
        w = list(struct.unpack(f">{nk}I", key))
        for i in range(nk, 4 * (self.rounds + 1)):
            t = w[i - 1]
            if i % nk == 0:
                t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
                t = ((_SBOX[(t >> 24) & 0xFF] << 24)
                     | (_SBOX[(t >> 16) & 0xFF] << 16)
                     | (_SBOX[(t >> 8) & 0xFF] << 8)
                     | _SBOX[t & 0xFF])
                t ^= _RCON[i // nk - 1] << 24
            elif nk > 6 and i % nk == 4:
                t = ((_SBOX[(t >> 24) & 0xFF] << 24)
                     | (_SBOX[(t >> 16) & 0xFF] << 16)
                     | (_SBOX[(t >> 8) & 0xFF] << 8)
                     | _SBOX[t & 0xFF])
            w.append(w[i - nk] ^ t)
        self._rk = w

    def encrypt_block(self, block: bytes) -> bytes:
        rk = self._rk
        s0, s1, s2, s3 = struct.unpack(">4I", block)
        s0 ^= rk[0]
        s1 ^= rk[1]
        s2 ^= rk[2]
        s3 ^= rk[3]
        k = 4
        for _ in range(self.rounds - 1):
            t0 = (_T0[(s0 >> 24) & 0xFF] ^ _T1[(s1 >> 16) & 0xFF]
                  ^ _T2[(s2 >> 8) & 0xFF] ^ _T3[s3 & 0xFF] ^ rk[k])
            t1 = (_T0[(s1 >> 24) & 0xFF] ^ _T1[(s2 >> 16) & 0xFF]
                  ^ _T2[(s3 >> 8) & 0xFF] ^ _T3[s0 & 0xFF] ^ rk[k + 1])
            t2 = (_T0[(s2 >> 24) & 0xFF] ^ _T1[(s3 >> 16) & 0xFF]
                  ^ _T2[(s0 >> 8) & 0xFF] ^ _T3[s1 & 0xFF] ^ rk[k + 2])
            t3 = (_T0[(s3 >> 24) & 0xFF] ^ _T1[(s0 >> 16) & 0xFF]
                  ^ _T2[(s1 >> 8) & 0xFF] ^ _T3[s2 & 0xFF] ^ rk[k + 3])
            s0, s1, s2, s3 = t0, t1, t2, t3
            k += 4
        # final round: SubBytes + ShiftRows, no MixColumns
        out = bytearray(16)
        src = (s0, s1, s2, s3)
        for c in range(4):
            out[4 * c] = _SBOX[(src[c] >> 24) & 0xFF]
            out[4 * c + 1] = _SBOX[(src[(c + 1) % 4] >> 16) & 0xFF]
            out[4 * c + 2] = _SBOX[(src[(c + 2) % 4] >> 8) & 0xFF]
            out[4 * c + 3] = _SBOX[src[(c + 3) % 4] & 0xFF]
        k0, k1, k2, k3 = rk[k], rk[k + 1], rk[k + 2], rk[k + 3]
        final = struct.pack(">4I",
                            struct.unpack(">I", out[0:4])[0] ^ k0,
                            struct.unpack(">I", out[4:8])[0] ^ k1,
                            struct.unpack(">I", out[8:12])[0] ^ k2,
                            struct.unpack(">I", out[12:16])[0] ^ k3)
        return final


class AesCtr:
    """SP 800-38A counter mode over the forward cipher; the 128-bit
    counter increments big-endian per block (RFC 4344 §4 semantics)."""

    def __init__(self, key: bytes, iv: bytes):
        self._aes = AES(key)
        self._counter = int.from_bytes(iv, "big")
        self._stream = b""

    def process(self, data: bytes) -> bytes:
        while len(self._stream) < len(data):
            block = self._counter.to_bytes(16, "big")
            self._counter = (self._counter + 1) & ((1 << 128) - 1)
            self._stream += self._aes.encrypt_block(block)
        ks, self._stream = (self._stream[: len(data)],
                            self._stream[len(data):])
        return bytes(a ^ b for a, b in zip(data, ks))


# ---------------------------------------------------------------------------
# SSH wire primitives
# ---------------------------------------------------------------------------

# RFC 3526 §3 — 2048-bit MODP group ("group14"), generator 2
GROUP14_P = int(
    "FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74"
    "020BBEA63B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F1437"
    "4FE1356D6D51C245E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7ED"
    "EE386BFB5A899FA5AE9F24117C4B1FE649286651ECE45B3DC2007CB8A163BF05"
    "98DA48361C55D39A69163FA8FD24CF5F83655D23DCA3AD961C62F356208552BB"
    "9ED529077096966D670C354E4ABC9804F1746C08CA18217C32905E462E36CE3B"
    "E39E772C180E86039B2783A2EC07A28FB5C55DF06F4C52C9DE2BCBF695581718"
    "3995497CEA956AE515D2261898FA051015728E5A8AACAA68FFFFFFFFFFFFFFFF",
    16)
GROUP14_G = 2

MSG_DISCONNECT, MSG_IGNORE, MSG_UNIMPLEMENTED, MSG_DEBUG = 1, 2, 3, 4
MSG_SERVICE_REQUEST, MSG_SERVICE_ACCEPT = 5, 6
MSG_KEXINIT, MSG_NEWKEYS = 20, 21
MSG_KEXDH_INIT, MSG_KEXDH_REPLY = 30, 31
MSG_USERAUTH_REQUEST, MSG_USERAUTH_FAILURE, MSG_USERAUTH_SUCCESS = 50, 51, 52
MSG_CHANNEL_OPEN, MSG_CHANNEL_OPEN_CONFIRMATION = 90, 91
MSG_CHANNEL_OPEN_FAILURE, MSG_CHANNEL_WINDOW_ADJUST = 92, 93
MSG_CHANNEL_DATA, MSG_CHANNEL_EOF, MSG_CHANNEL_CLOSE = 94, 96, 97
MSG_CHANNEL_REQUEST, MSG_CHANNEL_SUCCESS, MSG_CHANNEL_FAILURE = 98, 99, 100

KEX_ALGO = "diffie-hellman-group14-sha256"
HOSTKEY_ALGO = "rsa-sha2-256"
CIPHER = "aes128-ctr"
MAC_ALGO = "hmac-sha2-256"


def sp(s: bytes | str) -> bytes:
    """string: uint32 length + bytes."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    return struct.pack(">I", len(b)) + b


def mpint(n: int) -> bytes:
    if n == 0:
        return struct.pack(">I", 0)
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return struct.pack(">I", len(b)) + b


class Reader:
    def __init__(self, buf: bytes):
        self.buf, self.pos = buf, 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("ssh: truncated field")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u32(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack(">Q", self.take(8))[0]

    def string(self) -> bytes:
        return self.take(self.u32())

    def mpint(self) -> int:
        return int.from_bytes(self.string(), "big")

    def boolean(self) -> bool:
        return self.u8() != 0

    def remaining(self) -> int:
        return len(self.buf) - self.pos


def rsa_host_blob(n: int, e: int) -> bytes:
    """RFC 4253 §6.6 ssh-rsa public key blob."""
    return sp("ssh-rsa") + mpint(e) + mpint(n)


def rsa_sha256_signature(key: dict, data: bytes) -> bytes:
    """RFC 8332 rsa-sha2-256 signature blob over `data`."""
    from bento_spark.functions.crypto_prims import rsa_sign

    return sp(HOSTKEY_ALGO) + sp(rsa_sign(key, data, 256))


def verify_rsa_sha256(blob: bytes, sig_blob: bytes, data: bytes) -> bool:
    from bento_spark.functions.crypto_prims import rsa_verify

    r = Reader(blob)
    if r.string() != b"ssh-rsa":
        return False
    e, n = r.mpint(), r.mpint()
    s = Reader(sig_blob)
    if s.string().decode() != HOSTKEY_ALGO:
        return False
    return rsa_verify({"n": n, "e": e}, data, s.string(), 256)


def build_kexinit() -> bytes:
    """Our single-algorithm KEXINIT (RFC 4253 §7.1)."""
    body = bytes([MSG_KEXINIT]) + os.urandom(16)
    for lst in (KEX_ALGO, HOSTKEY_ALGO, CIPHER, CIPHER, MAC_ALGO, MAC_ALGO,
                "none", "none", "", ""):
        body += sp(lst)
    body += b"\x00" + struct.pack(">I", 0)
    return body


def check_kexinit(payload: bytes) -> None:
    """The peer must offer our algorithms (single-suite negotiation)."""
    r = Reader(payload)
    r.u8()
    r.take(16)
    wanted = [KEX_ALGO, HOSTKEY_ALGO, CIPHER, CIPHER, MAC_ALGO, MAC_ALGO,
              "none", "none", None, None]
    for want in wanted:
        offered = r.string().decode("utf-8", "replace").split(",")
        if want is not None and want not in offered:
            raise ConnectionError(
                f"ssh: peer offers {offered!r}, need {want!r}")


def derive_key(k_mp: bytes, h: bytes, letter: bytes, session_id: bytes,
               length: int) -> bytes:
    """RFC 4253 §7.2 key derivation (sha256 for this kex)."""
    out = hashlib.sha256(k_mp + h + letter + session_id).digest()
    while len(out) < length:
        out += hashlib.sha256(k_mp + h + out).digest()
    return out[:length]


class SshTransport:
    """The binary packet protocol (RFC 4253 §6) for either role: plaintext
    until NEWKEYS, then aes128-ctr + hmac-sha2-256 (encrypt-and-mac over
    the sequence number + clear packet)."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self._buf = bytearray()
        self.seq_out = 0
        self.seq_in = 0
        self._enc: AesCtr | None = None
        self._dec: AesCtr | None = None
        self._mac_out: bytes | None = None
        self._mac_in: bytes | None = None

    def enable_crypto(self, enc_key, enc_iv, dec_key, dec_iv,
                      mac_out, mac_in) -> None:
        self._enc = AesCtr(enc_key, enc_iv)
        self._dec = AesCtr(dec_key, dec_iv)
        self._mac_out, self._mac_in = mac_out, mac_in

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("ssh: connection closed")
            self._buf += chunk
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def send_packet(self, payload: bytes) -> None:
        block = 16 if self._enc else 8
        pad = block - ((len(payload) + 5) % block)
        if pad < 4:
            pad += block
        clear = struct.pack(">IB", len(payload) + pad + 1, pad) \
            + payload + os.urandom(pad)
        if self._enc is None:
            self.sock.sendall(clear)
        else:
            mac = hmac_mod.new(self._mac_out,
                               struct.pack(">I", self.seq_out) + clear,
                               hashlib.sha256).digest()
            self.sock.sendall(self._enc.process(clear) + mac)
        self.seq_out += 1

    def recv_packet(self) -> bytes:
        if self._dec is None:
            head = self._read_exact(4)
            length = struct.unpack(">I", head)[0]
            if length > (1 << 24):
                raise ConnectionError("ssh: packet too large")
            rest = self._read_exact(length)
            clear = head + rest
        else:
            head = self._dec.process(self._read_exact(16))
            length = struct.unpack(">I", head[:4])[0]
            if length > (1 << 24):
                raise ConnectionError("ssh: packet too large")
            rest = self._dec.process(self._read_exact(length - 12))
            mac = self._read_exact(32)
            clear = head + rest
            want = hmac_mod.new(self._mac_in,
                                struct.pack(">I", self.seq_in) + clear,
                                hashlib.sha256).digest()
            if not hmac_mod.compare_digest(mac, want):
                raise ConnectionError("ssh: MAC mismatch")
        self.seq_in += 1
        pad = clear[4]
        return clear[5 : len(clear) - pad]

    def recv_msg(self) -> bytes:
        """Next non-transport-noise packet (IGNORE/DEBUG skipped)."""
        while True:
            p = self.recv_packet()
            if p and p[0] in (MSG_IGNORE, MSG_DEBUG):
                continue
            if p and p[0] == MSG_DISCONNECT:
                r = Reader(p)
                r.u8()
                r.u32()
                raise ConnectionError(
                    f"ssh: disconnected: {r.string().decode(errors='replace')}")
            return p


def exchange_versions(sock: socket.socket, ours: str) -> str:
    sock.sendall((ours + "\r\n").encode("ascii"))
    line = b""
    while not line.endswith(b"\n"):
        c = sock.recv(1)
        if not c:
            raise ConnectionError("ssh: closed during version exchange")
        line += c
        if len(line) > 4096:
            raise ConnectionError("ssh: oversized version line")
    return line.decode("ascii", "replace").strip()


def _kex_hash(v_c: str, v_s: str, i_c: bytes, i_s: bytes, k_s: bytes,
              e: int, f: int, k: int) -> bytes:
    return hashlib.sha256(
        sp(v_c) + sp(v_s) + sp(i_c) + sp(i_s) + sp(k_s)
        + mpint(e) + mpint(f) + mpint(k)).digest()


class SshClient:
    """Client role: version exchange, group14 kex (verifying the host
    signature; optionally pinning the host key blob), NEWKEYS, password
    or publickey userauth (RFC 4252 §7: rsa-sha2-256 signature over the
    session id + the auth request), then one session channel running a
    named subsystem."""

    def __init__(self, host: str, port: int, username: str, password: str,
                 subsystem: str = "sftp", timeout: float = 15.0,
                 expected_hostkey: bytes | None = None,
                 private_key_pem: str | None = None):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        v_c = "SSH-2.0-bento_spark_0.1"
        v_s = exchange_versions(self.sock, v_c)
        if not v_s.startswith("SSH-2.0"):
            raise ConnectionError(f"ssh: unsupported server version {v_s!r}")
        t = SshTransport(self.sock)
        self.t = t
        i_c = build_kexinit()
        t.send_packet(i_c)
        i_s = t.recv_msg()
        if i_s[0] != MSG_KEXINIT:
            raise ConnectionError("ssh: expected KEXINIT")
        check_kexinit(i_s)
        x = int.from_bytes(os.urandom(64), "big") % (GROUP14_P - 2) + 2
        e = pow(GROUP14_G, x, GROUP14_P)
        t.send_packet(bytes([MSG_KEXDH_INIT]) + mpint(e))
        reply = t.recv_msg()
        if reply[0] != MSG_KEXDH_REPLY:
            raise ConnectionError("ssh: expected KEXDH_REPLY")
        r = Reader(reply)
        r.u8()
        k_s = r.string()
        f = r.mpint()
        sig = r.string()
        if not (1 < f < GROUP14_P - 1):
            raise ConnectionError("ssh: server DH value out of range")
        k = pow(f, x, GROUP14_P)
        h = _kex_hash(v_c, v_s, i_c, i_s, k_s, e, f, k)
        if not verify_rsa_sha256(k_s, sig, h):
            raise ConnectionError("ssh: host key signature invalid")
        if expected_hostkey is not None and k_s != expected_hostkey:
            raise ConnectionError("ssh: host key mismatch (pinned)")
        self.session_id = h
        t.send_packet(bytes([MSG_NEWKEYS]))
        if t.recv_msg()[0] != MSG_NEWKEYS:
            raise ConnectionError("ssh: expected NEWKEYS")
        km = mpint(k)
        t.enable_crypto(
            enc_key=derive_key(km, h, b"C", h, 16),
            enc_iv=derive_key(km, h, b"A", h, 16),
            dec_key=derive_key(km, h, b"D", h, 16),
            dec_iv=derive_key(km, h, b"B", h, 16),
            mac_out=derive_key(km, h, b"E", h, 32),
            mac_in=derive_key(km, h, b"F", h, 32))
        # userauth (RFC 4252: password §8 or publickey §7)
        t.send_packet(bytes([MSG_SERVICE_REQUEST]) + sp("ssh-userauth"))
        if t.recv_msg()[0] != MSG_SERVICE_ACCEPT:
            raise ConnectionError("ssh: userauth service refused")
        if private_key_pem is not None:
            from bento_spark.functions.crypto_prims import parse_rsa_private

            key = parse_rsa_private(private_key_pem)
            blob = rsa_host_blob(key["n"], key["e"])
            req = (sp(username) + sp("ssh-connection") + sp("publickey")
                   + b"\x01" + sp(HOSTKEY_ALGO) + sp(blob))
            # the signed data is session_id (as string) + the full request
            signed = sp(self.session_id) + bytes([MSG_USERAUTH_REQUEST]) + req
            sig = rsa_sha256_signature(key, signed)
            t.send_packet(bytes([MSG_USERAUTH_REQUEST]) + req + sp(sig))
        else:
            t.send_packet(bytes([MSG_USERAUTH_REQUEST]) + sp(username)
                          + sp("ssh-connection") + sp("password") + b"\x00"
                          + sp(password))
        resp = t.recv_msg()
        if resp[0] != MSG_USERAUTH_SUCCESS:
            raise ConnectionError("ssh: authentication failed")
        # session channel + subsystem (RFC 4254)
        self.channel = 0
        t.send_packet(bytes([MSG_CHANNEL_OPEN]) + sp("session")
                      + struct.pack(">III", self.channel, 1 << 31, 32768))
        conf = t.recv_msg()
        if conf[0] != MSG_CHANNEL_OPEN_CONFIRMATION:
            raise ConnectionError("ssh: channel open refused")
        r = Reader(conf)
        r.u8()
        r.u32()
        self.peer_channel = r.u32()
        t.send_packet(bytes([MSG_CHANNEL_REQUEST])
                      + struct.pack(">I", self.peer_channel)
                      + sp("subsystem") + b"\x01" + sp(subsystem))
        self._pending = b""
        while True:
            p = t.recv_msg()
            if p[0] == MSG_CHANNEL_SUCCESS:
                break
            if p[0] == MSG_CHANNEL_FAILURE:
                raise ConnectionError(f"ssh: subsystem {subsystem!r} refused")
            if p[0] == MSG_CHANNEL_DATA:
                rr = Reader(p)
                rr.u8()
                rr.u32()
                self._pending += rr.string()

    def send_data(self, data: bytes) -> None:
        self.t.send_packet(bytes([MSG_CHANNEL_DATA])
                           + struct.pack(">I", self.peer_channel) + sp(data))

    def recv_data(self) -> bytes:
        if self._pending:
            out, self._pending = self._pending, b""
            return out
        while True:
            p = self.t.recv_msg()
            if p[0] == MSG_CHANNEL_DATA:
                r = Reader(p)
                r.u8()
                r.u32()
                return r.string()
            if p[0] == MSG_CHANNEL_WINDOW_ADJUST:
                continue
            if p[0] in (MSG_CHANNEL_EOF, MSG_CHANNEL_CLOSE):
                raise ConnectionError("ssh: channel closed")

    def close(self) -> None:
        try:
            self.t.send_packet(bytes([MSG_CHANNEL_CLOSE])
                               + struct.pack(">I", self.peer_channel))
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass


class SshServerConn:
    """Server role for the in-process test server: the mirror of
    SshClient over the same transport — host-key signing, password
    check, one session channel whose subsystem data is handed to a
    callback."""

    def __init__(self, sock: socket.socket, host_key: dict,
                 users: dict[str, str], subsystems: dict,
                 authorized_keys: dict[str, bytes] | None = None):
        self.sock = sock
        self.host_key = host_key
        self.users = users
        # username -> authorized ssh-rsa public key BLOB (publickey auth)
        self.authorized_keys = dict(authorized_keys or {})
        self.subsystems = subsystems
        self.client_channel: int | None = None
        self.username: str | None = None

    def handshake(self) -> None:
        v_s = "SSH-2.0-bento_spark_minisshd"
        # server reads the client's version AFTER sending its own
        v_c = exchange_versions(self.sock, v_s)
        if not v_c.startswith("SSH-2.0"):
            raise ConnectionError("ssh: unsupported client version")
        t = SshTransport(self.sock)
        self.t = t
        i_s = build_kexinit()
        t.send_packet(i_s)
        i_c = t.recv_msg()
        if i_c[0] != MSG_KEXINIT:
            raise ConnectionError("ssh: expected KEXINIT")
        check_kexinit(i_c)
        init = t.recv_msg()
        if init[0] != MSG_KEXDH_INIT:
            raise ConnectionError("ssh: expected KEXDH_INIT")
        r = Reader(init)
        r.u8()
        e = r.mpint()
        if not (1 < e < GROUP14_P - 1):
            raise ConnectionError("ssh: client DH value out of range")
        y = int.from_bytes(os.urandom(64), "big") % (GROUP14_P - 2) + 2
        f = pow(GROUP14_G, y, GROUP14_P)
        k = pow(e, y, GROUP14_P)
        k_s = rsa_host_blob(self.host_key["n"], self.host_key["e"])
        h = _kex_hash(v_c, v_s, i_c, i_s, k_s, e, f, k)
        sig = rsa_sha256_signature(self.host_key, h)
        t.send_packet(bytes([MSG_KEXDH_REPLY]) + sp(k_s) + mpint(f) + sp(sig))
        t.send_packet(bytes([MSG_NEWKEYS]))
        if t.recv_msg()[0] != MSG_NEWKEYS:
            raise ConnectionError("ssh: expected NEWKEYS")
        km = mpint(k)
        # mirror of the client's directions
        t.enable_crypto(
            enc_key=derive_key(km, h, b"D", h, 16),
            enc_iv=derive_key(km, h, b"B", h, 16),
            dec_key=derive_key(km, h, b"C", h, 16),
            dec_iv=derive_key(km, h, b"A", h, 16),
            mac_out=derive_key(km, h, b"F", h, 32),
            mac_in=derive_key(km, h, b"E", h, 32))
        # userauth
        req = t.recv_msg()
        if req[0] != MSG_SERVICE_REQUEST:
            raise ConnectionError("ssh: expected SERVICE_REQUEST")
        t.send_packet(bytes([MSG_SERVICE_ACCEPT]) + sp("ssh-userauth"))
        while True:
            p = t.recv_msg()
            if p[0] != MSG_USERAUTH_REQUEST:
                raise ConnectionError("ssh: expected USERAUTH_REQUEST")
            r = Reader(p)
            r.u8()
            user = r.string().decode()
            r.string()  # service
            method = r.string().decode()
            ok = False
            if method == "password":
                r.boolean()
                pwd = r.string().decode()
                ok = self.users.get(user) == pwd
            elif method == "publickey":
                has_sig = r.boolean()
                alg = r.string().decode()
                blob = r.string()
                authorized = self.authorized_keys.get(user)
                if has_sig and alg == HOSTKEY_ALGO and authorized == blob:
                    sig = r.string()
                    # the request MINUS the trailing signature field
                    req_wo_sig = p[: len(p) - 4 - len(sig)]
                    signed = sp(h) + req_wo_sig
                    ok = verify_rsa_sha256(blob, sig, signed)
            if ok:
                self.username = user
                t.send_packet(bytes([MSG_USERAUTH_SUCCESS]))
                break
            t.send_packet(bytes([MSG_USERAUTH_FAILURE])
                          + sp("password,publickey") + b"\x00")

    def serve_channel(self) -> None:
        """One session channel; subsystem data round-trips through the
        registered handler until the peer closes."""
        t = self.t
        handler = None
        while True:
            p = t.recv_msg()
            kind = p[0]
            if kind == MSG_CHANNEL_OPEN:
                r = Reader(p)
                r.u8()
                ctype = r.string().decode()
                sender = r.u32()
                if ctype != "session":
                    t.send_packet(bytes([MSG_CHANNEL_OPEN_FAILURE])
                                  + struct.pack(">II", sender, 3)
                                  + sp("unsupported") + sp(""))
                    continue
                self.client_channel = sender
                t.send_packet(bytes([MSG_CHANNEL_OPEN_CONFIRMATION])
                              + struct.pack(">IIII", sender, 0, 1 << 31, 32768))
            elif kind == MSG_CHANNEL_REQUEST:
                r = Reader(p)
                r.u8()
                r.u32()
                rtype = r.string().decode()
                want_reply = r.boolean()
                name = r.string().decode() if rtype == "subsystem" else ""
                factory = self.subsystems.get(name)
                if rtype == "subsystem" and factory is not None:
                    handler = factory(self.username)
                    if want_reply:
                        t.send_packet(bytes([MSG_CHANNEL_SUCCESS])
                                      + struct.pack(">I", self.client_channel))
                elif want_reply:
                    t.send_packet(bytes([MSG_CHANNEL_FAILURE])
                                  + struct.pack(">I", self.client_channel))
            elif kind == MSG_CHANNEL_DATA:
                r = Reader(p)
                r.u8()
                r.u32()
                data = r.string()
                if handler is not None:
                    for out in handler(data):
                        t.send_packet(
                            bytes([MSG_CHANNEL_DATA])
                            + struct.pack(">I", self.client_channel) + sp(out))
            elif kind in (MSG_CHANNEL_EOF, MSG_CHANNEL_CLOSE):
                return
