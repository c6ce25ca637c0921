"""Public-key crypto primitives for the RS/ES JWT bloblang methods —
pure-Python RSA PKCS#1 v1.5 and deterministic ECDSA (RFC 6979) over the
NIST P-256/P-384/P-521 curves, with a minimal DER/PEM key parser.

Reference: internal/impl/crypto/jwt_sign.go:112-148 and
jwt_parse.go (RS256/384/512, ES256/384/512 via golang-jwt). The reference
leans on Go's crypto stdlib; no cryptography wheel ships in this sandbox,
so the algorithms are implemented from their public specifications
(RFC 8017 §8.2 EMSA-PKCS1-v1_5, RFC 6979 deterministic ECDSA, SEC 1 /
RFC 5915/5480 key encodings) — NOT a general-purpose crypto library:
no constant-time guarantees, no blinding. It exists for JWT parity and
is suitable for token signing/verification in data pipelines, where the
secret lives in config, not for hostile-adversary side-channel settings.

Determinism: RFC 6979 derives the ECDSA nonce from (key, message), so
signing is a pure function — same row in, same token out (the repo's
exactly-once row-identity invariant; a random-k ECDSA would break replay
stability).

Tests cross-validate both directions against OpenSSL (signatures we
produce verify under `openssl dgst -verify`; OpenSSL-produced signatures
verify here).
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import re

# --------------------------------------------------------------------------
# DER / PEM
# --------------------------------------------------------------------------


def pem_to_der(pem: str) -> tuple[str, bytes]:
    """-> (label, der). Accepts exactly one PEM block."""
    import base64

    m = re.search(
        r"-----BEGIN ([A-Z0-9 ]+)-----(.*?)-----END \1-----", pem, re.S
    )
    if not m:
        raise ValueError("crypto: no PEM block found")
    return m.group(1), base64.b64decode(re.sub(r"\s+", "", m.group(2)))


class _Der:
    __slots__ = ("buf", "pos", "end")

    def __init__(self, buf: bytes, pos: int = 0, end: int | None = None):
        self.buf, self.pos = buf, pos
        self.end = len(buf) if end is None else end

    def _tlv(self) -> tuple[int, bytes]:
        tag = self.buf[self.pos]
        i = self.pos + 1
        n = self.buf[i]
        i += 1
        if n & 0x80:
            nlen = n & 0x7F
            n = int.from_bytes(self.buf[i : i + nlen], "big")
            i += nlen
        val = self.buf[i : i + n]
        self.pos = i + n
        return tag, val

    def expect(self, tag: int) -> bytes:
        got, val = self._tlv()
        if got != tag:
            raise ValueError(f"crypto: DER expected tag 0x{tag:02x}, got 0x{got:02x}")
        return val

    def seq(self) -> "_Der":
        return _Der(self.expect(0x30))

    def integer(self) -> int:
        return int.from_bytes(self.expect(0x02), "big", signed=False)

    def octets(self) -> bytes:
        return self.expect(0x04)

    def bitstring(self) -> bytes:
        v = self.expect(0x03)
        if not v or v[0] != 0:
            raise ValueError("crypto: unsupported BIT STRING padding")
        return v[1:]

    def oid(self) -> tuple[int, ...]:
        v = self.expect(0x06)
        out = [v[0] // 40, v[0] % 40]
        acc = 0
        for b in v[1:]:
            acc = (acc << 7) | (b & 0x7F)
            if not b & 0x80:
                out.append(acc)
                acc = 0
        return tuple(out)

    def peek_tag(self) -> int | None:
        return self.buf[self.pos] if self.pos < self.end else None

    def skip(self) -> None:
        self._tlv()


_OID_RSA = (1, 2, 840, 113549, 1, 1, 1)
_OID_EC = (1, 2, 840, 10045, 2, 1)
_OID_CURVE = {
    (1, 2, 840, 10045, 3, 1, 7): "P-256",
    (1, 3, 132, 0, 34): "P-384",
    (1, 3, 132, 0, 35): "P-521",
}


def parse_rsa_private(pem: str) -> dict:
    """PKCS#1 ('RSA PRIVATE KEY') or PKCS#8 ('PRIVATE KEY') -> {n, e, d}."""
    label, der = pem_to_der(pem)
    if label == "PRIVATE KEY":  # PKCS#8 envelope
        outer = _Der(der).seq()
        outer.integer()  # version
        alg = outer.seq()
        if alg.oid() != _OID_RSA:
            raise ValueError("crypto: PKCS#8 key is not RSA")
        der = outer.octets()
    elif label != "RSA PRIVATE KEY":
        raise ValueError(f"crypto: unsupported RSA private PEM label {label!r}")
    k = _Der(der).seq()
    k.integer()  # version
    n, e, d = k.integer(), k.integer(), k.integer()
    return {"n": n, "e": e, "d": d}


def parse_rsa_public(pem: str) -> dict:
    """SPKI ('PUBLIC KEY') or PKCS#1 ('RSA PUBLIC KEY') -> {n, e}."""
    label, der = pem_to_der(pem)
    if label == "PUBLIC KEY":
        outer = _Der(der).seq()
        alg = outer.seq()
        if alg.oid() != _OID_RSA:
            raise ValueError("crypto: SPKI key is not RSA")
        der = outer.bitstring()
    elif label != "RSA PUBLIC KEY":
        raise ValueError(f"crypto: unsupported RSA public PEM label {label!r}")
    k = _Der(der).seq()
    return {"n": k.integer(), "e": k.integer()}


def parse_ec_private(pem: str) -> dict:
    """SEC1 ('EC PRIVATE KEY') or PKCS#8 -> {curve, d}."""
    label, der = pem_to_der(pem)
    curve = None
    if label == "PRIVATE KEY":
        outer = _Der(der).seq()
        outer.integer()
        alg = outer.seq()
        if alg.oid() != _OID_EC:
            raise ValueError("crypto: PKCS#8 key is not EC")
        curve = _OID_CURVE.get(alg.oid())
        der = outer.octets()
    elif label != "EC PRIVATE KEY":
        raise ValueError(f"crypto: unsupported EC private PEM label {label!r}")
    k = _Der(der).seq()
    k.integer()  # version (1)
    d = int.from_bytes(k.octets(), "big")
    while k.peek_tag() is not None:
        tag = k.peek_tag()
        if tag == 0xA0:  # [0] parameters: curve OID
            curve = _OID_CURVE.get(_Der(k.expect(0xA0)).oid())
        else:
            k.skip()
    if curve is None:
        raise ValueError("crypto: EC key has no recognized curve OID")
    return {"curve": curve, "d": d}


def parse_ec_public(pem: str) -> dict:
    """SPKI ('PUBLIC KEY') -> {curve, x, y} (uncompressed points only)."""
    label, der = pem_to_der(pem)
    if label != "PUBLIC KEY":
        raise ValueError(f"crypto: unsupported EC public PEM label {label!r}")
    outer = _Der(der).seq()
    alg = outer.seq()
    if alg.oid() != _OID_EC:
        raise ValueError("crypto: SPKI key is not EC")
    curve = _OID_CURVE.get(alg.oid())
    if curve is None:
        raise ValueError("crypto: unrecognized EC curve OID")
    pt = outer.bitstring()
    if not pt or pt[0] != 4:
        raise ValueError("crypto: only uncompressed EC points supported")
    half = (len(pt) - 1) // 2
    return {"curve": curve,
            "x": int.from_bytes(pt[1 : 1 + half], "big"),
            "y": int.from_bytes(pt[1 + half :], "big")}


# --------------------------------------------------------------------------
# RSA PKCS#1 v1.5 (RFC 8017 §8.2)
# --------------------------------------------------------------------------

# DigestInfo prefixes (RFC 8017 §9.2 note 1)
_DIGEST_INFO = {
    256: bytes.fromhex("3031300d060960864801650304020105000420"),
    384: bytes.fromhex("3041300d060960864801650304020205000430"),
    512: bytes.fromhex("3051300d060960864801650304020305000440"),
}


def _emsa_pkcs1(msg: bytes, bits: int, em_len: int) -> bytes:
    h = hashlib.new(f"sha{bits}", msg).digest()
    t = _DIGEST_INFO[bits] + h
    if em_len < len(t) + 11:
        raise ValueError("crypto: RSA modulus too small for digest")
    return b"\x00\x01" + b"\xff" * (em_len - len(t) - 3) + b"\x00" + t


def rsa_sign(key: dict, msg: bytes, bits: int) -> bytes:
    k = (key["n"].bit_length() + 7) // 8
    em = int.from_bytes(_emsa_pkcs1(msg, bits, k), "big")
    return pow(em, key["d"], key["n"]).to_bytes(k, "big")


def rsa_verify(key: dict, msg: bytes, sig: bytes, bits: int) -> bool:
    k = (key["n"].bit_length() + 7) // 8
    if len(sig) != k:
        return False
    em = pow(int.from_bytes(sig, "big"), key["e"], key["n"]).to_bytes(k, "big")
    try:
        return _hmac.compare_digest(em, _emsa_pkcs1(msg, bits, k))
    except ValueError:
        return False


# --------------------------------------------------------------------------
# ECDSA over NIST P-256 / P-384 / P-521 (SEC 1) with RFC 6979 nonces
# --------------------------------------------------------------------------

_CURVES = {
    "P-256": {
        "p": 2**256 - 2**224 + 2**192 + 2**96 - 1,
        "n": 0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551,
        "b": 0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
        "gx": 0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
        "gy": 0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
        "bits": 256,
    },
    "P-384": {
        "p": 2**384 - 2**128 - 2**96 + 2**32 - 1,
        "n": 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFC7634D81F4372DDF581A0DB248B0A77AECEC196ACCC52973,
        "b": 0xB3312FA7E23EE7E4988E056BE3F82D19181D9C6EFE8141120314088F5013875AC656398D8A2ED19D2A85C8EDD3EC2AEF,
        "gx": 0xAA87CA22BE8B05378EB1C71EF320AD746E1D3B628BA79B9859F741E082542A385502F25DBF55296C3A545E3872760AB7,
        "gy": 0x3617DE4A96262C6F5D9E98BF9292DC29F8F41DBD289A147CE9DA3113B5F0B8C00A60B1CE1D7E819D7A431D7C90EA0E5F,
        "bits": 384,
    },
    "P-521": {
        "p": 2**521 - 1,
        "n": 0x01FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFA51868783BF2F966B7FCC0148F709A5D03BB5C9B8899C47AEBB6FB71E91386409,
        "b": 0x0051953EB9618E1C9A1F929A21A0B68540EEA2DA725B99B315F3B8B489918EF109E156193951EC7E937B1652C0BD3BB1BF073573DF883D2C34F1EF451FD46B503F00,
        "gx": 0x00C6858E06B70404E9CD9E3ECB662395B4429C648139053FB521F828AF606B4D3DBAA14B5E77EFE75928FE1DC127A2FFA8DE3348B3C1856A429BF97E7E31C2E5BD66,
        "gy": 0x011839296A789A3BC0045C8A5FB42C7D1BD998F54449579B446817AFBD17273E662C97EE72995EF42640C550B9013FAD0761353C7086A272C24088BE94769FD16650,
        "bits": 521,
    },
}

# JOSE alg -> (curve, hash bits); note ES512 = P-521 + SHA-512
JOSE_CURVE = {"ES256": ("P-256", 256), "ES384": ("P-384", 384), "ES512": ("P-521", 512)}


def _ec_add(cv: dict, P, Q):
    """Affine point addition; None = point at infinity; a = -3 (NIST)."""
    p = cv["p"]
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        lam = (3 * x1 * x1 - 3) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return x3, (lam * (x1 - x3) - y1) % p


def _ec_mul(cv: dict, k: int, P):
    R = None
    while k:
        if k & 1:
            R = _ec_add(cv, R, P)
        P = _ec_add(cv, P, P)
        k >>= 1
    return R


def ec_on_curve(curve: str, x: int, y: int) -> bool:
    cv = _CURVES[curve]
    p = cv["p"]
    return (y * y - (x * x * x - 3 * x + cv["b"])) % p == 0


def ec_public_from_private(curve: str, d: int) -> tuple[int, int]:
    cv = _CURVES[curve]
    Q = _ec_mul(cv, d, (cv["gx"], cv["gy"]))
    assert Q is not None
    return Q


def _bits2int(b: bytes, qlen: int) -> int:
    v = int.from_bytes(b, "big")
    blen = len(b) * 8
    return v >> (blen - qlen) if blen > qlen else v


def _rfc6979_k(h1: bytes, x: int, q: int, hash_bits: int):
    """Yield deterministic nonce candidates (RFC 6979 §3.2)."""
    qlen = q.bit_length()
    rlen = (qlen + 7) // 8
    hname = f"sha{hash_bits}"
    hlen = hash_bits // 8
    x_oct = x.to_bytes(rlen, "big")
    h1_oct = (_bits2int(h1, qlen) % q).to_bytes(rlen, "big")
    V = b"\x01" * hlen
    K = b"\x00" * hlen
    K = _hmac.new(K, V + b"\x00" + x_oct + h1_oct, hname).digest()
    V = _hmac.new(K, V, hname).digest()
    K = _hmac.new(K, V + b"\x01" + x_oct + h1_oct, hname).digest()
    V = _hmac.new(K, V, hname).digest()
    while True:
        t = b""
        while len(t) * 8 < qlen:
            V = _hmac.new(K, V, hname).digest()
            t += V
        k = _bits2int(t, qlen)
        if 1 <= k < q:
            yield k
        K = _hmac.new(K, V + b"\x00", hname).digest()
        V = _hmac.new(K, V, hname).digest()


def ecdsa_sign_jose(curve: str, d: int, msg: bytes, hash_bits: int) -> bytes:
    """Deterministic ECDSA -> JOSE signature (fixed-width r||s,
    RFC 7518 §3.4)."""
    cv = _CURVES[curve]
    q = cv["n"]
    h1 = hashlib.new(f"sha{hash_bits}", msg).digest()
    z = _bits2int(h1, q.bit_length()) % q
    for k in _rfc6979_k(h1, d, q, hash_bits):
        R = _ec_mul(cv, k, (cv["gx"], cv["gy"]))
        if R is None:
            continue
        r = R[0] % q
        if r == 0:
            continue
        s = pow(k, -1, q) * (z + r * d) % q
        if s == 0:
            continue
        w = (q.bit_length() + 7) // 8
        return r.to_bytes(w, "big") + s.to_bytes(w, "big")
    raise AssertionError("unreachable")


def ecdsa_verify_jose(curve: str, x: int, y: int, msg: bytes, sig: bytes,
                      hash_bits: int) -> bool:
    cv = _CURVES[curve]
    q = cv["n"]
    w = (q.bit_length() + 7) // 8
    if len(sig) != 2 * w or not ec_on_curve(curve, x, y):
        return False
    r = int.from_bytes(sig[:w], "big")
    s = int.from_bytes(sig[w:], "big")
    if not (1 <= r < q and 1 <= s < q):
        return False
    h1 = hashlib.new(f"sha{hash_bits}", msg).digest()
    z = _bits2int(h1, q.bit_length()) % q
    si = pow(s, -1, q)
    u1, u2 = z * si % q, r * si % q
    R = _ec_add(cv, _ec_mul(cv, u1, (cv["gx"], cv["gy"])), _ec_mul(cv, u2, (x, y)))
    return R is not None and R[0] % q == r


# --------------------------------------------------------------------------
# bcrypt (OpenBSD eksblowfish, for the compare_bcrypt bloblang method)
# --------------------------------------------------------------------------
#
# Reference: internal/impl/crypto/bcrypt.go (x/crypto/bcrypt). Implemented
# from the public algorithm (Provos & Mazieres, "A Future-Adaptable
# Password Scheme", USENIX 1999) — Blowfish's initial P-array and S-boxes
# are the hexadecimal digits of pi, COMPUTED at first use (Machin's
# formula in integer arithmetic) instead of embedding 4 KiB of constants;
# the first words are asserted against the published values. Pure Python:
# a cost-10 compare takes seconds, not microseconds — suitable for
# control-plane auth checks in a pipeline, not for bulk row hashing.

_BCRYPT_B64 = "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
_bf_init: list | None = None


def _pi_hex_words(n_words: int) -> list[int]:
    """First n_words 32-bit words of pi's fractional part, via Machin:
    pi = 16*atan(1/5) - 4*atan(1/239) in fixed-point integer arithmetic."""
    bits = n_words * 32 + 64  # guard bits
    one = 1 << bits

    def atan_inv(x: int) -> int:
        x2 = x * x
        term = one // x
        total = term
        k = 1
        while term:
            term //= x2
            if term == 0:
                break
            if k % 2:
                total -= term // (2 * k + 1)
            else:
                total += term // (2 * k + 1)
            k += 1
        return total

    pi = 16 * atan_inv(5) - 4 * atan_inv(239)
    frac = pi - 3 * one  # 0.14159... in fixed point
    out = []
    for _ in range(n_words):
        frac *= 1 << 32
        w, frac = divmod(frac, one)
        out.append(int(w))
    return out


def _bf_initial() -> tuple[list[int], list[list[int]]]:
    global _bf_init
    if _bf_init is None:
        words = _pi_hex_words(18 + 1024)
        # published Blowfish constants — self-check the pi computation
        assert words[0] == 0x243F6A88 and words[1] == 0x85A308D3, "pi digits wrong"
        assert words[2] == 0x13198A2E and words[3] == 0x03707344, "pi digits wrong"
        _bf_init = (words[:18], [words[18 + 256 * i : 18 + 256 * (i + 1)]
                                 for i in range(4)])
    P, S = _bf_init
    return list(P), [list(s) for s in S]


def _bf_encrypt(P, S0, S1, S2, S3, L: int, R: int) -> tuple[int, int]:
    for i in range(0, 16, 2):
        L ^= P[i]
        R ^= ((S0[L >> 24] + S1[(L >> 16) & 0xFF]) ^ S2[(L >> 8) & 0xFF]) + S3[L & 0xFF]
        R &= 0xFFFFFFFF
        R ^= P[i + 1]
        L ^= ((S0[R >> 24] + S1[(R >> 16) & 0xFF]) ^ S2[(R >> 8) & 0xFF]) + S3[R & 0xFF]
        L &= 0xFFFFFFFF
    L ^= P[16]
    return R ^ P[17], L


def _cyclic_words(data: bytes):
    """Endless 32-bit big-endian words over data, wrapping mid-word like
    OpenBSD's Blowfish_stream2word."""
    j = 0
    n = len(data)
    while True:
        w = 0
        for _ in range(4):
            w = (w << 8) | data[j % n]
            j += 1
        yield w


def _bf_expand(P, S, key_stream, salt_stream=None) -> None:
    S0, S1, S2, S3 = S
    for i in range(18):
        P[i] ^= next(key_stream)
    L = R = 0
    for box in (P, S0, S1, S2, S3):
        for i in range(0, len(box), 2):
            if salt_stream is not None:
                L ^= next(salt_stream)
                R ^= next(salt_stream)
            L, R = _bf_encrypt(P, S0, S1, S2, S3, L, R)
            box[i], box[i + 1] = L, R


def _bcrypt_b64decode(s: str) -> bytes:
    bits = 0
    acc = 0
    out = bytearray()
    for ch in s:
        acc = (acc << 6) | _BCRYPT_B64.index(ch)
        bits += 6
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    return bytes(out)


def _bcrypt_b64encode(b: bytes) -> str:
    out = []
    acc = 0
    bits = 0
    for byte in b:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= 6:
            bits -= 6
            out.append(_BCRYPT_B64[(acc >> bits) & 0x3F])
    if bits:
        out.append(_BCRYPT_B64[(acc << (6 - bits)) & 0x3F])
    return "".join(out)


def bcrypt_hash(password: bytes, cost: int, salt: bytes, prefix: str = "2b") -> str:
    """-> modular-crypt string $<prefix>$<cost>$<salt22><hash31>. salt is
    exactly 16 bytes; $2a/$2b/$2y all key with password + NUL (truncated
    to 72 bytes), identical for passwords under 72 chars."""
    if len(salt) != 16:
        raise ValueError("bcrypt: salt must be 16 bytes")
    if not 4 <= cost <= 31:
        raise ValueError("bcrypt: cost out of range")
    if len(password) > 72:
        # x/crypto/bcrypt returns ErrPasswordTooLong instead of silently
        # truncating (a wrong long password with a matching 72-byte prefix
        # must NOT compare equal) — same contract here
        raise ValueError("bcrypt: password longer than 72 bytes")
    key = (password + b"\x00")[:72]
    P, S = _bf_initial()
    _bf_expand(P, S, _cyclic_words(key), _cyclic_words(salt))
    for _ in range(1 << cost):
        _bf_expand(P, S, _cyclic_words(key))
        _bf_expand(P, S, _cyclic_words(salt))
    ctext = [0x4F727068, 0x65616E42, 0x65686F6C,  # "OrpheanBeholderScryDoubt"
             0x64657253, 0x63727944, 0x6F756274]
    S0, S1, S2, S3 = S
    for i in range(0, 6, 2):
        L, R = ctext[i], ctext[i + 1]
        for _ in range(64):
            L, R = _bf_encrypt(P, S0, S1, S2, S3, L, R)
        ctext[i], ctext[i + 1] = L, R
    raw = b"".join(w.to_bytes(4, "big") for w in ctext)[:23]
    return (f"${prefix}${cost:02d}$"
            f"{_bcrypt_b64encode(salt)}{_bcrypt_b64encode(raw)}")


def bcrypt_parse(hashed: str) -> tuple[str, int, str]:
    """-> (prefix, cost, salt22); raises ValueError on a malformed hash.
    Cheap format validation — callers that only need well-formed-ness
    (compile-time checks) must use THIS, never a full compare (a cost-12
    compare is seconds of eksblowfish work)."""
    m = re.fullmatch(r"\$(2[abxy]?)\$(\d{2})\$([./A-Za-z0-9]{22})([./A-Za-z0-9]{31})",
                     hashed)
    if not m:
        raise ValueError("bcrypt: malformed hash")
    return m.group(1), int(m.group(2)), m.group(3)


def bcrypt_compare(password: bytes, hashed: str) -> bool:
    """CompareHashAndPassword (bcrypt.go:36): True on match, False on
    mismatch; raises ValueError on a malformed hash."""
    prefix, cost, salt22 = bcrypt_parse(hashed)
    salt = _bcrypt_b64decode(salt22)[:16]
    expect = bcrypt_hash(password, cost, salt, prefix=prefix)
    return _hmac.compare_digest(expect, hashed)
