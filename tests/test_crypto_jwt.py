"""RS/ES JWT bloblang methods (reference internal/impl/crypto/
jwt_sign.go:112-148, jwt_parse.go) over the pure-Python crypto primitives
(crypto_prims.py) — RFC 6979 published vectors, OpenSSL cross-validation
in both directions, and the Spark-side sign/parse round-trip."""

from __future__ import annotations

import base64
import json
import shutil
import subprocess

import pytest

from bento_spark.functions.bloblang import BloblangError, compile_expr
from bento_spark.functions.crypto_prims import (
    _CURVES,
    _ec_mul,
    ec_on_curve,
    ec_public_from_private,
    ecdsa_sign_jose,
    ecdsa_verify_jose,
    parse_ec_private,
    parse_rsa_private,
    parse_rsa_public,
    rsa_sign,
    rsa_verify,
)

_OPENSSL = shutil.which("openssl")


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------


def test_curve_constants_are_consistent():
    for name, cv in _CURVES.items():
        assert ec_on_curve(name, cv["gx"], cv["gy"]), name
        assert _ec_mul(cv, cv["n"], (cv["gx"], cv["gy"])) is None, name


def test_rfc6979_published_vector_p256():
    # RFC 6979 §A.2.5: P-256, SHA-256, message "sample"
    x = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721
    sig = ecdsa_sign_jose("P-256", x, b"sample", 256)
    r = int.from_bytes(sig[:32], "big")
    s = int.from_bytes(sig[32:], "big")
    assert r == 0xEFD48B2AACB6A8FD1140DD9CD45E81D69D2C877B56AAF991C34D0EA84EAF3716
    assert s == 0xF7CB1C942D657C41D436C7A1B6E29F65F3E900DBB9AFF4064DC4AB2F843ACDA8
    qx, qy = ec_public_from_private("P-256", x)
    assert ecdsa_verify_jose("P-256", qx, qy, b"sample", sig, 256)
    assert not ecdsa_verify_jose("P-256", qx, qy, b"other", sig, 256)


def test_p384_p521_sign_verify_roundtrip():
    for curve, hb in (("P-384", 384), ("P-521", 512)):
        d = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721
        qx, qy = ec_public_from_private(curve, d)
        assert ec_on_curve(curve, qx, qy)
        sig = ecdsa_sign_jose(curve, d, b"test", hb)
        # JOSE width: 2 * ceil(qlen/8) (96 for P-384, 132 for P-521)
        assert len(sig) == {384: 96, 512: 132}[hb]
        assert ecdsa_verify_jose(curve, qx, qy, b"test", sig, hb)
        assert not ecdsa_verify_jose(curve, qx, qy, b"TEST", sig, hb)
        # deterministic: same inputs -> same signature
        assert sig == ecdsa_sign_jose(curve, d, b"test", hb)


@pytest.mark.skipif(_OPENSSL is None, reason="openssl binary unavailable")
def test_openssl_cross_validation(tmp_path):
    msg = b"cross-validate me"
    (tmp_path / "msg.bin").write_bytes(msg)

    def run(*args):
        return subprocess.run(list(args), capture_output=True, text=True,
                              cwd=tmp_path, check=False)

    run(_OPENSSL, "genrsa", "-out", "rsa.pem", "2048")
    run(_OPENSSL, "rsa", "-in", "rsa.pem", "-pubout", "-out", "rsapub.pem")
    kp = parse_rsa_private((tmp_path / "rsa.pem").read_text())
    sig = rsa_sign(kp, msg, 256)
    (tmp_path / "sig.bin").write_bytes(sig)
    out = run(_OPENSSL, "dgst", "-sha256", "-verify", "rsapub.pem",
              "-signature", "sig.bin", "msg.bin")
    assert "Verified OK" in out.stdout
    # openssl-signed -> our verifier
    run(_OPENSSL, "dgst", "-sha512", "-sign", "rsa.pem", "-out", "sig2.bin", "msg.bin")
    kpub = parse_rsa_public((tmp_path / "rsapub.pem").read_text())
    assert rsa_verify(kpub, msg, (tmp_path / "sig2.bin").read_bytes(), 512)
    assert not rsa_verify(kpub, msg + b"!", (tmp_path / "sig2.bin").read_bytes(), 512)

    run(_OPENSSL, "ecparam", "-genkey", "-name", "prime256v1", "-noout",
        "-out", "ec.pem")
    run(_OPENSSL, "ec", "-in", "ec.pem", "-pubout", "-out", "ecpub.pem")
    ek = parse_ec_private((tmp_path / "ec.pem").read_text())
    jose = ecdsa_sign_jose("P-256", ek["d"], msg, 256)
    r = int.from_bytes(jose[:32], "big")
    s = int.from_bytes(jose[32:], "big")

    def derint(v: int) -> bytes:
        b = v.to_bytes((v.bit_length() + 8) // 8 or 1, "big")
        return bytes([2, len(b)]) + b

    body = derint(r) + derint(s)
    (tmp_path / "esig.bin").write_bytes(bytes([0x30, len(body)]) + body)
    out = run(_OPENSSL, "dgst", "-sha256", "-verify", "ecpub.pem",
              "-signature", "esig.bin", "msg.bin")
    assert "Verified OK" in out.stdout


# --------------------------------------------------------------------------
# Spark-side bloblang methods
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def keys(tmp_path_factory):
    if _OPENSSL is None:
        pytest.skip("openssl binary unavailable")
    d = tmp_path_factory.mktemp("jwtkeys")

    def run(*args):
        subprocess.run(list(args), capture_output=True, cwd=d, check=True)

    run(_OPENSSL, "genrsa", "-out", "rsa.pem", "2048")
    run(_OPENSSL, "rsa", "-in", "rsa.pem", "-pubout", "-out", "rsapub.pem")
    run(_OPENSSL, "ecparam", "-genkey", "-name", "prime256v1", "-noout",
        "-out", "ec256.pem")
    run(_OPENSSL, "ec", "-in", "ec256.pem", "-pubout", "-out", "ec256pub.pem")
    run(_OPENSSL, "ecparam", "-genkey", "-name", "secp384r1", "-noout",
        "-out", "ec384.pem")
    return d


def test_jwt_rs256_sign_and_parse(spark, keys):
    claims = '{"sub":"u1","n":7}'
    jdf = spark.createDataFrame([(claims,)], "claims string")
    tok = jdf.select(
        compile_expr(f'this.claims.sign_jwt_rs256(file("{keys}/rsa.pem"))').alias("t")
    ).first().t
    h, p, _s = tok.split(".")
    assert json.loads(base64.urlsafe_b64decode(h + "==")) == {"alg": "RS256", "typ": "JWT"}
    # parse with the PUBLIC pem; tampered token NULLs
    tdf = spark.createDataFrame([(tok,), (tok[:-3] + "xxx",)], "tok string")
    out = tdf.select(
        compile_expr(
            f'this.tok.parse_jwt_rs256(file("{keys}/rsapub.pem"), "sub string, n int")'
        ).alias("c")
    ).collect()
    assert out[0].c.sub == "u1" and out[0].c.n == 7
    assert out[1].c is None
    # parse with the PRIVATE pem also verifies (jwt_parse_test.go does this)
    ok = spark.createDataFrame([(tok,)], "tok string").select(
        compile_expr(
            f'this.tok.parse_jwt_rs256(file("{keys}/rsa.pem"), "sub string, n int")'
        ).alias("c")
    ).first()
    assert ok.c.n == 7
    # RS384 parser rejects an RS256 token (header alg pinned)
    wrong = spark.createDataFrame([(tok,)], "tok string").select(
        compile_expr(
            f'this.tok.parse_jwt_rs384(file("{keys}/rsapub.pem"), "sub string, n int")'
        ).alias("c")
    ).first()
    assert wrong.c is None


@pytest.mark.skipif(_OPENSSL is None, reason="openssl binary unavailable")
def test_jwt_rs256_token_verifies_under_openssl(spark, keys, tmp_path):
    claims = '{"scope":"x"}'
    tok = spark.createDataFrame([(claims,)], "claims string").select(
        compile_expr(f'this.claims.sign_jwt_rs256(file("{keys}/rsa.pem"))').alias("t")
    ).first().t
    h, p, s = tok.split(".")
    (tmp_path / "si.bin").write_bytes(f"{h}.{p}".encode())
    (tmp_path / "sig.bin").write_bytes(base64.urlsafe_b64decode(s + "=="))
    out = subprocess.run(
        [_OPENSSL, "dgst", "-sha256", "-verify", f"{keys}/rsapub.pem",
         "-signature", "sig.bin", "si.bin"],
        capture_output=True, text=True, cwd=tmp_path,
    )
    assert "Verified OK" in out.stdout


def test_jwt_es256_deterministic_and_roundtrip(spark, keys):
    claims = '{"sub":"u2"}'
    jdf = spark.createDataFrame([(claims,), (claims,)], "claims string")
    toks = [
        r.t for r in jdf.select(
            compile_expr(f'this.claims.sign_jwt_es256(file("{keys}/ec256.pem"))').alias("t")
        ).collect()
    ]
    # RFC 6979 nonces: identical rows -> identical tokens (replay identity)
    assert toks[0] == toks[1]
    out = spark.createDataFrame([(toks[0],)], "tok string").select(
        compile_expr(
            f'this.tok.parse_jwt_es256(file("{keys}/ec256pub.pem"), "sub string")'
        ).alias("c")
    ).first()
    assert out.c.sub == "u2"
    # signature is JOSE fixed-width r||s (64 bytes for P-256)
    assert len(base64.urlsafe_b64decode(toks[0].split(".")[2] + "==")) == 64


def test_jwt_es_curve_mismatch_raises(spark, keys):
    with pytest.raises(BloblangError, match="ES384 requires a P-384"):
        compile_expr(f'this.claims.sign_jwt_es384(file("{keys}/ec256.pem"))')
    # matching curve compiles
    compile_expr(f'this.claims.sign_jwt_es384(file("{keys}/ec384.pem"))')


def test_jwt_bad_pem_fails_at_compile(spark, keys):
    with pytest.raises(BloblangError, match="invalid PEM key"):
        compile_expr('this.claims.sign_jwt_rs256("not a pem")')


# --------------------------------------------------------------------------
# bcrypt
# --------------------------------------------------------------------------


def test_bcrypt_openbsd_vectors():
    from bento_spark.functions.crypto_prims import bcrypt_compare, bcrypt_hash

    # OpenBSD regress published vectors (cost 6)
    assert bcrypt_compare(
        b"", "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s.")
    assert bcrypt_compare(
        b"a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe")
    assert bcrypt_compare(
        b"abc", "$2a$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i")
    assert not bcrypt_compare(
        b"wrong", "$2a$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i")
    # hash() is the inverse of compare with the same salt
    h = bcrypt_hash(b"swordfish", 6, bytes(range(16)))
    assert h.startswith("$2b$06$") and bcrypt_compare(b"swordfish", h)
    with pytest.raises(ValueError, match="malformed"):
        bcrypt_compare(b"x", "$9z$06$nope")
    # x/crypto/bcrypt's ErrPasswordTooLong contract: >72 bytes raises
    # instead of silently truncating (a wrong long password whose first
    # 72 bytes match must not compare True)
    with pytest.raises(ValueError, match="72"):
        bcrypt_hash(b"p" * 73, 6, bytes(range(16)))
    with pytest.raises(ValueError, match="72"):
        bcrypt_compare(b"p" * 73, h)


def test_bcrypt_reference_docstring_example():
    """The hash from crypto/bcrypt.go's own Example block ($2y, cost 10 —
    the real-world default; takes seconds in pure Python by design)."""
    from bento_spark.functions.crypto_prims import bcrypt_compare

    h = "$2y$10$Dtnt5NNzVtMCOZONT705tOcS8It6krJX8bEjnDJnwxiFKsz1C.3Ay"
    assert bcrypt_compare(b"there-are-many-blobs-in-the-sea", h)
    assert not bcrypt_compare(b"will-i-ever-find-love", h)


def test_compare_bcrypt_bloblang_method(spark):
    h = "$2a$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i"
    df = spark.createDataFrame([("abc",), ("nope",), ("abc",)], "secret string")
    out = df.select(
        compile_expr(f'this.secret.compare_bcrypt("{h}")').alias("m")
    ).collect()
    assert [r.m for r in out] == [True, False, True]
    with pytest.raises(BloblangError, match="malformed"):
        compile_expr('this.secret.compare_bcrypt("not-a-hash")')


# --------------------------------------------------------------------------
# fake() (impl/lang/bloblang.go — the go-faker function set)
# --------------------------------------------------------------------------


def test_fake_function_kinds(spark):
    import re

    kinds = [
        "latitude", "longitude", "unix_time", "date", "time_string",
        "month_name", "year_string", "day_of_week", "day_of_month",
        "timestamp", "century", "timezone", "time_period", "email",
        "mac_address", "domain_name", "url", "username", "ipv4", "ipv6",
        "password", "jwt", "word", "sentence", "paragraph", "cc_type",
        "cc_number", "currency", "amount_with_currency", "title_male",
        "title_female", "first_name", "first_name_male", "first_name_female",
        "last_name", "name", "gender", "chinese_first_name",
        "chinese_last_name", "chinese_name", "phone_number",
        "toll_free_phone_number", "e164_phone_number", "uuid_hyphenated",
        "uuid_digit",
    ]
    rows = spark.range(40).select(
        *[compile_expr(f'fake("{k}")').alias(k) for k in kinds]
    ).collect()
    r = rows[0].asDict()
    assert -90 <= r["latitude"] <= 90 and -180 <= r["longitude"] <= 180
    assert re.fullmatch(r"[a-z]+\.[a-z]+\d*@(example|test)\.\w+", r["email"])
    assert re.fullmatch(r"(\d{1,3}\.){3}\d{1,3}", r["ipv4"])
    assert re.fullmatch(r"([0-9a-f]{4}:){7}[0-9a-f]{4}", r["ipv6"])
    assert re.fullmatch(r"([0-9a-f]{2}:){5}[0-9a-f]{2}", r["mac_address"])
    assert re.fullmatch(r"\d{16}", r["cc_number"])
    assert re.fullmatch(r"\+1\d{10}", r["e164_phone_number"])
    assert r["sentence"].endswith(".") and r["sentence"][0].isupper()
    assert len(r["uuid_digit"]) == 32 and "-" not in r["uuid_digit"]
    assert 0 <= r["unix_time"] < 1_700_000_000
    # per-row draws: uuids all distinct, wordlists actually vary
    assert len({row.uuid_hyphenated for row in rows}) == len(rows)
    assert len({row.word for row in rows}) > 1


def test_fake_unknown_kind_fails_compile(spark):
    with pytest.raises(BloblangError, match="unsupported kind"):
        compile_expr('fake("bogus_kind")')


def test_bcrypt_parse_is_cheap_format_check():
    import time as _t

    from bento_spark.functions.crypto_prims import bcrypt_parse

    t0 = _t.monotonic()
    # cost 14 would take minutes to COMPARE; parsing must be instant
    assert bcrypt_parse(
        "$2b$14$" + "a" * 22 + "b" * 31) == ("2b", 14, "a" * 22)
    assert _t.monotonic() - t0 < 0.1
    with pytest.raises(ValueError, match="malformed"):
        bcrypt_parse("$9$nope")
