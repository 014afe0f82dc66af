"""Legacy / examples-tier hash family (MD2/MD4/MD5/SHA-0/SHA-1/MDC2/
GOST R 34.11-94) vs oracle vectors dumped from the compiled reference
example code (src/examples/hash/*.c; regenerate with
`make -C scripts/oracle legacy`)."""

import hashlib
import json
import os

import pytest

from libecc_tpu.hash.registry import get_hash
from libecc_tpu.extras.legacy_hash import des_encrypt_block

# nightly tier (legacy hash battery); smoke skips, LIBECC_TPU_FULL=1 runs
# Tier note: whole-file slow marks left every subsystem out of the
# default run (round-4 verdict); now only the expensive cases are
# nightly-tier, and one cheap representative per subsystem stays
# in the default (smoke) tier.

VEC = os.path.join(os.path.dirname(__file__), "vectors",
                   "legacy_hash_kats.jsonl")
LENS = [0, 3, 55, 56, 64, 65, 137, 1000]


def _msg(length):
    if length == 0:
        return b""
    if length == 3:
        return b"abc"
    i = LENS.index(length)
    return bytes((j * 7 + i * 31) & 0xFF for j in range(length))


def _kats():
    with open(VEC) as f:
        return [json.loads(line) for line in f]


@pytest.mark.parametrize("kat", _kats(),
                         ids=lambda k: f"{k['alg']}-{k['len']}")
def test_legacy_kat(kat):
    alg = get_hash(kat["alg"])
    assert alg.digest_size == kat["digest_size"]
    assert alg.hash(_msg(kat["len"])).hex() == kat["digest"]


def test_des_fips_vector():
    # classic FIPS 46 walkthrough vector
    assert des_encrypt_block(bytes.fromhex("133457799BBCDFF1"),
                             bytes.fromhex("0123456789ABCDEF")) == \
        bytes.fromhex("85E813540F0AB405")


def test_md5_sha1_vs_hashlib():
    for n in (0, 1, 63, 64, 65, 200, 1017):
        m = bytes((i * 13 + 5) & 0xFF for i in range(n))
        assert get_hash("MD5").hash(m) == hashlib.md5(m).digest()
        assert get_hash("SHA1").hash(m) == hashlib.sha1(m).digest()


def test_streaming_chunked():
    import random
    r = random.Random(3)
    m = bytes(r.randrange(256) for _ in range(513))
    for name in ("MD2", "MD4", "MD5", "SHA0", "SHA1", "MDC2_PAD1",
                 "MDC2_PAD2", "GOST34_11_94_NORM", "GOST34_11_94_RFC4357"):
        alg = get_hash(name)
        st = alg.new()
        i = 0
        while i < len(m):
            step = r.randrange(1, 60)
            st.update(m[i:i + step])
            i += step
        assert st.digest() == alg.hash(m), name


def test_aliases():
    assert get_hash("MDC2").name == "MDC2_PAD1"
    assert get_hash("GOSTR34-11-94").name == "GOST34_11_94_NORM"
    assert get_hash("SHA-1").name == "SHA1"


def test_hmac_over_legacy():
    """HMAC must be generic over any registered hash (reference hmac.c is
    generic over hash_mapping) — RFC 2202 test case 1 for HMAC-MD5/SHA1."""
    from libecc_tpu.hash.hmac import hmac
    key = b"\x0b" * 16
    assert hmac(key, b"Hi There", "MD5").hex() == \
        "9294727a3638bb1c13f48ef8158bfc9d"
    key = b"\x0b" * 20
    assert hmac(key, b"Hi There", "SHA1").hex() == \
        "b617318655057264e28bc0b6fb378c8ef146be00"


@pytest.mark.slow
def test_rsa_pkcs1_v15_legacy_digests():
    """PKCS#1 v1.5 with MD5/SHA-1 DigestInfo — the X.509-compat use case
    the reference keeps these digests for (examples/hash/hash.c)."""
    from libecc_tpu.extras import rsa
    kp = rsa.keygen(1024)
    msgs = [b"legacy pkcs1", b"x509 compat"]
    for h in ("MD5", "SHA1", "MD2"):
        sigs = rsa.sign_pkcs1_v15_batch(kp, msgs, hash_name=h)
        assert list(rsa.verify_pkcs1_v15_batch(kp, msgs, sigs,
                                               hash_name=h)) == [True, True]
        bad = bytes(sigs[0])
        bad = bad[:-1] + bytes([bad[-1] ^ 1])
        assert list(rsa.verify_pkcs1_v15_batch(kp, msgs[:1], [bad],
                                               hash_name=h)) == [False]
