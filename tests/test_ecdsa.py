"""End-to-end ECDSA tests: RFC 6979 known-answer vectors (bit-exact),
sign/verify roundtrips, negative cases, differential vs host oracle.

Reference test model: the ec_self_tests KAT cases with fixed-nonce
injection (src/tests/ec_self_tests_core.h:22-51) + `rand` property mode.
"""

import hashlib
import random

import numpy as np
import pytest

from libecc_tpu.curves import params
from libecc_tpu.sig import keys as K, ecdsa
from libecc_tpu.ref import hostref


@pytest.fixture(scope="module")
def p256():
    c = params.get_curve("P-256")
    rc = hostref.WCurve(p=c.fp_ctx.p_int, a=c.a, b=c.b, gx=c.gx, gy=c.gy, q=c.q)
    return c, rc


# RFC 6979 A.2.5 (P-256 / SHA-256) — public known-answer vectors.
RFC6979_X = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721
RFC6979_CASES = [
    (b"sample",
     0xEFD48B2AACB6A8FD1140DD9CD45E81D69D2C877B56AAF991C34D0EA84EAF3716,
     0xF7CB1C942D657C41D436C7A1B6E29F65F3E900DBB9AFF4064DC4AB2F843ACDA8),
    (b"test",
     0xF1ABB023518351CD71D881567B1EA663ED3EFCF6C5132B354F28D3B0B7D38367,
     0x019F4113742A2B14BD25926B49C649155F267E60D3814B4C0CC84250E46F0083),
]


def test_rfc6979_kat(p256):
    c, rc = p256
    kb = K.keygen(c, "ECDSA", 2, priv_ints=[RFC6979_X, RFC6979_X])
    msgs = [m for m, _, _ in RFC6979_CASES]
    sigs, ok = ecdsa.sign_batch(kb, msgs, "SHA256", deterministic=True)
    assert ok.all()
    for sig, (_, r_exp, s_exp) in zip(sigs, RFC6979_CASES):
        assert int.from_bytes(sig[:32], "big") == r_exp
        assert int.from_bytes(sig[32:], "big") == s_exp
    assert ecdsa.verify_batch(kb, msgs, sigs, "SHA256").all()


def test_sign_verify_roundtrip_and_negatives(p256):
    c, rc = p256
    r = random.Random(5)
    N = 4
    privs = [r.randrange(1, c.q) for _ in range(N)]
    kb = K.keygen(c, "ECDSA", N, priv_ints=privs)
    msgs = [bytes([i]) * (i + 1) for i in range(N)]
    nonces = [r.randrange(1, c.q) for _ in range(N)]
    sigs, ok = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces)
    assert ok.all()
    # differential vs host oracle
    for i in range(N):
        e = int.from_bytes(hashlib.sha256(msgs[i]).digest(), "big") % c.q
        rr, ss = hostref.ecdsa_sign_ref(rc, privs[i], e, nonces[i])
        assert sigs[i] == rr.to_bytes(32, "big") + ss.to_bytes(32, "big")
    assert ecdsa.verify_batch(kb, msgs, sigs, "SHA256").all()
    # corrupted signature, wrong message, wrong key must fail
    bad = bytes([sigs[0][0] ^ 1]) + sigs[0][1:]
    assert not ecdsa.verify_batch(kb, msgs, [bad] + sigs[1:], "SHA256")[0]
    assert not ecdsa.verify_batch(kb, [b"x" + m for m in msgs], sigs, "SHA256").any()
    kb2 = K.keygen(c, "ECDSA", N, priv_ints=[r.randrange(1, c.q) for _ in range(N)])
    assert not ecdsa.verify_batch(kb2, msgs, sigs, "SHA256").any()


def test_invalid_sig_ranges(p256):
    c, rc = p256
    kb = K.keygen(c, "ECDSA", 1, priv_ints=[RFC6979_X])
    msgs = [b"sample"]
    zero = (0).to_bytes(32, "big")
    one = (1).to_bytes(32, "big")
    qb = c.q.to_bytes(32, "big")
    # r = 0, s = 0, r = q, s = q must be rejected
    for sig in [zero + one, one + zero, qb + one, one + qb]:
        assert not ecdsa.verify_batch(kb, msgs, [sig], "SHA256").any()


def test_key_import_export(p256):
    c, rc = p256
    kb = K.keygen(c, "ECDSA", 2, priv_ints=[RFC6979_X, 12345])
    pubs = K.export_pub_raw(kb)
    privs = K.export_priv_raw(kb)
    kb2 = K.import_pub_raw(c, "ECDSA", pubs)
    x1, y1, _ = kb.pub_affine_ints()
    x2, y2, _ = kb2.pub_affine_ints()
    assert x1 == x2 and y1 == y2
    kb3 = K.import_priv_raw(c, "ECDSA", privs)
    assert kb3.priv_ints() == kb.priv_ints()
    x3, y3, _ = kb3.pub_affine_ints()
    assert x3 == x1 and y3 == y1
