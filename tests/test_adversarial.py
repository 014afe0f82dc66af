"""Wycheproof-style adversarial cases (the reference ships Google's
Wycheproof vectors, src/wycheproof_tests/; the vector blob is not
redistributable here, so the same attack classes are generated directly):

  ECDSA:  r/s = 0, r/s = q, r/s > q, truncated/overlong signatures,
          off-curve and out-of-range public keys, signature for the
          wrong message/key, high-s malleability behavior.
  EdDSA:  S >= q, non-canonical point encodings (y >= p), bit-flipped
          R/A, wrong-length inputs.
  X25519: small-order u (0, 1), non-canonical u >= p, all-zero secret
          handling.
"""

import numpy as np
import pytest

from libecc_tpu.curves import params
from libecc_tpu.sig import ecdsa, eddsa, keys as K


@pytest.fixture(scope="module")
def p256_setup():
    curve = params.get_curve("P-256")
    kb = K.keygen(curve, "ECDSA", 2, priv_ints=[0x1234, 0x5678])
    msgs = [b"wycheproof style", b"second message"]
    sigs, ok = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=[111, 222])
    assert ok.all()
    return curve, kb, msgs, sigs


def test_ecdsa_rs_range(p256_setup):
    curve, kb, msgs, sigs = p256_setup
    q = curve.q
    nb = 32

    def sig_of(r, s):
        return r.to_bytes(nb, "big") + s.to_bytes(nb, "big")

    r0 = int.from_bytes(sigs[0][:nb], "big")
    s0 = int.from_bytes(sigs[0][nb:], "big")
    bad = [sig_of(0, s0), sig_of(r0, 0), sig_of(q, s0), sig_of(r0, q),
           sig_of(q + r0 if q + r0 < (1 << 256) else q - 1, s0),
           sig_of(r0, q + 1)]
    for b in bad:
        acc = ecdsa.verify_batch(kb, [msgs[0]] * 2, [b, b], "SHA256")
        assert not acc.any(), b.hex()[:32]
    # the genuine signature still verifies after all that
    assert ecdsa.verify_batch(kb, msgs, sigs, "SHA256").all()


def test_ecdsa_sig_lengths(p256_setup):
    curve, kb, msgs, sigs = p256_setup
    with pytest.raises(ValueError):
        ecdsa.verify_batch(kb, msgs, [sigs[0][:-1], sigs[1]], "SHA256")
    with pytest.raises(ValueError):
        ecdsa.verify_batch(kb, msgs, [sigs[0] + b"\x00", sigs[1]], "SHA256")


def test_ecdsa_cross_key_and_message(p256_setup):
    curve, kb, msgs, sigs = p256_setup
    # swap signatures between lanes -> both reject (different keys/msgs)
    acc = ecdsa.verify_batch(kb, msgs, [sigs[1], sigs[0]], "SHA256")
    assert not acc.any()
    # wrong hash algorithm
    acc = ecdsa.verify_batch(kb, msgs, sigs, "SHA3_256")
    assert not acc.any()


def test_ecdsa_negated_s_is_valid_by_design(p256_setup):
    """ECDSA accepts (r, q-s) — malleability is inherent to the scheme;
    both the reference and this implementation accept it."""
    curve, kb, msgs, sigs = p256_setup
    q = curve.q
    nb = 32
    r0 = int.from_bytes(sigs[0][:nb], "big")
    s0 = int.from_bytes(sigs[0][nb:], "big")
    neg = r0.to_bytes(nb, "big") + (q - s0).to_bytes(nb, "big")
    acc = ecdsa.verify_batch(kb, [msgs[0], msgs[1]], [neg, sigs[1]],
                             "SHA256")
    assert acc.all()


def test_pubkey_import_validation():
    curve = params.get_curve("P-256")
    p = curve.fp_ctx.p_int
    with pytest.raises(ValueError):
        K.pubkey_batch_from_affine_ints(curve, "ECDSA", [5], [7])
    with pytest.raises(ValueError):
        K.pubkey_batch_from_affine_ints(curve, "ECDSA", [p], [0])
    with pytest.raises(ValueError):
        K.import_pub_raw(curve, "ECDSA", [b"\x01" * 64])


def test_eddsa_noncanonical_and_ranges():
    seeds = [bytes([7]) * 32]
    kb = eddsa.EdDSAKeyBatch("ed25519", seeds)
    msg = [b"adversarial"]
    sigs = eddsa.sign_batch(kb, msg, "ed25519")
    assert eddsa.verify_batch("ed25519", kb.pub_bytes, msg, sigs).all()
    q = 2 ** 252 + 27742317777372353535851937790883648493
    R, S = sigs[0][:32], sigs[0][32:]
    # S >= q
    bad_s = R + q.to_bytes(32, "little")
    assert not eddsa.verify_batch("ed25519", kb.pub_bytes, msg,
                                  [bad_s]).any()
    # S = S + q (still < 2^256): must be rejected (non-canonical scalar)
    s_int = int.from_bytes(S, "little")
    if s_int + q < (1 << 256):
        bad_s2 = R + (s_int + q).to_bytes(32, "little")
        assert not eddsa.verify_batch("ed25519", kb.pub_bytes, msg,
                                      [bad_s2]).any()
    # non-canonical A (y >= p, encodes a value in [p, 2^255))
    p = 2 ** 255 - 19
    bad_a = (p + 1).to_bytes(32, "little")
    assert not eddsa.verify_batch("ed25519", [bad_a], msg, sigs).any()
    # flipped R bit
    bad_r = bytes([R[0] ^ 1]) + R[1:] + S
    assert not eddsa.verify_batch("ed25519", kb.pub_bytes, msg,
                                  [bad_r]).any()
    # wrong lengths
    assert not eddsa.verify_batch("ed25519", kb.pub_bytes, msg,
                                  [sigs[0][:-1]]).any()
    assert not eddsa.verify_batch("ed25519", [kb.pub_bytes[0][:-1]], msg,
                                  sigs).any()


def test_x25519_edge_inputs():
    from libecc_tpu.ecdh import x25519 as xmod
    k = bytes(range(32))
    # small-order u = 0 -> zero shared secret; RFC 7748 allows rejecting;
    # the reference REJECTS low-order inputs (x25519_448.h:28-32 twist
    # rejection + order checks). Ours must reject too (error or zero).
    for u_bad in (bytes(32), (1).to_bytes(32, "little")):
        try:
            out = xmod.x25519_batch([k], [u_bad])
            assert not any(o and any(o) for o in out), "low-order accepted"
        except (ValueError, AssertionError):
            pass
    # non-canonical u (u >= p): plain RFC 7748 (strict=False) masks the
    # top bit and reduces — output matches the reduced input's; the
    # reference-parity strict mode additionally REJECTS the lane
    # (x25519_448.h:28-32 "non canonical u" clause)
    p = 2 ** 255 - 19
    u1 = (p + 5).to_bytes(32, "little")
    u2 = (5).to_bytes(32, "little")
    o1, ok1 = xmod.x25519_batch([k], [u1], strict=False)
    o2, ok2 = xmod.x25519_batch([k], [u2], strict=False)
    assert o1 == o2 and list(ok1) == list(ok2)
    _, ok_strict = xmod.x25519_batch([k], [u1])
    assert not ok_strict.any(), "strict mode accepted non-canonical u"


def test_x25519_twist_rejection():
    """Strict (reference-parity) mode rejects u on the quadratic twist
    (x25519_448.h:28-32); plain RFC mode computes on the twist. A twist
    u is found by Legendre search: u such that u^3 + A u^2 + u is a
    non-residue mod p."""
    from libecc_tpu.ecdh import x25519 as xmod
    p = 2 ** 255 - 19
    A = 486662
    u = 2
    while pow((u * u * u + A * u * u + u) % p, (p - 1) // 2, p) == 1:
        u += 1
    k = bytes(range(32))
    ub = u.to_bytes(32, "little")
    out, ok = xmod.x25519_batch([k], [ub])
    assert not ok.any(), "strict mode accepted on-twist u"
    out2, ok2 = xmod.x25519_batch([k], [ub], strict=False)
    assert ok2.all() and any(out2[0]), "RFC mode must compute on twist"
    # on-curve u (the base point) accepted in both modes
    u9 = (9).to_bytes(32, "little")
    _, okc = xmod.x25519_batch([k], [u9])
    assert okc.all()
