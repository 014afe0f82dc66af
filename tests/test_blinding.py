"""SCA blinding countermeasures: identical outputs, randomized internals.

Reference: USE_SIG_BLINDING (common.mk:191-193) — scalar blinding m+b*q
(prj_pt.c:1782), projective-coordinate blinding (prj_pt.c:1266), masked
ECDSA finalize (ecdsa_common.c:466-531). Blinding must not change a
single output byte; it only randomizes intermediate representations.
"""

import numpy as np

from libecc_tpu.curves import params
from libecc_tpu.sig import ecdsa, keys as K


def test_blinded_sign_is_byte_identical():
    curve = params.get_curve("P-256")
    kb = K.keygen(curve, "ECDSA", 3,
                  priv_ints=[0xDEADBEEF, 0x1234567890, 0xFEDCBA])
    msgs = [b"blind me", b"mask me", b"hide me"]
    nonces = [0x1111, 0x22222222, 0x3333333333]
    plain, ok1 = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces)
    blind, ok2 = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces,
                                  blinding=True)
    assert ok1.all() and ok2.all()
    assert plain == blind, "blinding changed signature bytes"
    # two blinded runs also agree (fresh random b/lambda each time)
    blind2, _ = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces,
                                 blinding=True)
    assert blind == blind2
    assert ecdsa.verify_batch(kb, msgs, blind, "SHA256").all()


def _roundtrip(mod, name, curve_name="P-256", hash_name="SHA256", **kw):
    """blinded == plain bytes for one short-Weierstrass scheme."""
    from libecc_tpu.sig import keys as K2
    curve = params.get_curve(curve_name)
    kb = K2.keygen(curve, name, 2, priv_ints=[0xDEADBEEF, 0x1234567],
                   init_pub=getattr(mod, "init_pub", None))
    msgs = [b"blind me", b"mask me"]
    nonces = [0x1111, 0x22222222]
    sign = kw.pop("sign_fn", None) or mod.sign_batch
    verify = kw.pop("verify_fn", None) or mod.verify_batch
    plain, ok1 = sign(kb, msgs, hash_name, nonces=nonces, **kw)
    blind, ok2 = sign(kb, msgs, hash_name, nonces=nonces, blinding=True,
                      **kw)
    assert np.asarray(ok1).all() and np.asarray(ok2).all()
    assert plain == blind, f"{name}: blinding changed signature bytes"
    assert np.asarray(verify(kb, msgs, blind, hash_name)).all()


def test_blinded_all_weierstrass_schemes():
    """Every scheme's blinded sign is byte-identical to plain — the
    library-wide USE_SIG_BLINDING scope (common.mk:191-193 applies the
    flag to ecdsa/eckcdsa/ecsdsa/ecosdsa/ecfsdsa/ecgdsa/ecrdsa/sm2/bign/
    bip0340 alike)."""
    from libecc_tpu.sig import (ecgdsa, eckcdsa, ecsdsa, ecfsdsa, ecrdsa,
                                sm2, bign, bip0340)
    _roundtrip(ecgdsa, "ECGDSA")
    _roundtrip(eckcdsa, "ECKCDSA")
    _roundtrip(ecsdsa, "ECSDSA")
    _roundtrip(ecsdsa, "ECOSDSA", sign_fn=ecsdsa.sign_batch_osdsa,
               verify_fn=ecsdsa.verify_batch_osdsa)
    _roundtrip(ecfsdsa, "ECFSDSA")
    _roundtrip(ecrdsa, "ECRDSA")
    _roundtrip(sm2, "SM2", curve_name="SM2P256V1", hash_name="SM3")
    _roundtrip(bign, "BIGN", curve_name="BIGN256V1",
               hash_name="BELT_HASH")
    _roundtrip(bign, "DBIGN", curve_name="BIGN256V1",
               hash_name="BELT_HASH", sign_fn=bign.sign_batch_dbign,
               verify_fn=bign.verify_batch_dbign)
    _roundtrip(bip0340, "BIP0340")


def test_blinded_eddsa_byte_identical():
    from libecc_tpu.sig import eddsa
    seeds = [bytes([i]) * 32 for i in (5, 6)]
    kb = eddsa.EdDSAKeyBatch("ed25519", seeds)
    msgs = [b"ed blind", b"ed mask"]
    plain = eddsa.sign_batch(kb, msgs)
    blind = eddsa.sign_batch(kb, msgs, blinding=True)
    assert plain == blind, "eddsa: blinding changed signature bytes"
    acc = eddsa.verify_batch("ed25519", kb.pub_bytes, msgs, blind)
    assert np.asarray(acc).all()


def test_blinded_keygen_matches():
    curve = params.get_curve("P-256")
    privs = [0xABCDEF0123456789, 7]
    kb1 = K.keygen(curve, "ECDSA", 2, priv_ints=privs)
    kb2 = K.keygen(curve, "ECDSA", 2, priv_ints=privs, blinding=True)
    x1, y1, _ = kb1.pub_affine_ints()
    x2, y2, _ = kb2.pub_affine_ints()
    assert list(x1) == list(x2) and list(y1) == list(y2)
