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


def test_blinded_keygen_matches():
    curve = params.get_curve("P-256")
    privs = [0xABCDEF0123456789, 7]
    kb1 = K.keygen(curve, "ECDSA", 2, priv_ints=privs)
    kb2 = K.keygen(curve, "ECDSA", 2, priv_ints=privs, blinding=True)
    x1, y1, _ = kb1.pub_affine_ints()
    x2, y2, _ = kb2.pub_affine_ints()
    assert list(x1) == list(x2) and list(y1) == list(y2)
