"""Point-import hardening: SEC1 compressed import, subgroup order checks.

Reference behaviors matched:
  * aff_pt_y_from_x decompression (aff_pt.c:102), used for ECDH peer
    points (libecc_wycheproof.c:498 uncompress_ecc_point);
  * check_prj_pt_order subgroup check (prj_pt.c:1909) for h > 1 curves.
"""

import numpy as np
import pytest

from libecc_tpu.curves import params
from libecc_tpu.sig import keys as K
from libecc_tpu.ref import hostref


def test_sec1_compressed_roundtrip():
    c = params.get_curve("P-256")
    kb = K.keygen(c, "ECDSA", 4, priv_ints=[2, 3, 5, 0xABCDEF])
    comp = K.export_pub_sec1(kb, compressed=True)
    unc = K.export_pub_sec1(kb, compressed=False)
    nb = (c.fp_ctx.bits + 7) // 8
    assert all(len(b) == 1 + nb and b[0] in (2, 3) for b in comp)
    x0, y0, _ = kb.pub_affine_ints()
    for bufs in (comp, unc):
        kb2 = K.import_pub_sec1(c, "ECDSA", bufs)
        x2, y2, _ = kb2.pub_affine_ints()
        assert list(map(int, x0)) == list(map(int, x2))
        assert list(map(int, y0)) == list(map(int, y2))


def test_sec1_compressed_parity_flip():
    """02 vs 03 prefix selects the y parity."""
    c = params.get_curve("P-256")
    kb = K.keygen(c, "ECDSA", 1, priv_ints=[7])
    (buf,) = K.export_pub_sec1(kb, compressed=True)
    flipped = bytes([buf[0] ^ 1]) + buf[1:]
    y1 = int(K.import_pub_sec1(c, "ECDSA", [buf]).pub_affine_ints()[1][0])
    y2 = int(K.import_pub_sec1(c, "ECDSA",
                               [flipped]).pub_affine_ints()[1][0])
    p = c.fp_ctx.p_int
    assert (y1 + y2) % p == 0 and y1 != y2


def test_sec1_rejects_non_curve_x():
    """x with no curve point (rhs a non-residue) must fail decompression."""
    c = params.get_curve("P-256")
    p = c.fp_ctx.p_int
    x = 2
    while pow((pow(x, 3, p) + c.a * x + c.b) % p, (p - 1) // 2, p) == 1:
        x += 1
    nb = (c.fp_ctx.bits + 7) // 8
    with pytest.raises(ValueError):
        K.import_pub_sec1(c, "ECDSA", [b"\x02" + x.to_bytes(nb, "big")])


def _small_order_point(c):
    """A point T != O of order dividing h on an h > 1 curve (host ints)."""
    p = c.fp_ctx.p_int
    ref = hostref.WCurve(p, c.a, c.b, c.gx, c.gy, c.q, c.h)
    x = 2
    while True:
        rhs = (pow(x, 3, p) + c.a * x + c.b) % p
        if pow(rhs, (p - 1) // 2, p) in (0, 1):
            from libecc_tpu.curves.maps import _sqrt_p
            y = _sqrt_p(rhs, p)
            if y is not None:
                T = hostref.ec_mul(ref, c.q, (x, y))
                if T is not None:
                    return ref, T
        x += 1


def test_order_check_rejects_out_of_subgroup():
    """On WEI25519 (h = 8) a point with a small-order component must be
    rejected at import (check_prj_pt_order parity); a clean generator
    multiple imports fine."""
    c = params.get_curve("WEI25519")
    ref, T = _small_order_point(c)
    # bad = G + T: on curve, but q*bad = q*T != O
    bad = hostref.ec_add(ref, (c.gx, c.gy), T)
    assert bad is not None
    with pytest.raises(ValueError, match="subgroup"):
        K.pubkey_batch_from_affine_ints(c, "ECDSA", [bad[0]], [bad[1]])
    good = hostref.ec_mul(ref, 12345, (c.gx, c.gy))
    kb = K.pubkey_batch_from_affine_ints(c, "ECDSA", [good[0]], [good[1]])
    assert kb.n == 1
