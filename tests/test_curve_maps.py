"""Cross-model validation through the curve transport maps.

Validates the native Edwards/Montgomery engines against the Weierstrass
engine through the maps in curves/maps.py — the cross-check the reference
gets for free from its isogeny strategy (all EdDSA/X25519 math transits
WEI25519/WEI448; aff_pt_montgomery.c:294-495, aff_pt_edwards.c:308-855,
eddsa.c:330-568 for the Ed448 4-isogeny).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from libecc_tpu.curves import params, maps, scalar_mul
from libecc_tpu.curves.montgomery import get_montgomery_curve
from libecc_tpu.curves.edwards import get_edwards_curve
from libecc_tpu.curves.shortw import to_affine_plain
from libecc_tpu.sig import wcore, eddsa
from libecc_tpu.ref import hostref
from libecc_tpu.nn import core as nn

# nightly tier (cross-model transport sweeps); smoke skips, LIBECC_TPU_FULL=1 runs
# Tier note: whole-file slow marks left every subsystem out of the
# default run (round-4 verdict); now only the expensive cases are
# nightly-tier, and one cheap representative per subsystem stays
# in the default (smoke) tier.

FAMILIES = [("CURVE25519", "ED25519", "WEI25519"),
            ("CURVE448", "ED448", "WEI448")]


@pytest.mark.parametrize("mname,ename,wname", FAMILIES)
def test_curve_level_maps(mname, ename, wname):
    m = get_montgomery_curve(mname)
    e = get_edwards_curve(ename)
    w = params.get_curve(wname)
    p = w.fp_ctx.p_int
    # montgomery <-> shortw curve consistency + generator transport
    assert maps.check_montgomery_shortw(m, w)
    x, y = maps.aff_montgomery_to_shortw(m.gu, m.gv, m.A, m.B, p)
    assert (x, y) == (w.gx, w.gy)
    u, v = maps.aff_shortw_to_montgomery(w.gx, w.gy, m.A, m.B, p)
    assert (u, v) == (m.gu, m.gv)
    # edwards wire generator -> shortw generator (birational for 25519,
    # 4-isogeny for 448 — both must land exactly on the W generator)
    pt = maps.edwards_wire_to_shortw(e.gx, e.gy, e, w)
    assert pt == (w.gx, w.gy)


@pytest.mark.slow
def test_ed25519_birational_roundtrip():
    e = get_edwards_curve("ED25519")
    w = params.get_curve("WEI25519")
    assert maps.check_edwards_shortw(e, w)
    pt = maps.aff_edwards_to_shortw(e.gx, e.gy, e, w)
    back = maps.aff_shortw_to_edwards(pt[0], pt[1], e, w)
    assert back == (e.gx, e.gy)


@pytest.mark.slow
def test_ed448_isogeny_roundtrip_is_mul4():
    """phi_dual(phi(P)) = 4P (degree-4 isogeny; eddsa.c:833-837)."""
    e = get_edwards_curve("ED448")
    w = params.get_curve("WEI448")
    p = w.fp_ctx.p_int
    X, Y = maps.ed448_isogeny(e.gx, e.gy, w.alpha_edwards, p)
    x4, y4 = maps.ed448_isogeny_inv(X, Y, w.alpha_edwards, p)
    # compute 4*G on Ed448 with an independent host implementation
    ec = hostref.EdCurve(p=p, a=e.a % p, d=e.d % p, gx=e.gx, gy=e.gy,
                         q=e.q, h=e.h)
    G4 = hostref.ed_mul(ec, 4, (e.gx, e.gy))
    assert (x4, y4) == G4


@pytest.mark.parametrize("mname,ename,wname", FAMILIES)
@pytest.mark.slow
def test_scalar_mult_cross_model(mname, ename, wname):
    """k*G computed natively on the Edwards engine == k*G computed on the
    Weierstrass engine, transported through the maps. Exercises two
    independent device compute paths + the map layer."""
    e = get_edwards_curve(ename)
    w = params.get_curve(wname)
    p = w.fp_ctx.p_int
    ks = [5, 0x1234567890ABCDEF,
          0x0102030405060708090A0B0C0D0E0F1011121314151617]
    # Weierstrass side: device fixed-base mul on the transport curve
    k_dev = jnp.asarray(nn.batch_to_limbs([k % w.q for k in ks], w.q_ctx.k))
    wx, wy, inf = wcore.kg_affine(w, k_dev)
    wx_i, wy_i = wcore.scalars_host(wx), wcore.scalars_host(wy)
    # Edwards side: device scalar mult (the EdDSA pipeline's kernel),
    # y + sign(x) output; recover x via edwards_x_from_y
    nbits = max(k.bit_length() for k in ks) + 1
    ay, asign = eddsa.sign_mul_core(
        e, jnp.asarray(nn.batch_to_limbs(ks, e.q_ctx.k)), nbits)
    ys = nn.batch_from_limbs(np.asarray(ay))
    signs = np.asarray(asign)
    for i, k in enumerate(ks):
        # transport the Weierstrass result into Edwards wire coordinates
        wire = maps.shortw_to_edwards_wire(wx_i[i], wy_i[i], e, w)
        if ename == "ED448":
            # dual-isogeny direction multiplies by 4: compare against the
            # native Edwards result for scalar 4k instead
            ay4, asign4 = eddsa.sign_mul_core(
                e, jnp.asarray(nn.batch_to_limbs([4 * k], e.q_ctx.k)),
                nbits + 2)
            y_native = nn.batch_from_limbs(np.asarray(ay4))[0]
            s_native = int(np.asarray(asign4)[0])
        else:
            y_native = ys[i]
            s_native = int(signs[i])
        assert wire[1] == y_native, f"k={k}: y mismatch across models"
        assert wire[0] % 2 == s_native, f"k={k}: x parity mismatch"
        # and the forward direction: native Edwards point -> W engine point
        xx = maps.edwards_x_from_y(y_native, e.a, e.d, p)
        assert xx is not None
        x_native = xx[0] if xx[0] % 2 == s_native else xx[1]
        if ename == "ED448":
            pt = maps.edwards_wire_to_shortw(x_native, y_native, e, w)
            wc = hostref.WCurve(p, w.a, w.b, w.gx, w.gy, w.q)
            assert pt == hostref.ec_mul(wc, 4 * k, (w.gx, w.gy))
        else:
            pt = maps.edwards_wire_to_shortw(x_native, y_native, e, w)
            assert pt == (wx_i[i], wy_i[i])


@pytest.mark.slow
def test_x25519_matches_weierstrass_transport():
    """X25519(k, base) == u-coordinate of the clamped-scalar multiple
    computed on the WEI25519 Weierstrass engine and mapped back
    (the reference's actual X25519 implementation route,
    x25519_448.c:146-280)."""
    from libecc_tpu.ecdh import x25519 as xdh
    m = get_montgomery_curve("CURVE25519")
    w = params.get_curve("WEI25519")
    p = w.fp_ctx.p_int
    k_bytes = bytes(range(1, 33))
    out = xdh.x25519(k_bytes, (9).to_bytes(32, "little"))
    # clamp per RFC 7748
    kb = bytearray(k_bytes)
    kb[0] &= 248
    kb[31] &= 127
    kb[31] |= 64
    k = int.from_bytes(bytes(kb), "little")
    k_dev = jnp.asarray(nn.batch_to_limbs([k % w.q], w.q_ctx.k))
    wx, wy, _ = wcore.kg_affine(w, k_dev)
    u, v = maps.aff_shortw_to_montgomery(
        wcore.scalars_host(wx)[0], wcore.scalars_host(wy)[0], m.A, m.B, p)
    assert out == u.to_bytes(32, "little")


@pytest.mark.slow
def test_v_from_u_and_coordinate_recovery():
    m = get_montgomery_curve("CURVE25519")
    p = m.fp_ctx.p_int
    vs = maps.montgomery_v_from_u(m.gu, m.A, m.B, p)
    assert vs is not None and m.gv in vs
    e = get_edwards_curve("ED25519")
    ys = maps.edwards_y_from_x(e.gx, e.a, e.d, p)
    assert ys is not None and e.gy in ys
    xs = maps.edwards_x_from_y(e.gy, e.a, e.d, p)
    assert xs is not None and e.gx in xs
    # twist u (no v exists): u=2 is on the twist of curve25519
    assert maps.montgomery_v_from_u(2, m.A, m.B, p) is None
