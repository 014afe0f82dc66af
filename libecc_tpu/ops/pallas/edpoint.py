"""Fused Pallas TPU kernels for twisted-Edwards extended-coordinate ops.

Same design as point.py (short-Weierstrass): one kernel = one whole
unified formula (HWCD08), intermediates in VMEM, coords as uint32[K, N]
relaxed Montgomery limb tensors in (K, 8, 128) tiles. Reference math:
curves/edwards.py point_add / point_dbl (add-2008-hwcd-3 for a = -1,
add-2008-hwcd generic; dbl-2008-hwcd). The reference C library reaches
Edwards curves through the Weierstrass isogeny (src/sig/eddsa.c); we run
native extended coordinates, so these kernels are the EdDSA hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...nn import core as nn
from .mont import SUBLANES, LANES, BLOCK, MAX_PALLAS_LIMBS, _interp
from .point import _make_ops, _row_scratch, _use_rows


def _consts(curve):
    ctx = curve.fp_ctx
    k = ctx.k
    p = ctx.p_int

    def mont_limbs(v):
        return tuple(int(x) for x in nn.to_limbs(v % p * ctx.R % p, k))

    return dict(
        k=k,
        p=tuple(int(x) for x in ctx.p),
        pinv=tuple(int(x) for x in ctx.pinv_full),
        sub_kc=int(ctx.sub_kc),
        sub_cc=int(ctx.sub_cc),
        sub_c0=tuple(int(x) for x in ctx.sub_c0),
        a_is_m1=bool(curve.a_is_m1),
        a_is_1=(curve.a % p) == 1,
        A=mont_limbs(curve.a),
        D=mont_limbs(curve.d),
        D2=mont_limbs(2 * curve.d),
    )


def _add_body(ops, X1, Y1, Z1, T1, X2, Y2, Z2, T2):
    C = ops.C
    mul, mc, ad, sb = ops.mul, ops.mc, ops.ad, ops.sb
    if C["a_is_m1"]:
        A = mul(sb(Y1, X1), sb(Y2, X2))
        B = mul(ad(Y1, X1), ad(Y2, X2))
        Cm = mc(mul(T1, T2), C["D2"])
        Dm = mul(Z1, Z2)
        Dm = ad(Dm, Dm)
        E = sb(B, A)
        F = sb(Dm, Cm)
        G = ad(Dm, Cm)
        H = ad(B, A)
        return mul(E, F), mul(G, H), mul(F, G), mul(E, H)
    A = mul(X1, X2)
    B = mul(Y1, Y2)
    Cm = mc(mul(T1, T2), C["D"])
    Dm = mul(Z1, Z2)
    E0 = mul(ad(X1, Y1), ad(X2, Y2))
    E = sb(sb(E0, A), B)
    F = sb(Dm, Cm)
    G = ad(Dm, Cm)
    H = sb(B, A) if C["a_is_1"] else sb(B, mc(A, C["A"]))
    return mul(E, F), mul(G, H), mul(F, G), mul(E, H)


def _dbl_body(ops, X1, Y1, Z1):
    C = ops.C
    mul, mc, ad, sb = ops.mul, ops.mc, ops.ad, ops.sb
    sqr = getattr(ops, "sqr", None) or (lambda a: mul(a, a))
    A = sqr(X1)
    B = sqr(Y1)
    Cs = sqr(Z1)
    xy = ad(X1, Y1)
    E0 = sqr(xy)
    D = A if C["a_is_1"] else mc(A, C["A"])
    E = sb(sb(E0, A), B)
    G = ad(D, B)
    F = sb(G, ad(Cs, Cs))
    H = sb(D, B)
    return mul(E, F), mul(G, H), mul(F, G), mul(E, H)


def _pallas_call(kern, k, n_in, coords, rows):
    n = coords[0].shape[-1]
    g = n // BLOCK
    spec = pl.BlockSpec((k, SUBLANES, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    args = [c.reshape(k, n // LANES, LANES) for c in coords]
    sds = jax.ShapeDtypeStruct((k, n // LANES, LANES), jnp.uint32)
    outs = pl.pallas_call(
        kern, grid=(g,),
        in_specs=[spec] * n_in, out_specs=(spec,) * 4,
        out_shape=(sds,) * 4,
        scratch_shapes=_row_scratch(k) if rows else [],
        interpret=_interp(),
    )(*args)
    return tuple(o.reshape(k, n) for o in outs)


@functools.lru_cache(maxsize=None)
def _build_add(curve_key, k):
    from ...curves import edwards as edc
    C = _consts(edc.get_edwards_curve(curve_key))

    def kern(x1, y1, z1, t1, x2, y2, z2, t2, ox, oy, oz, ot, *scratch):
        o = _make_ops(C, scratch)
        X3, Y3, Z3, T3 = _add_body(
            o, o.read(x1), o.read(y1), o.read(z1), o.read(t1),
            o.read(x2), o.read(y2), o.read(z2), o.read(t2))
        o.write(ox, X3); o.write(oy, Y3); o.write(oz, Z3); o.write(ot, T3)

    rows = _use_rows(k)
    return lambda coords: _pallas_call(kern, k, 8, coords, rows)


@functools.lru_cache(maxsize=None)
def _build_dbl(curve_key, k):
    from ...curves import edwards as edc
    C = _consts(edc.get_edwards_curve(curve_key))

    def kern(x1, y1, z1, ox, oy, oz, ot, *scratch):
        o = _make_ops(C, scratch)
        X3, Y3, Z3, T3 = _dbl_body(o, o.read(x1), o.read(y1), o.read(z1))
        o.write(ox, X3); o.write(oy, Y3); o.write(oz, Z3); o.write(ot, T3)

    rows = _use_rows(k)
    return lambda coords: _pallas_call(kern, k, 3, coords, rows)


@functools.lru_cache(maxsize=None)
def _build_dbln_add(curve_key, k, ndbl):
    from ...curves import edwards as edc
    C = _consts(edc.get_edwards_curve(curve_key))

    def kern(x1, y1, z1, t1, x2, y2, z2, t2, ox, oy, oz, ot, *scratch):
        o = _make_ops(C, scratch)
        X, Y, Z, T = o.read(x1), o.read(y1), o.read(z1), o.read(t1)
        for _ in range(ndbl):
            X, Y, Z, T = _dbl_body(o, X, Y, Z)
        X3, Y3, Z3, T3 = _add_body(
            o, X, Y, Z, T, o.read(x2), o.read(y2), o.read(z2), o.read(t2))
        o.write(ox, X3); o.write(oy, Y3); o.write(oz, Z3); o.write(ot, T3)

    rows = _use_rows(k)
    return lambda coords: _pallas_call(kern, k, 8, coords, rows)


def supported(curve, P) -> bool:
    # tile kernels implement the 15-bit sequence only; rows handles both
    return (P.x.ndim == 2 and P.x.shape[-1] % BLOCK == 0
            and (nn.LIMB_BITS == 15 or _use_rows(curve.fp_ctx.k))
            and curve.fp_ctx.k <= MAX_PALLAS_LIMBS
            and getattr(curve.fp_ctx, "relaxed_ok", False))


def point_add(curve, P, Q):
    call = _build_add(curve.name, curve.fp_ctx.k)
    x, y, z, t = call((P.x, P.y, P.z, P.t, Q.x, Q.y, Q.z, Q.t))
    return type(P)(x, y, z, t)


def point_dbl(curve, P):
    call = _build_dbl(curve.name, curve.fp_ctx.k)
    x, y, z, t = call((P.x, P.y, P.z))
    return type(P)(x, y, z, t)


def point_dbln_add(curve, P, Q, ndbl: int):
    call = _build_dbln_add(curve.name, curve.fp_ctx.k, ndbl)
    x, y, z, t = call((P.x, P.y, P.z, P.t, Q.x, Q.y, Q.z, Q.t))
    return type(P)(x, y, z, t)
