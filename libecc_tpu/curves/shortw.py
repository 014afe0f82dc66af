"""Short-Weierstrass curves: batched projective point ops (complete formulas).

TPU-native analog of the reference curve core (src/curves/ec_shortw.c,
src/curves/prj_pt.c). Points are homogeneous projective (X:Y:Z) with each
coordinate a Montgomery-domain limb tensor uint32[K, *batch]; infinity is
(0:1:0). Addition/doubling use the Renes-Costello-Batina complete formulas
(the reference's default, prj_pt.c:884-1072): branch-free and total on the
curve group, which is exactly what a lane-batched SIMD evaluation needs —
no per-lane special cases.

Specialized formula sets are selected at trace time from the curve constants
(a = -3 and a = 0 fast paths), mirroring how the reference specializes at
compile time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..fp import field as fp
from ..fp.field import FpCtx
from ..nn import core as nn


class PrjPoint(NamedTuple):
    """Batch of projective points; coords in Montgomery form, uint32[K, *b]."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


@dataclass
class ShortWCurve:
    """Curve object: y^2 z = x^3 + a x z^2 + b z^3 over GF(p).

    Host-side constants; device ops close over it at trace time
    (reference: ec_shortw_crv with precomputed a_monty/b3_monty,
    src/curves/ec_shortw.h:25-36).
    """
    name: str
    fp_ctx: FpCtx
    a: int
    b: int
    gx: int
    gy: int
    q: int            # generator order
    h: int = 1        # cofactor
    q_ctx: FpCtx | None = None   # mod-q arithmetic context (scalars)

    def __post_init__(self):
        if self.q_ctx is None:
            self.q_ctx = FpCtx(self.q)
        p = self.fp_ctx.p_int
        self.b3 = (3 * self.b) % p
        self.a2 = (self.a * self.a) % p
        self.a_is_m3 = (self.a % p) == (p - 3)
        self.a_is_0 = (self.a % p) == 0

    # -- point constructors ---------------------------------------------------

    def point_from_affine_ints(self, xs, ys) -> PrjPoint:
        """Host ints -> batched projective point (Z=1)."""
        x = self.fp_ctx.from_ints(xs)
        y = self.fp_ctx.from_ints(ys)
        one = self.fp_ctx.one(like=x)
        return PrjPoint(x, y, one)

    def generator(self, batch_shape=()) -> PrjPoint:
        x = self.fp_ctx.const(self.gx, batch_shape=batch_shape)
        y = self.fp_ctx.const(self.gy, batch_shape=batch_shape)
        z = self.fp_ctx.const(1, batch_shape=batch_shape)
        return PrjPoint(x, y, z)

    def infinity(self, like: PrjPoint | None = None, batch_shape=()) -> PrjPoint:
        if like is not None:
            batch_shape = like.x.shape[1:]
        z0 = self.fp_ctx.zero(batch_shape=batch_shape)
        one = self.fp_ctx.const(1, batch_shape=batch_shape)
        return PrjPoint(z0, one, jnp.zeros_like(z0))

    # generic group-op interface (see curves/group.py)
    def padd(self, P, Q):
        return point_add(self, P, Q)

    def pdbl(self, P):
        return point_dbl(self, P)

    def pdbln_add(self, P, Q, ndbl: int):
        return point_dbln_add(self, P, Q, ndbl)

    def pinf(self, like=None, batch_shape=()):
        return self.infinity(like=like, batch_shape=batch_shape)

    def scalar_bits(self) -> int:
        return self.q.bit_length()


def point_select(cond, a: PrjPoint, b: PrjPoint) -> PrjPoint:
    """Lanewise cond ? a : b."""
    return PrjPoint(fp.select(cond, a.x, b.x),
                    fp.select(cond, a.y, b.y),
                    fp.select(cond, a.z, b.z))


def point_neg(c: ShortWCurve, p: PrjPoint) -> PrjPoint:
    return PrjPoint(p.x, fp.neg(p.y, c.fp_ctx), p.z)


def is_infinity_mask(c: ShortWCurve, p: PrjPoint):
    """Z ≡ 0 (mod p) lanewise. Canonicalizes: relaxed reps of 0 may hold
    nonzero limbs (multiples of p)."""
    return fp.is_zero_mask(p.z, c.fp_ctx)


def _mul_group(ctx, pairs):
    """Compute several independent field products as ONE batched Montgomery
    multiply by stacking the operand pairs along a fresh batch axis. This is
    the TPU analog of the reference's sequence of fp_mul_monty calls inside
    the complete formulas (prj_pt.c:884-1072): fewer, wider VPU ops and a
    ~4x smaller traced graph."""
    a = jnp.stack([p[0] for p in pairs], axis=1)
    b = jnp.stack([p[1] for p in pairs], axis=1)
    r = fp.mul(a, b, ctx)
    return [r[:, i] for i in range(len(pairs))]


def _sqr_group(ctx, items):
    """Several independent field SQUARES as one batched Montgomery
    squaring (Comba-squaring phase 1 — half the limb products; see
    nn.core._sqr_columns). Companion of _mul_group."""
    a = jnp.stack(items, axis=1)
    r = fp.sqr(a, ctx)
    return [r[:, i] for i in range(len(items))]


def point_add(c: ShortWCurve, P: PrjPoint, Q: PrjPoint) -> PrjPoint:
    """Complete addition, any a (Renes-Costello-Batina 2015 Alg. 1),
    restructured into 3 grouped multiply layers (6+6+6 products).
    Reference: __prj_pt_add_monty_cf (src/curves/prj_pt.c:971).
    Handles P=Q, P=-Q, infinity without branches.

    On TPU backends with kernel-compatible batch shapes the whole formula
    runs as ONE fused Pallas kernel (ops/pallas/point.py) — same math,
    all intermediates in VMEM.

    The only algebraic deviation from Alg. 1: a*(t0 - a*t2) is expanded to
    a*t0 - a^2*t2 (a^2 is a curve constant) so the middle layer's products
    are mutually independent.
    """
    from ..config import use_pallas
    if use_pallas():
        from ..ops.pallas import point as ppoint
        if ppoint.supported(c, P) and P.x.shape == Q.x.shape:
            return ppoint.point_add(c, P, Q)
    ctx = c.fp_ctx
    A = ctx.const(c.a, like=P.x)
    A2 = ctx.const(c.a2, like=P.x)
    B3 = ctx.const(c.b3, like=P.x)
    ad = lambda u, v: fp.add(u, v, ctx)
    sb = lambda u, v: fp.sub(u, v, ctx)
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0, t1, t2, m3, m4, m5 = _mul_group(ctx, [
        (X1, X2), (Y1, Y2), (Z1, Z2),
        (ad(X1, Y1), ad(X2, Y2)), (ad(X1, Z1), ad(X2, Z2)),
        (ad(Y1, Z1), ad(Y2, Z2)),
    ])
    t3 = sb(m3, ad(t0, t1))                 # X1*Y2 + X2*Y1
    t4 = sb(m4, ad(t0, t2))                 # X1*Z2 + X2*Z1
    t5 = sb(m5, ad(t1, t2))                 # Y1*Z2 + Y2*Z1
    if c.a_is_0:
        # a = 0 (secp256k1 class): all a-terms vanish
        b3t2, b3t4 = _mul_group(ctx, [(B3, t2), (B3, t4)])
        Z3 = b3t2
        X3 = sb(t1, Z3)
        Z3 = ad(t1, Z3)
        t1n = ad(ad(t0, t0), t0)            # 3*t0
        t4n = b3t4
    elif c.a_is_m3:
        # a = -3 (NIST/Brainpool class): a*t = -(3t), a^2*t = 9t — adds
        # replace 4 constant field multiplies. The signs are folded into
        # the combining subtractions so every subtrahend stays a small
        # multiple of a multiply output (complement-subtraction contract:
        # subtrahend limbs <= 2^17-1 AND value within the kc-limb window;
        # negated values carry the ~2^(15kc+2) complement offset and must
        # never land in a subtrahend).
        b3t2, b3t4 = _mul_group(ctx, [(B3, t2), (B3, t4)])
        m4_3 = ad(ad(m4, m4), m4)                      # 3*m4, limbs ok
        s02 = ad(t0, t2)
        s02_3 = nn.relax_once(ad(ad(s02, s02), s02))   # 3*(t0+t2)
        t0_3 = ad(ad(t0, t0), t0)
        t2_3 = ad(ad(t2, t2), t2)
        t8 = ad(ad(t2, t2), ad(t2, t2))
        t2_9 = ad(ad(t8, t8), t2)                      # 9*t2
        # Z3(pre) = -3*t4 + b3*t2 = b3*t2 - 3*m4 + 3*(t0+t2)
        Z3 = ad(sb(b3t2, m4_3), s02_3)
        # X3 = t1 - Z3(pre) = (t1 - b3*t2) + 3*m4 - 3*(t0+t2)
        X3 = sb(ad(sb(t1, b3t2), m4_3), s02_3)
        Z3 = ad(t1, Z3)
        t1n = sb(t0_3, nn.relax_once(t2_3))            # 3*t0 - 3*t2
        t4n = sb(b3t4, nn.relax_once(ad(t0_3, t2_9)))  # b3*t4 - 3*t0 - 9*t2
    else:
        at4, b3t2, at2, b3t4, at0, a2t2 = _mul_group(ctx, [
            (A, t4), (B3, t2), (A, t2), (B3, t4), (A, t0), (A2, t2),
        ])
        Z3 = ad(at4, b3t2)
        X3 = sb(t1, Z3)
        Z3 = ad(t1, Z3)
        t1n = ad(ad(ad(t0, t0), t0), at2)   # 3*t0 + a*t2
        t4n = ad(b3t4, sb(at0, a2t2))       # b3*t4 + a*(t0 - a*t2)
    y3a, y3b, x3b, x3a, z3b, z3a = _mul_group(ctx, [
        (X3, Z3), (t1n, t4n), (t5, t4n), (t3, X3), (t3, t1n), (t5, Z3),
    ])
    return PrjPoint(sb(x3a, x3b), ad(y3a, y3b), ad(z3a, z3b))


def point_jacobian_dbl(c: ShortWCurve, Xj, Yj, Zj):
    """One Jacobian doubling (dbl-2001-b, 3M+5S for a=-3; specialized
    a=0 / generic-a variants) — the cheap doubling of the PUBLIC
    windowed-mult window block (see point_dbln_jac). Mirrors the Pallas
    kernel body ops/pallas/point.py:_jdbl_body op-for-op (bit-identical
    relaxed limbs)."""
    ctx = c.fp_ctx
    ad = lambda u, v: fp.add(u, v, ctx)
    sb = lambda u, v: fp.sub(u, v, ctx)
    delta = fp.sqr(Zj, ctx)
    gamma = fp.sqr(Yj, ctx)
    beta = fp.mul(Xj, gamma, ctx)
    if c.a_is_m3:
        m = fp.mul(sb(Xj, delta), ad(Xj, delta), ctx)
        alpha = ad(ad(m, m), m)
    elif c.a_is_0:
        x2 = fp.sqr(Xj, ctx)
        alpha = ad(ad(x2, x2), x2)
    else:
        A = ctx.const(c.a, like=Xj)
        x2 = fp.sqr(Xj, ctx)
        ad2 = fp.mul(fp.sqr(delta, ctx), A, ctx)
        alpha = ad(ad(ad(x2, x2), x2), ad2)
    alpha_sq = fp.sqr(alpha, ctx)
    b4 = ad(ad(beta, beta), ad(beta, beta))
    b8 = ad(b4, b4)
    X3 = sb(alpha_sq, nn.relax_once(b8))
    Z3 = sb(fp.sqr(ad(Yj, Zj), ctx), ad(gamma, delta))
    t = sb(nn.relax_once(ad(b8, b4)), alpha_sq)   # 12b - alpha^2
    g2 = fp.sqr(gamma, ctx)
    g8 = ad(ad(ad(g2, g2), ad(g2, g2)), ad(ad(g2, g2), ad(g2, g2)))
    Y3 = sb(fp.mul(alpha, t, ctx), nn.relax_once(g8))
    return X3, Y3, Z3


def point_dbln_jac(c: ShortWCurve, P: PrjPoint, ndbl: int) -> PrjPoint:
    """2^ndbl * P for PUBLIC points via a Jacobian doubling block:
    homog -> jac (X*Z, Y*Z^2, Z), ndbl Jacobian doublings (3M+5S each vs
    the complete RCB doubling's 11M+2mc), jac -> homog
    (Xj*Zj : Yj : Zj^3). The identity is handled by ONE select at entry
    (lanes with Z ≡ 0 take the (1,1,0) Jacobian representative, whose
    doubling orbit is itself and whose back-conversion is the valid
    (0:1:0)); the adds around this block stay COMPLETE, so no
    exceptional-case patching exists anywhere. Public-scalar paths only
    (verify / order checks) — the schedule is input-independent but the
    formula set is the throughput one."""
    ctx = c.fp_ctx
    inf = fp.is_zero_mask(P.z, ctx)     # Z < 5p contract (sum of 2 muls)
    zz = fp.sqr(P.z, ctx)
    Xj = fp.mul(P.x, P.z, ctx)
    Yj = fp.mul(P.y, zz, ctx)
    onec = ctx.const(1, like=P.x)
    Xj = fp.select(inf, onec, Xj)
    Yj = fp.select(inf, onec, Yj)
    Zj = fp.select(inf, jnp.zeros_like(P.z), P.z)
    for _ in range(ndbl):
        Xj, Yj, Zj = point_jacobian_dbl(c, Xj, Yj, Zj)
    zz = fp.sqr(Zj, ctx)
    return PrjPoint(fp.mul(Xj, Zj, ctx), Yj, fp.mul(zz, Zj, ctx))


def point_dbln_add(c: ShortWCurve, P: PrjPoint, Q: PrjPoint,
                   ndbl: int) -> PrjPoint:
    """2^ndbl * P + Q — the windowed-mult scan step. On TPU this is ONE
    fused Pallas kernel (all formulas' intermediates stay in VMEM);
    elsewhere it decomposes into the Jacobian doubling block plus one
    complete add."""
    from ..config import use_pallas
    if use_pallas():
        from ..ops.pallas import point as ppoint
        if ppoint.supported(c, P) and P.x.shape == Q.x.shape:
            return ppoint.point_dbln_add(c, P, Q, ndbl)
    P = point_dbln_jac(c, P, ndbl)
    return point_add(c, P, Q)


def point_dbl(c: ShortWCurve, P: PrjPoint) -> PrjPoint:
    """Complete doubling, any a (RCB 2015 Alg. 3), 3 grouped multiply layers
    (6+6+5 products; same a*(t0-a*t2) expansion as point_add).
    Reference: __prj_pt_dbl_monty_cf (src/curves/prj_pt.c:884).
    Fused Pallas kernel on TPU (see point_add)."""
    from ..config import use_pallas
    if use_pallas():
        from ..ops.pallas import point as ppoint
        if ppoint.supported(c, P):
            return ppoint.point_dbl(c, P)
    ctx = c.fp_ctx
    A = ctx.const(c.a, like=P.x)
    A2 = ctx.const(c.a2, like=P.x)
    B3 = ctx.const(c.b3, like=P.x)
    ad = lambda u, v: fp.add(u, v, ctx)
    sb = lambda u, v: fp.sub(u, v, ctx)
    X, Y, Z = P
    t0, t1, t2 = _sqr_group(ctx, [X, Y, Z])
    xy, xz, yz = _mul_group(ctx, [(X, Y), (X, Z), (Y, Z)])
    t3 = ad(xy, xy)                          # 2XY
    Z3w = ad(xz, xz)                         # 2XZ
    if c.a_is_0:
        b3t2, b3z3 = _mul_group(ctx, [(B3, t2), (B3, Z3w)])
        Y3w = b3t2
        X3w = sb(t1, Y3w)
        Y3w = ad(t1, Y3w)
        t3n = b3z3
        t0n = ad(ad(t0, t0), t0)             # 3*t0
    elif c.a_is_m3:
        # same sign-folding discipline as point_add: subtrahends are small
        # multiples of multiply outputs only
        b3t2, b3z3 = _mul_group(ctx, [(B3, t2), (B3, Z3w)])
        z3x3 = nn.relax_once(ad(ad(Z3w, Z3w), Z3w))    # 3*(2XZ)
        t0_3 = ad(ad(t0, t0), t0)
        t2_3 = ad(ad(t2, t2), t2)
        t8 = ad(ad(t2, t2), ad(t2, t2))
        t2_9 = ad(ad(t8, t8), t2)                      # 9*t2
        # Y3(pre) = a*Z3w + b3*t2 = b3*t2 - 3*Z3w
        Y3w = sb(b3t2, z3x3)
        # X3w = t1 - Y3(pre) = (t1 - b3*t2) + 3*Z3w
        X3w = ad(sb(t1, b3t2), z3x3)
        Y3w = ad(t1, Y3w)
        t3n = sb(b3z3, nn.relax_once(ad(t0_3, t2_9)))  # b3*Z3w - 3t0 - 9t2
        t0n = sb(t0_3, nn.relax_once(t2_3))            # 3*t0 - 3*t2
    else:
        az3, b3t2, b3z3, at2, at0, a2t2 = _mul_group(ctx, [
            (A, Z3w), (B3, t2), (B3, Z3w), (A, t2), (A, t0), (A2, t2),
        ])
        Y3w = ad(az3, b3t2)
        X3w = sb(t1, Y3w)                    # t1 - Y3
        Y3w = ad(t1, Y3w)                    # t1 + Y3
        t3n = ad(sb(at0, a2t2), b3z3)        # a*(t0 - a*t2) + b3*Z3
        t0n = ad(ad(ad(t0, t0), t0), at2)    # 3*t0 + a*t2
    t2d = ad(yz, yz)                         # 2YZ
    y3m, y3t, x3t, x3m, z3m = _mul_group(ctx, [
        (X3w, Y3w), (t0n, t3n), (t2d, t3n), (t3, X3w), (t2d, t1),
    ])
    X3 = sb(x3m, x3t)
    Y3 = ad(y3m, y3t)
    Z3 = ad(z3m, z3m)
    Z3 = ad(Z3, Z3)
    return PrjPoint(X3, Y3, Z3)


def to_affine(c: ShortWCurve, P: PrjPoint):
    """Normalize to Z=1 (reference: prj_pt_unique, prj_pt.c:241).
    Returns (x, y, inf_mask) with x,y CANONICAL Montgomery-form limbs;
    x=y=0 at infinity."""
    ctx = c.fp_ctx
    inf = is_infinity_mask(c, P)
    zinv = fp.inv(P.z, ctx)   # 0 -> 0, masked below
    x = fp.canon(fp.mul(P.x, zinv, ctx), ctx)
    y = fp.canon(fp.mul(P.y, zinv, ctx), ctx)
    z = ctx.zero(like=x)
    return fp.select(inf, z, x), fp.select(inf, z, y), inf


def to_affine_plain(c: ShortWCurve, P: PrjPoint):
    """Like to_affine but returns PLAIN-domain canonical coordinates
    (ready for export / mod-q reduction in the sig layer)."""
    from ..nn import core as nncore
    ctx = c.fp_ctx
    inf = is_infinity_mask(c, P)
    zinv = fp.inv(P.z, ctx)
    x = nncore.canonicalize_from_mont(fp.mul(P.x, zinv, ctx), ctx)
    y = nncore.canonicalize_from_mont(fp.mul(P.y, zinv, ctx), ctx)
    z = ctx.zero(like=x)
    return fp.select(inf, z, x), fp.select(inf, z, y), inf


def on_curve_mask(c: ShortWCurve, P: PrjPoint):
    """Projective on-curve check: Y^2 Z == X^3 + a X Z^2 + b Z^3.
    Reference: aff_pt on-curve check (src/curves/aff_pt.c:139) and the
    pre/post scalar-mult checks (prj_pt.c:1767,1776). Infinity passes."""
    ctx = c.fp_ctx
    A = ctx.const(c.a, like=P.x)
    B = ctx.const(c.b, like=P.x)
    X, Y, Z = P
    z2 = fp.sqr(Z, ctx)
    lhs = fp.mul(fp.sqr(Y, ctx), Z, ctx)
    rhs = fp.mul(fp.sqr(X, ctx), X, ctx)
    rhs = fp.add(rhs, fp.mul(A, fp.mul(X, z2, ctx), ctx), ctx)
    rhs = fp.add(rhs, fp.mul(B, fp.mul(z2, Z, ctx), ctx), ctx)
    return fp.eq_mask(lhs, rhs, ctx)


def y_from_x(c: ShortWCurve, x):
    """Candidate y for affine x (Montgomery form): sqrt(x^3 + ax + b).
    Returns (y, exists_mask). Reference: aff_pt_y_from_x (aff_pt.c:102)."""
    ctx = c.fp_ctx
    A = ctx.const(c.a, like=x)
    B = ctx.const(c.b, like=x)
    rhs = fp.mul(fp.sqr(x, ctx), x, ctx)
    rhs = fp.add(rhs, fp.mul(A, x, ctx), ctx)
    rhs = fp.add(rhs, B, ctx)
    return fp.sqrt(rhs, ctx)
