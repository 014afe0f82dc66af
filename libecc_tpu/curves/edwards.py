"""Twisted Edwards curves: batched extended-coordinate point ops.

Native Edwards arithmetic for EdDSA — a deliberate divergence from the
reference, which transports all Edwards math onto its short-Weierstrass
core through isogenies (src/curves/aff_pt_edwards.c:308-734,
README_original.md:67-77) to keep the C core small. On TPU, per-model
formulas are cheap and the native extended-coordinate formulas
(Hisil-Wong-Carter-Dawson 2008) are *unified* for a = -1 twists: one
branch-free add handles doubling and the identity, exactly what batched
lanes need.

Point: (X : Y : Z : T) with x = X/Z, y = Y/Z, T = XY/Z. Identity (0:1:1:0).
Curve: a x^2 + y^2 = 1 + d x^2 y^2.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..fp import field as fp
from ..fp.field import FpCtx


class ExtPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray


@dataclass
class EdwardsCurve:
    name: str
    fp_ctx: FpCtx
    a: int
    d: int
    gx: int
    gy: int
    q: int              # prime subgroup order
    h: int              # cofactor
    q_ctx: FpCtx | None = None

    def __post_init__(self):
        if self.q_ctx is None:
            self.q_ctx = FpCtx(self.q)
        p = self.fp_ctx.p_int
        self.a_is_m1 = (self.a % p) == (p - 1)
        self.a_is_1 = (self.a % p) == 1
        self.d2 = (2 * self.d) % p

    def point_from_affine_ints(self, xs, ys) -> ExtPoint:
        x = self.fp_ctx.from_ints(xs)
        y = self.fp_ctx.from_ints(ys)
        one = self.fp_ctx.one(like=x)
        t = fp.mul(x, y, self.fp_ctx)
        return ExtPoint(x, y, one, t)

    def generator(self, batch_shape=()) -> ExtPoint:
        ctx = self.fp_ctx
        x = ctx.const(self.gx, batch_shape=batch_shape)
        y = ctx.const(self.gy, batch_shape=batch_shape)
        one = ctx.const(1, batch_shape=batch_shape)
        t = ctx.const(self.gx * self.gy % ctx.p_int, batch_shape=batch_shape)
        return ExtPoint(x, y, one, t)

    def identity(self, like: ExtPoint | None = None, batch_shape=()) -> ExtPoint:
        if like is not None:
            batch_shape = like.x.shape[1:]
        ctx = self.fp_ctx
        z0 = ctx.zero(batch_shape=batch_shape)
        one = ctx.const(1, batch_shape=batch_shape)
        return ExtPoint(z0, one, one, jnp.zeros_like(z0))

    # generic group interface
    def padd(self, P, Q):
        return point_add(self, P, Q)

    def pdbl(self, P):
        return point_dbl(self, P)

    def pdbln_add(self, P, Q, ndbl: int):
        from ..config import use_pallas
        if use_pallas():
            from ..ops.pallas import edpoint
            if edpoint.supported(self, P) and P.x.shape == Q.x.shape:
                return edpoint.point_dbln_add(self, P, Q, ndbl)
        for _ in range(ndbl):
            P = point_dbl(self, P)
        return point_add(self, P, Q)

    def pinf(self, like=None, batch_shape=()):
        return self.identity(like=like, batch_shape=batch_shape)

    def scalar_bits(self) -> int:
        return self.q.bit_length()


def point_add(c: EdwardsCurve, P: ExtPoint, Q: ExtPoint) -> ExtPoint:
    """Unified extended addition.

    a = -1 fast path: HWCD08 "add-2008-hwcd-3" (8M, strongly unified —
    valid for P = Q and the identity). Generic a: "add-2008-hwcd" (9M +
    1*a + 1*d, unified). Grouped into wide batched multiplies like the
    Weierstrass formulas; ONE fused Pallas kernel on TPU
    (ops/pallas/edpoint.py)."""
    from ..config import use_pallas
    if use_pallas():
        from ..ops.pallas import edpoint
        if edpoint.supported(c, P) and P.x.shape == Q.x.shape:
            return edpoint.point_add(c, P, Q)
    ctx = c.fp_ctx
    ad = lambda u, v: fp.add(u, v, ctx)
    sb = lambda u, v: fp.sub(u, v, ctx)
    X1, Y1, Z1, T1 = P
    X2, Y2, Z2, T2 = Q
    if c.a_is_m1:
        # A = (Y1-X1)(Y2-X2); B = (Y1+X1)(Y2+X2); C = 2d T1 T2; D = 2 Z1 Z2
        K2d = ctx.const(c.d2, like=X1)
        A, B, Cm, Dm = _mul_group(ctx, [
            (sb(Y1, X1), sb(Y2, X2)), (ad(Y1, X1), ad(Y2, X2)),
            (T1, T2), (Z1, Z2),
        ])
        Cm = fp.mul(K2d, Cm, ctx)
        Dm = ad(Dm, Dm)
        E = sb(B, A)
        F = sb(Dm, Cm)
        G = ad(Dm, Cm)
        H = ad(B, A)
        X3, Y3, T3, Z3 = _mul_group(ctx, [(E, F), (G, H), (E, H), (F, G)])
        return ExtPoint(X3, Y3, Z3, T3)
    # generic a (add-2008-hwcd): A=X1X2 B=Y1Y2 C=dT1T2 D=Z1Z2
    Kd = ctx.const(c.d, like=X1)
    Ka = ctx.const(c.a, like=X1)
    A, B, Cm, Dm, E0 = _mul_group(ctx, [
        (X1, X2), (Y1, Y2), (T1, T2), (Z1, Z2),
        (ad(X1, Y1), ad(X2, Y2)),
    ])
    Cm = fp.mul(Kd, Cm, ctx)
    E = sb(sb(E0, A), B)
    F = sb(Dm, Cm)
    G = ad(Dm, Cm)
    aA = A if c.a_is_1 else fp.mul(Ka, A, ctx)   # a = 1 (Ed448): skip mul
    H = sb(B, aA)
    X3, Y3, T3, Z3 = _mul_group(ctx, [(E, F), (G, H), (E, H), (F, G)])
    return ExtPoint(X3, Y3, Z3, T3)


def _mul_group(ctx, pairs):
    a = jnp.stack([p[0] for p in pairs], axis=1)
    b = jnp.stack([p[1] for p in pairs], axis=1)
    r = fp.mul(a, b, ctx)
    return [r[:, i] for i in range(len(pairs))]


def point_dbl(c: EdwardsCurve, P: ExtPoint) -> ExtPoint:
    """Extended doubling (dbl-2008-hwcd, 4M+4S), any a.
    Fused Pallas kernel on TPU (see point_add)."""
    from ..config import use_pallas
    if use_pallas():
        from ..ops.pallas import edpoint
        if edpoint.supported(c, P):
            return edpoint.point_dbl(c, P)
    ctx = c.fp_ctx
    ad = lambda u, v: fp.add(u, v, ctx)
    sb = lambda u, v: fp.sub(u, v, ctx)
    X1, Y1, Z1, _ = P
    Ka = ctx.const(c.a, like=X1)
    from .shortw import _sqr_group
    A, B, Cs, E0 = _sqr_group(ctx, [X1, Y1, Z1, ad(X1, Y1)])
    D = A if c.a_is_1 else fp.mul(Ka, A, ctx)    # a = 1 (Ed448): skip mul
    E = sb(sb(E0, A), B)
    G = ad(D, B)
    F = sb(G, ad(Cs, Cs))
    H = sb(D, B)
    X3, Y3, T3, Z3 = _mul_group(ctx, [(E, F), (G, H), (E, H), (F, G)])
    return ExtPoint(X3, Y3, Z3, T3)


def point_neg(c: EdwardsCurve, P: ExtPoint) -> ExtPoint:
    ctx = c.fp_ctx
    return ExtPoint(fp.neg(P.x, ctx), P.y, P.z, fp.neg(P.t, ctx))


def point_select(cond, a: ExtPoint, b: ExtPoint) -> ExtPoint:
    from .group import pselect
    return pselect(cond, a, b)


def is_identity_mask(c: EdwardsCurve, P: ExtPoint):
    """X ≡ 0 and Y ≡ Z (lanewise, canonicalized)."""
    ctx = c.fp_ctx
    return fp.is_zero_mask(P.x, ctx) & fp.eq_mask(P.y, P.z, ctx)


def to_affine(c: EdwardsCurve, P: ExtPoint):
    """-> (x, y) canonical Montgomery-form; identity gives (0, 1)."""
    ctx = c.fp_ctx
    zinv = fp.inv(P.z, ctx)
    x = fp.canon(fp.mul(P.x, zinv, ctx), ctx)
    y = fp.canon(fp.mul(P.y, zinv, ctx), ctx)
    return x, y


def to_affine_plain(c: EdwardsCurve, P: ExtPoint):
    from ..nn import core as nncore
    ctx = c.fp_ctx
    zinv = fp.inv(P.z, ctx)
    x = nncore.canonicalize_from_mont(fp.mul(P.x, zinv, ctx), ctx)
    y = nncore.canonicalize_from_mont(fp.mul(P.y, zinv, ctx), ctx)
    return x, y


def on_curve_mask(c: EdwardsCurve, P: ExtPoint):
    """a X^2 Z^2 + Y^2 Z^2 == Z^4 + d X^2 Y^2 (projective check) and
    T Z == X Y (extended-coordinate consistency)."""
    ctx = c.fp_ctx
    Ka = ctx.const(c.a, like=P.x)
    Kd = ctx.const(c.d, like=P.x)
    x2, y2, z2 = (fp.sqr(P.x, ctx), fp.sqr(P.y, ctx), fp.sqr(P.z, ctx))
    lhs = fp.mul(fp.add(fp.mul(Ka, x2, ctx), y2, ctx), z2, ctx)
    rhs = fp.add(fp.sqr(z2, ctx), fp.mul(Kd, fp.mul(x2, y2, ctx), ctx), ctx)
    tz = fp.mul(P.t, P.z, ctx)
    xy = fp.mul(P.x, P.y, ctx)
    return fp.eq_mask(lhs, rhs, ctx) & fp.eq_mask(tz, xy, ctx)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

_ED_CURVES: dict[str, dict] = {}


def register_edwards(name: str, p: int, a: int, d: int, gx: int, gy: int,
                     q: int, h: int, aliases=()):
    a_, d_ = a % p, d % p
    lhs = (a_ * gx * gx + gy * gy) % p
    rhs = (1 + d_ * gx * gx % p * gy * gy) % p
    if lhs != rhs:
        raise ValueError(f"edwards curve {name}: generator not on curve")
    key = name.replace("_", "").replace("-", "").upper()
    _ED_CURVES[key] = dict(name=name, p=p, a=a_, d=d_, gx=gx, gy=gy, q=q, h=h)
    for al in aliases:
        _ED_CURVES[al.replace("_", "").replace("-", "").upper()] = _ED_CURVES[key]
    get_edwards_curve.cache_clear()


@lru_cache(maxsize=None)
def get_edwards_curve(name: str) -> EdwardsCurve:
    key = name.replace("_", "").replace("-", "").upper()
    if key not in _ED_CURVES:
        raise KeyError(f"unknown edwards curve {name!r}")
    d = _ED_CURVES[key]
    return EdwardsCurve(name=d["name"], fp_ctx=FpCtx(d["p"]), a=d["a"],
                        d=d["d"], gx=d["gx"], gy=d["gy"], q=d["q"], h=d["h"])


P25519 = 2**255 - 19

register_edwards(
    "ED25519",
    p=P25519,
    a=-1,
    d=37095705934669439343138083508754565189542113879843219016388785533085940283555,
    gx=15112221349535400772501151409588531511454012693041857206046113283949847762202,
    gy=46316835694926478169428394003475163141307993866256225615783033603165251855960,
    q=2**252 + 27742317777372353535851937790883648493,
    h=8,
    aliases=("WEI25519-ED", "EDWARDS25519"),
)

P448 = 2**448 - 2**224 - 1

register_edwards(
    # RFC 8032 edwards448 (the reference reaches this wire format through a
    # 4-isogeny from WEI448 + coordinate scaling, eddsa.c:330-568; we use
    # the RFC curve natively)
    "ED448",
    p=P448,
    a=1,
    d=-39081,
    gx=224580040295924300187604334099896036246789641632564134246125461686950415467406032909029192869357953282578032075146446173674602635247710,
    gy=298819210078481492676017930443930673437544040154080242095928241372331506189835876003536878655418784733982303233503462500531545062832660,
    q=2**446 - 0x8335dc163bb124b65129c96fde933d8d723a70aadc873d6d54a7bb0d,
    h=4,
    aliases=("EDWARDS448", "ED-448"),
)
