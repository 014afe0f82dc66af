"""Montgomery curves: batched x-only ladder (RFC 7748 core).

Native Montgomery-ladder over u-coordinates — a deliberate divergence from
the reference, which maps X25519/X448 onto its short-Weierstrass core
(src/ecdh/x25519_448.c:146, src/curves/aff_pt_montgomery.c:294-495). The
x-only ladder is branch-free, 5M+4S per bit, and constant-schedule under
jit: ideal batched TPU work.

Curve: B v^2 = u^3 + A u^2 + u over GF(p).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..fp import field as fp
from ..fp.field import FpCtx


@dataclass
class MontgomeryCurve:
    name: str
    fp_ctx: FpCtx
    A: int
    B: int
    gu: int
    gv: int
    q: int
    h: int
    scalar_bits_n: int        # ladder length (255 for X25519, 448 for X448)

    def __post_init__(self):
        p = self.fp_ctx.p_int
        assert (self.A - 2) % 4 == 0
        self.a24 = ((self.A - 2) // 4) % p    # RFC 7748 a24 = (A-2)/4


def ladder_u(c: MontgomeryCurve, k, u):
    """Batched RFC 7748 ladder: k uint32[Kk, N] (clamped scalar, plain
    domain), u: field element (Montgomery domain, relaxed ok).
    Returns (x2, z2) with result u-coordinate = x2/z2 (z2 ≡ 0 for the
    zero output). Constant swap-schedule over scalar_bits_n bits."""
    ctx = c.fp_ctx
    nbits = c.scalar_bits_n
    bits = nn.bits_msb_first(k, nbits)
    one = ctx.one(like=u)
    zero = ctx.zero(like=u)
    a24 = ctx.const(c.a24, like=u)
    x1 = u

    def step(carry, bit):
        x2, z2, x3, z3, swap = carry
        bmask = bit.astype(bool)
        do_swap = (swap ^ bit).astype(bool)
        x2, x3 = fp.select(do_swap, x3, x2), fp.select(do_swap, x2, x3)
        z2, z3 = fp.select(do_swap, z3, z2), fp.select(do_swap, z2, z3)
        A_ = fp.add(x2, z2, ctx)
        Bm = fp.sub(x2, z2, ctx)
        C = fp.add(x3, z3, ctx)
        D = fp.sub(x3, z3, ctx)
        AA, BB, DA, CB = ed_mul4(ctx, [(A_, A_), (Bm, Bm), (D, A_), (C, Bm)])
        E = fp.sub(AA, BB, ctx)
        t0 = fp.add(DA, CB, ctx)
        t1 = fp.sub(DA, CB, ctx)
        x3n, z3t, x2n, z2n = ed_mul4(ctx, [
            (t0, t0), (t1, t1), (AA, BB),
            (E, fp.add(AA, fp.mul(a24, E, ctx), ctx)),
        ])
        z3n = fp.mul(x1, z3t, ctx)
        return (x2n, z2n, x3n, z3n, bit), None

    carry0 = (one, zero, x1, one, jnp.zeros_like(bits[0]))
    (x2, z2, x3, z3, swap), _ = jax.lax.scan(step, carry0, bits)
    smask = swap.astype(bool)
    x2 = fp.select(smask, x3, x2)
    z2 = fp.select(smask, z3, z2)
    return x2, z2


def ed_mul4(ctx, pairs):
    a = jnp.stack([p[0] for p in pairs], axis=1)
    b = jnp.stack([p[1] for p in pairs], axis=1)
    r = fp.mul(a, b, ctx)
    return [r[:, i] for i in range(len(pairs))]


_MONT_CURVES: dict[str, dict] = {}


def register_montgomery(name, p, A, B, gu, gv, q, h, scalar_bits, aliases=()):
    if (B * gv * gv - (gu ** 3 + A * gu * gu + gu)) % p != 0:
        raise ValueError(f"montgomery curve {name}: generator not on curve")
    key = name.upper()
    _MONT_CURVES[key] = dict(name=name, p=p, A=A, B=B, gu=gu, gv=gv, q=q,
                             h=h, sb=scalar_bits)
    for al in aliases:
        _MONT_CURVES[al.upper()] = _MONT_CURVES[key]
    get_montgomery_curve.cache_clear()


@lru_cache(maxsize=None)
def get_montgomery_curve(name: str) -> MontgomeryCurve:
    d = _MONT_CURVES[name.upper()]
    return MontgomeryCurve(name=d["name"], fp_ctx=FpCtx(d["p"]), A=d["A"],
                           B=d["B"], gu=d["gu"], gv=d["gv"], q=d["q"],
                           h=d["h"], scalar_bits_n=d["sb"])


register_montgomery(
    "CURVE25519",
    p=2**255 - 19,
    A=486662,
    B=1,
    gu=9,
    gv=14781619447589544791020593568409986887264606134616475288964881837755586237401,
    q=2**252 + 27742317777372353535851937790883648493,
    h=8,
    scalar_bits=255,
)

register_montgomery(
    "CURVE448",
    p=2**448 - 2**224 - 1,
    A=156326,
    B=1,
    gu=5,
    gv=355293926785568175264127502063783334808976399387714271831880898435169088786967410002932673765864550910142774147268105838985595290606362,
    q=2**446 - 13818066809895115352007386748515426880336692474882178609894547503885,
    h=4,
    scalar_bits=448,
)
