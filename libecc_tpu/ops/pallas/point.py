"""Fused Pallas TPU kernels for complete-formula point add / double.

One kernel = one whole Renes-Costello-Batina formula (12-18 field
multiplies plus the additive glue), with every intermediate field element
kept in VMEM as (8, 128)-tile limb lists. The XLA formulation spills each
field-op result to HBM between ops; fusing the full formula removes that
traffic and the per-op fusion boundaries, which dominate the scalar-mult
loop cost (see SURVEY §7 hot-path analysis; reference formulas:
src/curves/prj_pt.c:884-1072).

Layout contract (shared with mont.py): coords are uint32[K, N] relaxed
Montgomery-domain limb tensors with N % 1024 == 0; blocks are
(K, 8, 128). Math is bit-identical to curves/shortw.py point_add/
point_dbl over nn.core relaxed arithmetic.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...nn import core as nn
from .mont import (LIMB_BITS, LIMB_MASK, SUBLANES, LANES, BLOCK,
                   MAX_PALLAS_LIMBS, _relax, _mul_cols, _mul_cols_const,
                   _f32_carry)


# -- field ops on lists of (S, L) tiles ---------------------------------------

def _fmul(a, b, p_limbs, pinv_limbs, k):
    """Relaxed Montgomery product of two tile lists (mont.py kernel body)."""
    ar = _relax(a)
    br = _relax(b)
    t = _mul_cols(ar, br)
    t_lo_r = _relax(t[:k])
    m = _relax(_mul_cols_const(t_lo_r, pinv_limbs)[:k])
    u = _mul_cols_const(m, p_limbs)
    s_lo = [t[i] + u[i] for i in range(k)]
    carry = _f32_carry(s_lo)
    hi = [t[k + i] + u[k + i] for i in range(k)]
    hi[0] = hi[0] + carry
    return _relax(hi)


def _fsqr(a, p_limbs, pinv_limbs, k):
    """Relaxed Montgomery SQUARING: Comba-squaring phase 1 (off-diagonal
    products doubled — k(k+1)/2 multiplies instead of k^2), identical
    column values to nn.core._sqr_columns. Value-equal to _fmul(a, a)."""
    ar = _relax(a)
    cols = [None] * (2 * k)

    def acc_at(idx, v):
        cols[idx] = v if cols[idx] is None else cols[idx] + v

    for i in range(k):
        for j in range(i, k):
            p = ar[i] * ar[j]
            if i < j:
                p = p + p
            acc_at(i + j, p & LIMB_MASK)
            acc_at(i + j + 1, p >> LIMB_BITS)
    t = [c if c is not None else jnp.zeros_like(ar[0]) for c in cols]
    t_lo_r = _relax(t[:k])
    m = _relax(_mul_cols_const(t_lo_r, pinv_limbs)[:k])
    u = _mul_cols_const(m, p_limbs)
    s_lo = [t[i] + u[i] for i in range(k)]
    carry = _f32_carry(s_lo)
    hi = [t[k + i] + u[k + i] for i in range(k)]
    hi[0] = hi[0] + carry
    return _relax(hi)


def _fmul_c(a, c_limbs, p_limbs, pinv_limbs, k):
    """Montgomery product with a constant (Montgomery-domain int limbs)."""
    ar = _relax(a)
    t = _mul_cols_const(ar, c_limbs)
    t_lo_r = _relax(t[:k])
    m = _relax(_mul_cols_const(t_lo_r, pinv_limbs)[:k])
    u = _mul_cols_const(m, p_limbs)
    s_lo = [t[i] + u[i] for i in range(k)]
    carry = _f32_carry(s_lo)
    hi = [t[k + i] + u[k + i] for i in range(k)]
    hi[0] = hi[0] + carry
    return _relax(hi)


def _fadd(a, b):
    return [x + y for x, y in zip(a, b)]


def _fsub(a, b, sub_kc, sub_cc, sub_c0, k):
    """mod_sub_relaxed complement trick (nn.core.mod_sub_relaxed)."""
    out = []
    cc = jnp.uint32(sub_cc)
    for i in range(k):
        comp = (cc - b[i]) if i < sub_kc else jnp.zeros_like(b[i])
        c0 = jnp.uint32(int(sub_c0[i]))
        out.append(a[i] + comp + c0)
    return out


def _read(ref, k):
    return [ref[i] for i in range(k)]


def _write(ref, limbs):
    for i, v in enumerate(limbs):
        ref[i] = v


class TileOps:
    """The original fully-unrolled list-of-(S,L)-tiles field-op set.
    O(K^2) Mosaic instructions per multiply — fastest compiled code for
    small K, but compile time explodes past K~30 (see rows.py)."""

    def __init__(self, C):
        self.C = C
        k = C["k"]
        self.mul = lambda a, b: _fmul(a, b, C["p"], C["pinv"], k)
        self.sqr = lambda a: _fsqr(a, C["p"], C["pinv"], k)
        self.mc = lambda a, c: _fmul_c(a, c, C["p"], C["pinv"], k)
        self.ad = _fadd
        self.sb = lambda a, b: _fsub(a, b, C["sub_kc"], C["sub_cc"],
                                     C["sub_c0"], k)
        self.relax = _relax

    def read(self, ref):
        return _read(ref, self.C["k"])

    def write(self, ref, v):
        _write(ref, v)


def _make_ops(C, scratch):
    """scratch = () -> tile ops; (t_ref, m_ref) -> row-vectorized ops."""
    if scratch:
        from .rows import RowOps

        class _R(RowOps):
            def read(self, ref):
                return ref[...]

            def write(self, ref, v):
                ref[...] = v

        return _R(C, *scratch)
    return TileOps(C)


def _row_scratch(k):
    """VMEM scratch for one RowOps instance (shared by every multiply in
    the fused kernel): 2K column accumulator + K+1 truncated-product."""
    return [pltpu.VMEM((2 * k, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((k + 1, SUBLANES, LANES), jnp.uint32)]


# Mode split: tile-list kernels up to this K, row-vectorized beyond
# (LIBECC_TPU_PALLAS_ROWS=1 forces rows everywhere — benchmarking knob).
import os as _os
UNROLLED_MAX_K = int(_os.environ.get("LIBECC_TPU_PALLAS_UNROLL_MAX_K", "30"))


def _use_rows(k) -> bool:
    return (k > UNROLLED_MAX_K
            or _os.environ.get("LIBECC_TPU_PALLAS_ROWS", "0") == "1")


def _is_zero_mod_p(ops, Z):
    """Exact Z ≡ 0 (mod p) lane mask for ANY relaxed value < R.

    One Montgomery multiply by the PLAIN constant 1 maps value(Z) to
    w ≡ Z·R^-1 (mod p) with w < p + Z/R + 1 <= p + 1, so after exact
    carry resolution w ∈ {0, p} exactly when Z ≡ 0. O(K) tile compares
    after one constant multiply; the XLA mirror (fp.is_zero_mask via
    canonicalize) computes the same boolean for every input."""
    k = ops.C["k"]
    one_plain = (1,) + (0,) * (k - 1)
    limbs = Z if isinstance(Z, list) else [Z[i] for i in range(k)]
    w = ops.mc(limbs if isinstance(Z, list) else Z, one_plain)
    wl = w if isinstance(w, list) else [w[i] for i in range(k)]
    out = []
    carry = None
    for i in range(k):
        x = wl[i] if carry is None else wl[i] + carry
        out.append(x & LIMB_MASK)
        carry = x >> LIMB_BITS
    p_int = ops.C["p_int"]
    eq_any = None
    for m in range(2):                     # w ∈ {0, p} iff Z ≡ 0
        cand = nn.to_limbs(m * p_int, k)
        eq = None
        for i in range(k):
            e = out[i] == jnp.uint32(int(cand[i]))
            eq = e if eq is None else (eq & e)
        eq_any = eq if eq_any is None else (eq_any | eq)
    return eq_any


def _sel(mask, a_limbs, b_limbs):
    """Lanewise select between two tile lists: mask ? a : b."""
    return [jnp.where(mask, a, b) for a, b in zip(a_limbs, b_limbs)]


# -- Jacobian doubling block (public windowed-mult hot path) -------------------
#
# The w doublings of every window run in JACOBIAN coordinates
# (dbl-2001-b: 3M + 5S vs the complete RCB doubling's 11M + 2mc), with
# one conversion each way per window and the COMPLETE RCB add unchanged:
#   homog (X:Y:Z)  ->  jac (X*Z, Y*Z^2, Z)     [2M + 1S]
#   jac (Xj,Yj,Zj) ->  homog (Xj*Zj : Yj : Zj^3) [2M + 1S]
# Infinity: the homog accumulator can be the identity (leading zero
# digits, or an adversarial mid-loop cancellation from the complete
# add). to_jac SELECTS the fixed representative (1, 1, 0) for such
# lanes; the jdbl orbit keeps it at (1, 1, Z≡0) and from_jac lands on
# (0 : 1 : 0) — a valid homogeneous identity — with no further selects.
# Incomplete-add exceptional cases never arise: the adds stay complete.
# Not constant-schedule-dependent-on-secrets: ONLY public-scalar paths
# (verification / order checks) call this block.


def _jdbl_body(ops, X, Y, Z):
    """One Jacobian doubling, dbl-2001-b (a=-3), 3M+5S; a=0 and generic-a
    variants mirror the RCB specialization style. Subtrahend discipline
    matches _add_body: subtrahends are multiply outputs or relax_once'd
    small multiples of them, never subtraction outputs (their complement
    offset exceeds the kc-limb window)."""
    C = ops.C
    mul, mc, ad, sb = ops.mul, ops.mc, ops.ad, ops.sb
    sqr = getattr(ops, "sqr", None) or (lambda a: mul(a, a))
    _relax = ops.relax
    delta = sqr(Z)
    gamma = sqr(Y)
    beta = mul(X, gamma)
    if C["a_is_m3"]:
        # alpha = 3*(X-delta)*(X+delta)
        m = mul(sb(X, delta), ad(X, delta))
        alpha = ad(ad(m, m), m)
    elif C["a_is_0"]:
        x2 = sqr(X)
        alpha = ad(ad(x2, x2), x2)
    else:
        x2 = sqr(X)
        ad2 = mc(sqr(delta), C["A"])             # a * Z^4
        alpha = ad(ad(ad(x2, x2), x2), ad2)
    alpha_sq = sqr(alpha)
    b4 = ad(ad(beta, beta), ad(beta, beta))
    b8 = ad(b4, b4)
    X3 = sb(alpha_sq, _relax(b8))
    Z3 = sb(sqr(ad(Y, Z)), ad(gamma, delta))
    # 4*beta - X3 == 12*beta - alpha^2 (rewrite keeps the subtraction
    # output X3 out of a subtrahend slot)
    t = sb(_relax(ad(b8, b4)), alpha_sq)
    g2 = sqr(gamma)
    g8 = ad(ad(ad(g2, g2), ad(g2, g2)), ad(ad(g2, g2), ad(g2, g2)))
    Y3 = sb(mul(alpha, t), _relax(g8))
    return X3, Y3, Z3


def _to_jac_body(ops, X, Y, Z):
    """homog -> Jacobian with the identity-representative select."""
    mul = ops.mul
    sqr = getattr(ops, "sqr", None) or (lambda a: mul(a, a))
    k = ops.C["k"]
    one_limbs = ops.C["one"]
    inf = _is_zero_mod_p(ops, Z)
    zz = sqr(Z)
    Xj = mul(X, Z)
    Yj = mul(Y, zz)
    if isinstance(Xj, list):          # tile backend
        onec = [jnp.full_like(Xj[0], np.uint32(int(v)))
                for v in one_limbs]
        zeros = [jnp.zeros_like(Xj[0]) for _ in range(k)]
        Zl = Z if isinstance(Z, list) else [Z[i] for i in range(k)]
        return (_sel(inf, onec, Xj), _sel(inf, onec, Yj),
                _sel(inf, zeros, Zl))
    # rows backend: (K, S, L) arrays (full-shape concat-of-splats — see
    # rows.RowOps.const for the Mosaic lowering constraints)
    onec_a = jnp.concatenate(
        [jnp.full((1,) + Xj.shape[1:], np.uint32(int(v)))
         for v in one_limbs], axis=0)
    return (jnp.where(inf[None], onec_a, Xj),
            jnp.where(inf[None], onec_a, Yj),
            jnp.where(inf[None], jnp.zeros_like(Z), Z))


def _from_jac_body(ops, Xj, Yj, Zj):
    """Jacobian -> homog: (Xj*Zj : Yj : Zj^3). No select needed — the
    (1, 1, Z≡0) identity orbit maps to the valid (0 : 1 : 0)."""
    mul = ops.mul
    sqr = getattr(ops, "sqr", None) or (lambda a: mul(a, a))
    zz = sqr(Zj)
    return mul(Xj, Zj), Yj, mul(zz, Zj)


def _dbln_jac_block(ops, X, Y, Z, ndbl):
    """The whole per-window doubling block: to_jac, ndbl Jacobian
    doublings, from_jac."""
    Xj, Yj, Zj = _to_jac_body(ops, X, Y, Z)
    for _ in range(ndbl):
        Xj, Yj, Zj = _jdbl_body(ops, Xj, Yj, Zj)
    return _from_jac_body(ops, Xj, Yj, Zj)


# -- RCB complete formulas (mirror curves/shortw.py) ---------------------------

def _add_body(ops, X1, Y1, Z1, X2, Y2, Z2):
    C = ops.C
    mul, mc, ad, sb = ops.mul, ops.mc, ops.ad, ops.sb
    _relax = ops.relax
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    m3 = mul(ad(X1, Y1), ad(X2, Y2))
    m4 = mul(ad(X1, Z1), ad(X2, Z2))
    m5 = mul(ad(Y1, Z1), ad(Y2, Z2))
    t3 = sb(m3, ad(t0, t1))
    t4 = sb(m4, ad(t0, t2))
    t5 = sb(m5, ad(t1, t2))
    b3t2 = mc(t2, C["B3"])
    b3t4 = mc(t4, C["B3"])
    if C["a_is_0"]:
        # a = 0: all a-terms vanish (same specialization as
        # curves/shortw.py point_add)
        Z3 = b3t2
        X3 = sb(t1, Z3)
        Z3 = ad(t1, Z3)
        t1n = ad(ad(t0, t0), t0)
        t4n = b3t4
    elif C["a_is_m3"]:
        # a = -3: sign-folded add chains; structure and bounds mirror
        # curves/shortw.py point_add exactly (subtrahends = small
        # multiples of multiply outputs only)
        m4_3 = ad(ad(m4, m4), m4)
        s02 = ad(t0, t2)
        s02_3 = _relax(ad(ad(s02, s02), s02))
        t0_3 = ad(ad(t0, t0), t0)
        t2_3 = ad(ad(t2, t2), t2)
        t8 = ad(ad(t2, t2), ad(t2, t2))
        t2_9 = ad(ad(t8, t8), t2)
        Z3 = ad(sb(b3t2, m4_3), s02_3)
        X3 = sb(ad(sb(t1, b3t2), m4_3), s02_3)
        Z3 = ad(t1, Z3)
        t1n = sb(t0_3, _relax(t2_3))
        t4n = sb(b3t4, _relax(ad(t0_3, t2_9)))
    else:
        at4 = mc(t4, C["A"])
        at2 = mc(t2, C["A"])
        at0 = mc(t0, C["A"])
        a2t2 = mc(t2, C["A2"])
        Z3 = ad(at4, b3t2)
        X3 = sb(t1, Z3)
        Z3 = ad(t1, Z3)
        t1n = ad(ad(ad(t0, t0), t0), at2)
        t4n = ad(b3t4, sb(at0, a2t2))
    y3a = mul(X3, Z3)
    y3b = mul(t1n, t4n)
    x3b = mul(t5, t4n)
    x3a = mul(t3, X3)
    z3b = mul(t3, t1n)
    z3a = mul(t5, Z3)
    return sb(x3a, x3b), ad(y3a, y3b), ad(z3a, z3b)


def _dbl_body(ops, X, Y, Z):
    C = ops.C
    mul, mc, ad, sb = ops.mul, ops.mc, ops.ad, ops.sb
    sqr = getattr(ops, "sqr", None) or (lambda a: mul(a, a))
    _relax = ops.relax
    t0 = sqr(X)
    t1 = sqr(Y)
    t2 = sqr(Z)
    xy = mul(X, Y)
    xz = mul(X, Z)
    yz = mul(Y, Z)
    t3 = ad(xy, xy)
    Z3w = ad(xz, xz)
    b3t2 = mc(t2, C["B3"])
    b3z3 = mc(Z3w, C["B3"])
    if C["a_is_0"]:
        Y3w = b3t2
        X3w = sb(t1, Y3w)
        Y3w = ad(t1, Y3w)
        t3n = b3z3
        t0n = ad(ad(t0, t0), t0)
    elif C["a_is_m3"]:
        z3x3 = _relax(ad(ad(Z3w, Z3w), Z3w))
        t0_3 = ad(ad(t0, t0), t0)
        t2_3 = ad(ad(t2, t2), t2)
        t8 = ad(ad(t2, t2), ad(t2, t2))
        t2_9 = ad(ad(t8, t8), t2)
        Y3w = sb(b3t2, z3x3)
        X3w = ad(sb(t1, b3t2), z3x3)
        Y3w = ad(t1, Y3w)
        t3n = sb(b3z3, _relax(ad(t0_3, t2_9)))
        t0n = sb(t0_3, _relax(t2_3))
    else:
        az3 = mc(Z3w, C["A"])
        at2 = mc(t2, C["A"])
        at0 = mc(t0, C["A"])
        a2t2 = mc(t2, C["A2"])
        Y3w = ad(az3, b3t2)
        X3w = sb(t1, Y3w)
        Y3w = ad(t1, Y3w)
        t3n = ad(sb(at0, a2t2), b3z3)
        t0n = ad(ad(ad(t0, t0), t0), at2)
    t2d = ad(yz, yz)
    y3m = mul(X3w, Y3w)
    y3t = mul(t0n, t3n)
    x3t = mul(t2d, t3n)
    x3m = mul(t3, X3w)
    z3m = mul(t2d, t1)
    X3 = sb(x3m, x3t)
    Y3 = ad(y3m, y3t)
    Z3 = ad(z3m, z3m)
    Z3 = ad(Z3, Z3)
    return X3, Y3, Z3


def _curve_consts(curve):
    ctx = curve.fp_ctx
    k = ctx.k
    p = ctx.p_int

    def mont_limbs(v):
        return tuple(int(x) for x in nn.to_limbs(v * ctx.R % p, k))

    return dict(
        k=k,
        p_int=p,
        one=tuple(int(x) for x in nn.to_limbs(ctx.R % p, k)),
        p=tuple(int(x) for x in ctx.p),
        pinv=tuple(int(x) for x in ctx.pinv_full),
        sub_kc=int(ctx.sub_kc),
        sub_cc=int(ctx.sub_cc),
        sub_c0=tuple(int(x) for x in ctx.sub_c0),
        A=mont_limbs(curve.a % p),
        A2=mont_limbs(curve.a2),
        B3=mont_limbs(curve.b3),
        a_is_0=bool(curve.a_is_0),
        a_is_m3=bool(curve.a_is_m3),
    )


def _pallas_call3(kern, k, n_in, coords, rows):
    """Shared pallas_call wrapper: n_in coord inputs, 3 coord outputs,
    row-mode scratch when the builder chose the rows backend."""
    from .mont import _interp
    n = coords[0].shape[-1]
    g = n // BLOCK
    spec = pl.BlockSpec((k, SUBLANES, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    args = [c.reshape(k, n // LANES, LANES) for c in coords]
    sds = jax.ShapeDtypeStruct((k, n // LANES, LANES), jnp.uint32)
    outs = pl.pallas_call(
        kern, grid=(g,),
        in_specs=[spec] * n_in, out_specs=(spec, spec, spec),
        out_shape=(sds, sds, sds),
        scratch_shapes=_row_scratch(k) if rows else [],
        interpret=_interp(),
    )(*args)
    return tuple(o.reshape(k, n) for o in outs)


@functools.lru_cache(maxsize=None)
def _build_add(curve_key, k):
    from ...curves import params
    curve = params.get_curve(curve_key)
    C = _curve_consts(curve)

    def kern(x1, y1, z1, x2, y2, z2, ox, oy, oz, *scratch):
        ops = _make_ops(C, scratch)
        X3, Y3, Z3 = _add_body(ops, ops.read(x1), ops.read(y1),
                               ops.read(z1), ops.read(x2), ops.read(y2),
                               ops.read(z2))
        ops.write(ox, X3)
        ops.write(oy, Y3)
        ops.write(oz, Z3)

    rows = _use_rows(k)
    return lambda coords: _pallas_call3(kern, k, 6, coords, rows)


@functools.lru_cache(maxsize=None)
def _build_dbl(curve_key, k):
    from ...curves import params
    curve = params.get_curve(curve_key)
    C = _curve_consts(curve)

    def kern(x1, y1, z1, ox, oy, oz, *scratch):
        ops = _make_ops(C, scratch)
        X3, Y3, Z3 = _dbl_body(ops, ops.read(x1), ops.read(y1),
                               ops.read(z1))
        ops.write(ox, X3)
        ops.write(oy, Y3)
        ops.write(oz, Z3)

    rows = _use_rows(k)
    return lambda coords: _pallas_call3(kern, k, 3, coords, rows)


@functools.lru_cache(maxsize=None)
def _build_dbln_add(curve_key, k, ndbl):
    """Fused acc' = 2^ndbl * acc + T — the whole windowed-mult scan step
    as ONE kernel. The accumulator and every intermediate live in VMEM
    across all ndbl+1 formulas; the XLA formulation round-trips the
    accumulator (and each formula's outputs) through HBM per point op,
    which dominates the scan cost."""
    from ...curves import params
    curve = params.get_curve(curve_key)
    C = _curve_consts(curve)

    def kern(x1, y1, z1, x2, y2, z2, ox, oy, oz, *scratch):
        ops = _make_ops(C, scratch)
        X, Y, Z = _dbln_jac_block(ops, ops.read(x1), ops.read(y1),
                                  ops.read(z1), ndbl)
        X3, Y3, Z3 = _add_body(ops, X, Y, Z, ops.read(x2), ops.read(y2),
                               ops.read(z2))
        ops.write(ox, X3)
        ops.write(oy, Y3)
        ops.write(oz, Z3)

    rows = _use_rows(k)
    return lambda coords: _pallas_call3(kern, k, 6, coords, rows)


def supported(curve, P) -> bool:
    # tile kernels implement the 15-bit sequence only; rows handles both
    return (P.x.ndim == 2 and P.x.shape[-1] % BLOCK == 0
            and (nn.LIMB_BITS == 15 or _use_rows(curve.fp_ctx.k))
            and curve.fp_ctx.k <= MAX_PALLAS_LIMBS
            and getattr(curve.fp_ctx, "relaxed_ok", False))


def point_add(curve, P, Q):
    call = _build_add(curve.name, curve.fp_ctx.k)
    x, y, z = call((P.x, P.y, P.z, Q.x, Q.y, Q.z))
    return type(P)(x, y, z)


def point_dbl(curve, P):
    call = _build_dbl(curve.name, curve.fp_ctx.k)
    x, y, z = call((P.x, P.y, P.z))
    return type(P)(x, y, z)


def point_dbln_add(curve, P, Q, ndbl: int):
    call = _build_dbln_add(curve.name, curve.fp_ctx.k, ndbl)
    x, y, z = call((P.x, P.y, P.z, Q.x, Q.y, Q.z))
    return type(P)(x, y, z)
