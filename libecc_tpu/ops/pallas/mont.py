"""Fused Pallas TPU kernel for the relaxed Montgomery multiply.

Why: the XLA formulation of mont_mul_relaxed (nn/core.py) materializes
the (Ka, Kb, N) limb-product tensor in HBM — ~15-20 MB of traffic per
multiply at batch 2048 vs ~0.5 MB of actual input/output. That makes the
field multiply (and therefore every curve op) memory-bound at ~70 us
instead of the ~5-15 us VPU compute bound. This kernel keeps all
intermediates in VMEM/registers: inputs are (K, S, 128) u32 blocks
(batch in sublanes x lanes so every limb row is a full VPU tile), the
K^2 product/column accumulation is fully unrolled, and only the (K,S,128)
result returns to HBM.

Math is bit-identical to nn.core.mont_mul_relaxed (same relaxation
invariants, same float32 exact-carry trick); differential tests compare
the two paths lane-for-lane.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...nn import core as nn

LIMB_BITS = nn.LIMB_BITS
LIMB_MASK = np.uint32((1 << LIMB_BITS) - 1)

# batch tile: SUBLANES x 128 lanes per grid step
SUBLANES = 8
LANES = 128
import os as _os
# K cap for the Pallas path overall. Tile-list kernels run up to
# point.UNROLLED_MAX_K (30); beyond that the row-vectorized backend
# (rows.py) takes over, whose Mosaic instruction count is O(K).
# Hardware-validated on v5e (round 4): BrainpoolP512 (K=37) sign/verify
# correct on the rows kernels and 33x the XLA path's throughput
# (27.1k vs 0.8k verifies/s), so the 512-bit curves and Ed448 ride
# fused kernels by default.
MAX_PALLAS_LIMBS = int(_os.environ.get("LIBECC_TPU_PALLAS_MAX_K", "48"))
BLOCK = SUBLANES * LANES


def _interp() -> bool:
    """Run pallas_call in interpreter mode (CPU differential testing)."""
    return _os.environ.get("LIBECC_TPU_PALLAS_INTERPRET", "0") == "1"


def _relax(limbs):
    """relax_once on a python list of (S, L) tiles, dropping top carry."""
    out = []
    carry = None
    for x in limbs:
        lo = x & LIMB_MASK
        out.append(lo if carry is None else lo + carry)
        carry = x >> LIMB_BITS
    return out


def _mul_cols(a, b):
    """Column products of two lists of tiles -> list of 2K tiles,
    cols[k] = sum_{i+j=k} lo(a_i b_j) + sum_{i+j=k-1} hi(a_i b_j)."""
    ka, kb = len(a), len(b)
    cols = [None] * (ka + kb)

    def acc(idx, v):
        cols[idx] = v if cols[idx] is None else cols[idx] + v

    for i in range(ka):
        for j in range(kb):
            prod = a[i] * b[j]
            acc(i + j, prod & LIMB_MASK)
            acc(i + j + 1, prod >> LIMB_BITS)
    return [c if c is not None else jnp.zeros_like(a[0]) for c in cols]


def _mul_cols_const(a, const_limbs):
    """Column products with a constant (host int limbs) second operand."""
    ka = len(a)
    kb = len(const_limbs)
    cols = [None] * (ka + kb)

    def acc(idx, v):
        cols[idx] = v if cols[idx] is None else cols[idx] + v

    for j, cj in enumerate(const_limbs):
        if cj == 0:
            continue
        cval = jnp.uint32(cj)
        for i in range(ka):
            prod = a[i] * cval
            acc(i + j, prod & LIMB_MASK)
            acc(i + j + 1, prod >> LIMB_BITS)
    return [c if c is not None else jnp.zeros_like(a[0]) for c in cols]


def _f32(x):
    # Mosaic lacks a direct u32->f32 cast; values here are < 2^22 so a
    # detour through int32 is exact.
    return x.astype(jnp.int32).astype(jnp.float32)


def _f32_carry(cols_lo):
    k = len(cols_lo)
    acc = _f32(cols_lo[k - 1]) * np.float32(2.0 ** -LIMB_BITS)
    acc = acc + _f32(cols_lo[k - 2]) * np.float32(2.0 ** (-2 * LIMB_BITS))
    acc = acc + _f32(cols_lo[k - 3]) * np.float32(2.0 ** (-3 * LIMB_BITS))
    return jnp.rint(acc).astype(jnp.int32).astype(jnp.uint32)


def _mont_body_refs(ctx_p, ctx_pinv, k, ar_ref, br_ref, t_ref, m_ref,
                    square=False):
    """Core Montgomery product over VMEM refs, Comba (column) order so at
    most ~4 tiles are live at a time (heavy live sets make Mosaic spill).

    ar_ref/br_ref: relaxed inputs (k,S,L); t_ref: (2k,S,L) scratch;
    m_ref: (k,S,L) scratch. Returns the k output tiles (relaxed rep).

    square=True runs the Comba-SQUARING phase 1: off-diagonal limb
    products formed once and doubled (2p < 2^31.1, exact) — k(k+1)/2
    VPU multiplies instead of k^2. Column values match
    nn.core._sqr_columns limb-for-limb."""
    # phase 1: t = a*b column products (lo of col k + hi of col k-1)
    hi_prev = None
    for kk in range(2 * k):
        acc = hi_prev
        hi_acc = None
        lo_t = max(0, kk - (k - 1))
        for i in range(lo_t, min(k, kk + 1)):
            j = kk - i
            if square:
                if i > j:
                    continue
                p = ar_ref[i] * ar_ref[j]
                if i < j:
                    p = p + p
            else:
                p = ar_ref[i] * br_ref[j]
            lo = p & LIMB_MASK
            acc = lo if acc is None else acc + lo
            h = p >> LIMB_BITS
            hi_acc = h if hi_acc is None else hi_acc + h
        t_ref[kk] = acc if acc is not None else jnp.zeros_like(ar_ref[0])
        hi_prev = hi_acc
    # phase 2: m = relax( relax(t[:k]) * pinv mod R )
    # relax(t[:k]) in place of a temp: read t, relax serially
    carry = None
    for i in range(k):
        x = t_ref[i]
        lo = x & LIMB_MASK
        m_ref[i] = lo if carry is None else lo + carry
        carry = x >> LIMB_BITS
    hi_prev = None
    out_cols = []
    for kk in range(k):          # truncated product: cols < k only
        acc = hi_prev
        hi_acc = None
        for j, cj in enumerate(ctx_pinv[: kk + 1]):
            if cj == 0:
                continue
            p = m_ref[kk - j] * jnp.uint32(cj)
            lo = p & LIMB_MASK
            acc = lo if acc is None else acc + lo
            h = p >> LIMB_BITS
            hi_acc = h if hi_acc is None else hi_acc + h
        out_cols.append(acc if acc is not None
                        else jnp.zeros_like(m_ref[0]))
        hi_prev = hi_acc
    # relax m into m_ref
    carry = None
    for i in range(k):
        x = out_cols[i]
        lo = x & LIMB_MASK
        m_ref[i] = lo if carry is None else lo + carry
        carry = x >> LIMB_BITS
    # phase 3: u = m*p, computed column-serially from col k-4 upward with
    # the hi parts carried forward (each product multiplied exactly once).
    # Columns below k-4 are never needed: only the top-3 low columns feed
    # the exactly-rounded f32 carry (their truncation error is the
    # documented < 2^-19 tail), and the high half starts at col k.
    start = k - 4
    hi_prev = None
    s_top = []
    out = []
    carry = None
    c2 = None
    for kk in range(start, 2 * k):
        acc = hi_prev
        hi_acc = None
        for j, cj in enumerate(ctx_p):
            i = kk - j
            if i < 0 or i >= k or cj == 0:
                continue
            p = m_ref[i] * jnp.uint32(cj)
            lo = p & LIMB_MASK
            acc = lo if acc is None else acc + lo
            h = p >> LIMB_BITS
            hi_acc = h if hi_acc is None else hi_acc + h
        hi_prev = hi_acc
        if kk < k - 3:
            continue                      # only its hi carry is needed
        uc = acc
        if kk < k:
            s_top.append(t_ref[kk] + uc if uc is not None else t_ref[kk])
            if kk == k - 1:
                carry = _f32_carry_top3(s_top)
            continue
        h = t_ref[kk] if uc is None else t_ref[kk] + uc
        if kk == k:
            h = h + carry
        lo = h & LIMB_MASK
        out.append(lo if c2 is None else lo + c2)
        c2 = h >> LIMB_BITS
    return out


def _f32_carry_top3(tops):
    """Exact carry from the top 3 low-half columns (values div. by R)."""
    acc = _f32(tops[2]) * np.float32(2.0 ** -LIMB_BITS)
    acc = acc + _f32(tops[1]) * np.float32(2.0 ** (-2 * LIMB_BITS))
    acc = acc + _f32(tops[0]) * np.float32(2.0 ** (-3 * LIMB_BITS))
    return jnp.rint(acc).astype(jnp.int32).astype(jnp.uint32)


def _mont_kernel(ctx_p, ctx_pinv, k, a_ref, *rest):
    """o = mont_mul_relaxed(a, b). Ref order per pallas_call:
    inputs (a[, b]), output o, then scratch (ar, br, t, m)."""
    if len(rest) == 5:      # squaring: b = a
        o_ref, ar_ref, br_ref, t_ref, m_ref = rest
        b_ref = a_ref
    else:
        b_ref, o_ref, ar_ref, br_ref, t_ref, m_ref = rest
    # relax inputs into scratch
    carry = None
    for i in range(k):
        x = a_ref[i]
        lo = x & LIMB_MASK
        ar_ref[i] = lo if carry is None else lo + carry
        carry = x >> LIMB_BITS
    square = b_ref is a_ref
    if not square:
        carry = None
        for i in range(k):
            x = b_ref[i]
            lo = x & LIMB_MASK
            br_ref[i] = lo if carry is None else lo + carry
            carry = x >> LIMB_BITS
    out = _mont_body_refs(ctx_p, ctx_pinv, k, ar_ref, br_ref, t_ref, m_ref,
                          square=square)
    for i in range(k):
        o_ref[i] = out[i]


@functools.lru_cache(maxsize=None)
def _build(p_int: int, k: int, square: bool):
    ctx = nn.MontCtx(p_int, k)
    p_limbs = tuple(int(v) for v in ctx.p)
    pinv_limbs = tuple(int(v) for v in ctx.pinv_full)
    from .point import _use_rows, _row_scratch
    rows_mode = _use_rows(k)
    if rows_mode:
        from .rows import RowOps
        C = dict(k=k, p=p_limbs, pinv=pinv_limbs,
                 sub_kc=int(ctx.sub_kc), sub_cc=int(ctx.sub_cc),
                 sub_c0=tuple(int(v) for v in ctx.sub_c0))

        def kern(a_ref, *rest):
            if square:
                o_ref, t_ref, m_ref = rest
            else:
                b_ref, o_ref, t_ref, m_ref = rest
            ops = RowOps(C, t_ref, m_ref)
            a = a_ref[...]
            o_ref[...] = ops.sqr(a) if square else ops.mul(a, b_ref[...])
        scratch = _row_scratch(k)
    else:
        kern = functools.partial(_mont_kernel, p_limbs, pinv_limbs, k)
        scratch = [
            pltpu.VMEM((k, SUBLANES, LANES), jnp.uint32),      # ar
            pltpu.VMEM((k, SUBLANES, LANES), jnp.uint32),      # br
            pltpu.VMEM((2 * k, SUBLANES, LANES), jnp.uint32),  # t
            pltpu.VMEM((k, SUBLANES, LANES), jnp.uint32),      # m
        ]

    def call(a, b=None):
        # a, b: (k, N) u32 with N % BLOCK == 0
        n = a.shape[-1]
        g = n // BLOCK
        a3 = a.reshape(k, n // LANES, LANES)
        spec = pl.BlockSpec((k, SUBLANES, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        args = (a3,) if square else (a3, b.reshape(k, n // LANES, LANES))
        out = pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[spec] * len(args),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((k, n // LANES, LANES),
                                           jnp.uint32),
            scratch_shapes=scratch,
            interpret=_interp(),
        )(*args)
        return out.reshape(k, n)

    return call


def supported(ctx, shape) -> bool:
    """Kernel applicability: 2-D (K, N) batches, N % 1024 == 0, and a
    relaxed-capable context."""
    from .point import _use_rows
    # tile kernels implement the 15-bit sequence only; rows handles both
    return (len(shape) == 2 and shape[-1] % BLOCK == 0
            and (nn.LIMB_BITS == 15 or _use_rows(ctx.k))
            and ctx.k <= MAX_PALLAS_LIMBS
            and getattr(ctx, "relaxed_ok", False))


def mont_mul_relaxed(a, b, ctx) -> jnp.ndarray:
    """Drop-in fused replacement for nn.mont_mul_relaxed."""
    return _build(ctx.p_int, ctx.k, False)(a, b)


def mont_sqr_relaxed(a, ctx) -> jnp.ndarray:
    return _build(ctx.p_int, ctx.k, True)(a)
