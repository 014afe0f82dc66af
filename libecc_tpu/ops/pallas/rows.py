"""Row-vectorized Pallas field ops — O(K) Mosaic instructions per multiply.

The tile-list kernels (mont.py / point.py) fully unroll the K^2 limb
products into scalar-tile ops; Mosaic compile time grows superlinearly in
instruction count (~4 min at K=20, >85 min at K=37), which is why the
fused kernels were capped at K<=30 and the 512-bit curves (BrainpoolP512,
GOST-512) and Ed448 fell back to the HBM-bound XLA path.

This backend expresses the SAME relaxed Montgomery math (nn/core.py
mont_mul_relaxed; reference algorithm: src/nn/nn_mul_redc1.c CIOS) in
operand-scanning order over whole (K, S, L) limb arrays:

    for each row i:  t[i : i+K+1] += lo(a_i * b) ++ hi(a_i * b)

Each row is ~7 multi-tile vector ops, so a full Montgomery multiply is
~25*K Mosaic instructions instead of ~5*K^2 scalar-tile instructions —
30x fewer at K=37 — while the executed VPU work is identical. Column
sums are identical integers (u32 adds are exact, all columns < 2^23), so
results are bit-identical to both the tile-list kernels and the XLA path;
differential tests compare all three lane-for-lane.

Layout contract is shared with mont.py: values are (K, S, L) uint32
relaxed limb arrays; one (2K, S, L) column scratch and one (K+1, S, L)
truncated-product scratch are reused by every multiply in a fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ...nn import core as nn
from .mont import SUBLANES, LANES

LIMB_BITS = nn.LIMB_BITS
LIMB_MASK = np.uint32((1 << LIMB_BITS) - 1)


def relax_arr(a):
    """Vectorized relax_once on a (K, S, L) array (top carry dropped):
    out = (a & M) + shift_up(a >> 15). 3 vector ops, no carry chain."""
    lo = a & LIMB_MASK
    hi = a >> LIMB_BITS
    pad = ((1, 0),) + ((0, 0),) * (a.ndim - 1)
    return lo + jnp.pad(hi, pad)[:-1]


def _seg(p):
    """Row contribution (K+1, S, L): lo parts at offsets 0..K-1, hi parts
    at 1..K (the i+j / i+j+1 column split of _mul_cols)."""
    lo = p & LIMB_MASK
    hi = p >> LIMB_BITS
    z = ((0, 0),) * (p.ndim - 1)
    return jnp.pad(lo, ((0, 1),) + z) + jnp.pad(hi, ((1, 0),) + z)


def _accum_full(t_ref, a, b_arr, k):
    """t_ref[2K] += column products of a (K,S,L) with b_arr ((K,S,L) array
    or (K,1,1) constant)."""
    for i in range(k):
        s = _seg(a[i][None] * b_arr)
        sl = (pl.ds(i, k + 1), slice(None), slice(None))
        t_ref[sl] = t_ref[sl] + s


def _accum_tri(m_ref, a, c_arr, k, iota):
    """m_ref[K+1] += truncated column products (columns < K only; the hi
    part landing exactly at column K is kept and discarded by the [:K]
    read, matching _mul_cols(...)[:k])."""
    for i in range(k):
        p = a[i][None] * c_arr
        p = jnp.where(iota < (k - i), p, jnp.uint32(0))
        s = _seg(p)[: k + 1 - i]
        sl = (pl.ds(i, k + 1 - i), slice(None), slice(None))
        m_ref[sl] = m_ref[sl] + s


def _accum_full_raw(t_ref, a, b_arr, k):
    """RAW accumulation (13-bit mode): whole u32 products, no lo/hi split
    — row i contributes only to columns [i, i+K)."""
    for i in range(k):
        s = a[i][None] * b_arr
        sl = (pl.ds(i, k), slice(None), slice(None))
        t_ref[sl] = t_ref[sl] + s


def _accum_tri_raw(m_ref, a, c_arr, k, iota):
    """RAW truncated accumulation: only columns < K (pairs i+j < K)."""
    for i in range(k):
        p = a[i][None] * c_arr
        p = jnp.where(iota < (k - i), p, jnp.uint32(0))
        s = p[: k - i]
        sl = (pl.ds(i, k - i), slice(None), slice(None))
        m_ref[sl] = m_ref[sl] + s


def _carry_raw_arr(s_lo):
    """In-kernel mirror of nn.core._carry_raw (13-bit mode): exact
    value/R of an R-divisible raw low half."""
    k = s_lo.shape[0]
    lo = s_lo & LIMB_MASK
    hi = s_lo >> LIMB_BITS

    def f(x):
        return x.astype(jnp.int32).astype(jnp.float32)

    acc = f(hi[k - 1])
    for d in range(1, 4):
        term = lo[k - d]
        if k - d - 1 >= 0:
            term = term + hi[k - d - 1]
        acc = acc + f(term) * np.float32(2.0 ** (-LIMB_BITS * d))
    return jnp.rint(acc).astype(jnp.int32).astype(jnp.uint32)


def _f32_carry3(s3):
    """Exact carry of the R-divisible low half from its top 3 columns
    (s3 = s[k-3:k]); same exactly-rounded f32 dot as nn.core._f32_carry.
    Mosaic lacks u32->f32; columns < 2^23 so the i32 detour is exact."""
    f = s3.astype(jnp.int32).astype(jnp.float32)
    acc = (f[2] * np.float32(2.0 ** -LIMB_BITS)
           + f[1] * np.float32(2.0 ** (-2 * LIMB_BITS))
           + f[0] * np.float32(2.0 ** (-3 * LIMB_BITS)))
    return jnp.rint(acc).astype(jnp.int32).astype(jnp.uint32)


class RowOps:
    """Field-op set over (K, S, L) relaxed limb arrays for use inside a
    Pallas kernel. `t_ref` (2K,S,L) and `m_ref` (K+1,S,L) are VMEM
    scratch shared (sequentially) by every multiply."""

    def __init__(self, C, t_ref, m_ref):
        self.C = C
        k = self.k = C["k"]
        self.t_ref = t_ref
        self.m_ref = m_ref
        self._p = self.const(C["p"])
        self._pinv = self.const(C["pinv"])
        self._c0 = self.const(C["sub_c0"])
        self._cc = jnp.uint32(C["sub_cc"])
        self._iota = jax.lax.broadcasted_iota(
            jnp.int32, (k, SUBLANES, LANES), 0)
        self._kc_mask = self._iota < C["sub_kc"]

    def const(self, limbs):
        """Full-shape (K,S,L) constant assembled from scalar splats —
        Pallas kernels may capture scalars but not array constants, and
        Mosaic can lower neither the 1-D -> 3-D reshape of a stacked
        vector nor a (K,1,1) -> (K,S,L) broadcast ('Broadcast in both
        sublanes and lanes'), so each limb is a (1,S,L) splat."""
        return jnp.concatenate(
            [jnp.full((1, SUBLANES, LANES), np.uint32(int(v)))
             for v in limbs], axis=0)

    def _redc(self):
        """Shared Montgomery-reduction tail: t_ref holds the 2K product
        columns; adds m*p, resolves the cross-boundary carry, returns the
        relaxed high half."""
        k, t_ref, m_ref = self.k, self.t_ref, self.m_ref
        t_lo_r = relax_arr(t_ref[pl.ds(0, k), :, :])
        m_ref[...] = jnp.zeros((k + 1,) + t_lo_r.shape[1:], jnp.uint32)
        _accum_tri(m_ref, t_lo_r, self._pinv, k, self._iota)
        m = relax_arr(m_ref[pl.ds(0, k), :, :])
        _accum_full(t_ref, m, self._p, k)          # t += u = m*p -> s
        s = t_ref[...]
        carry = _f32_carry3(s[k - 3: k])
        hi = s[k:]
        hi = jnp.concatenate([hi[:1] + carry, hi[1:]], 0)
        return relax_arr(hi)

    def _redc_raw(self):
        """13-bit raw-mode reduction tail — mirrors the RAW_COLS branch of
        nn.core.mont_mul_relaxed exactly (t_ref holds the raw columns)."""
        k, t_ref, m_ref = self.k, self.t_ref, self.m_ref
        t_ref[...] = relax_arr(t_ref[...])         # exact value, cols small
        t_lo2 = relax_arr(t_ref[pl.ds(0, k), :, :])
        m_ref[...] = jnp.zeros((k + 1,) + t_lo2.shape[1:], jnp.uint32)
        _accum_tri_raw(m_ref, t_lo2, self._pinv, k, self._iota)
        m = relax_arr(relax_arr(m_ref[pl.ds(0, k), :, :]))
        _accum_full_raw(t_ref, m, self._p, k)      # t += u = m*p -> s
        s = t_ref[...]
        carry = _carry_raw_arr(s[:k])
        hi = s[k:]
        hi = jnp.concatenate([hi[:1] + carry, hi[1:]], 0)
        return relax_arr(relax_arr(hi))

    def mul(self, a, b):
        """Relaxed Montgomery product; bit-identical to
        nn.core.mont_mul_relaxed / point.py _fmul."""
        k = self.k
        ar = relax_arr(a)
        br = ar if b is a else relax_arr(b)
        self.t_ref[...] = jnp.zeros((2 * k,) + a.shape[1:], jnp.uint32)
        if nn.RAW_COLS:
            _accum_full_raw(self.t_ref, ar, br, k)
            return self._redc_raw()
        _accum_full(self.t_ref, ar, br, k)
        return self._redc()

    def sqr(self, a):
        """Relaxed Montgomery SQUARING — Comba-squaring row accumulation
        (row i multiplies only the j >= i tail, off-diagonals doubled:
        k(k+1)/2 products). Column values identical to
        nn.core._sqr_columns / point.py _fsqr; 13-bit raw mode falls back
        to the generic product (no squaring variant there)."""
        if nn.RAW_COLS:
            return self.mul(a, a)
        k = self.k
        ar = relax_arr(a)
        self.t_ref[...] = jnp.zeros((2 * k,) + a.shape[1:], jnp.uint32)
        for i in range(k):
            head = (ar[i] * ar[i])[None]               # (1, S, L)
            if i + 1 < k:
                rest = ar[i][None] * ar[i + 1:]
                row = jnp.concatenate([head, rest + rest], 0)
            else:
                row = head
            s = _seg(row)                              # (k-i+1, S, L)
            sl = (pl.ds(2 * i, k - i + 1), slice(None), slice(None))
            self.t_ref[sl] = self.t_ref[sl] + s
        return self._redc()

    def mc(self, a, c_limbs):
        """Montgomery product with a constant (Montgomery-domain limbs)."""
        k = self.k
        ar = relax_arr(a)
        self.t_ref[...] = jnp.zeros((2 * k,) + a.shape[1:], jnp.uint32)
        if nn.RAW_COLS:
            _accum_full_raw(self.t_ref, ar, self.const(c_limbs), k)
            return self._redc_raw()
        _accum_full(self.t_ref, ar, self.const(c_limbs), k)
        return self._redc()

    def ad(self, a, b):
        return a + b

    def sb(self, a, b):
        """mod_sub_relaxed complement trick, vectorized: one where + two
        adds (nn.core.mod_sub_relaxed)."""
        comp = jnp.where(self._kc_mask, self._cc - b, jnp.uint32(0))
        return a + comp + self._c0

    def relax(self, a):
        return relax_arr(a)
