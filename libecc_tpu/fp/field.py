"""Prime-field layer: FpCtx + batched field ops (Montgomery domain).

TPU-native analog of the reference fp layer (src/fp/fp.c, fp_add.c,
fp_mul.c, fp_montgomery.c, fp_pow.c, fp_sqrt.c). A field element batch
is a uint32[K, *batch] limb tensor in the Montgomery domain; the FpCtx
carries host-computed constants (p, r, r2, mpinv — the same set the
reference precomputes per curve in src/curves/known/*.h).

All curve formulas consume the *_monty API exclusively, mirroring
fp_montgomery.c:26-82.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn import core as nn
from ..nn.core import MontCtx, LIMB_BITS


class FpCtx(MontCtx):
    """Field context for GF(p). Extends MontCtx with square-root machinery
    (Tonelli-Shanks constants; reference: src/fp/fp_sqrt.c:26-107).

    Field contexts allocate 2 headroom limbs beyond the prime's width so the
    relaxed (carry-free) arithmetic invariants hold (see nn.core relaxed
    section): R/p >= 2^25.
    """

    HEADROOM_LIMBS = 2

    def __init__(self, p: int, k: int | None = None):
        if k is None:
            k = nn.num_limbs(p.bit_length()) + self.HEADROOM_LIMBS
        super().__init__(p, k)
        # Decompose p - 1 = q * 2^s for Tonelli-Shanks
        s, q = 0, p - 1
        while q % 2 == 0:
            q //= 2
            s += 1
        self.ts_s = s
        self.ts_q = q
        # smallest quadratic non-residue (host search, public constant)
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        self.ts_z = z

    # -- element constructors -------------------------------------------------

    def const(self, x: int, like=None, batch_shape=()):
        """Host int -> Montgomery-domain constant limb tensor."""
        xm = (x % self.p_int) * self.R % self.p_int
        arr = jnp.asarray(nn.to_limbs(xm, self.k))
        if like is not None:
            batch_shape = like.shape[1:]
        return jnp.broadcast_to(arr.reshape((self.k,) + (1,) * len(batch_shape)),
                                (self.k,) + tuple(batch_shape))

    def zero(self, like=None, batch_shape=()):
        if like is not None:
            batch_shape = like.shape[1:]
        return jnp.zeros((self.k,) + tuple(batch_shape), jnp.uint32)

    def one(self, like=None, batch_shape=()):
        return self.const(1, like, batch_shape)

    def from_ints(self, xs, to_mont=True):
        """Host list[int] (or single int) -> device batch in Montgomery form."""
        single = isinstance(xs, int)
        if single:
            xs = [xs]
        if to_mont:
            xs = [x % self.p_int * self.R % self.p_int for x in xs]
        a = nn.batch_to_limbs(xs, self.k)
        return jnp.asarray(a[:, 0] if single else a)

    def to_ints(self, a, from_mont=True):
        """Device batch (Montgomery form, possibly relaxed) -> host list[int]."""
        a = np.asarray(nn.canonicalize(jnp.asarray(a), self))
        if a.ndim == 1:
            a = a[:, None]
        vals = nn.batch_from_limbs(a)
        if from_mont:
            rinv = pow(self.R, -1, self.p_int)
            vals = [v * rinv % self.p_int for v in vals]
        return vals


# -- Montgomery-domain ops (the *_monty API, fp_montgomery.c) -----------------
# All ops are RELAXED (carry-free limb reps; see nn.core): one vector add for
# +, a complement trick for -, chain-free Montgomery multiplies. Values are
# only canonicalized at boundaries (eq/export/is_zero).

def add(a, b, ctx: FpCtx):
    return nn.mod_add_relaxed(a, b)


def sub(a, b, ctx: FpCtx):
    return nn.mod_sub_relaxed(a, b, ctx)


def neg(a, ctx: FpCtx):
    return nn.mod_neg_relaxed(a, ctx)


def mul(a, b, ctx: FpCtx):
    from ..config import use_pallas
    if use_pallas() and a.shape == b.shape:
        from ..ops.pallas import mont as pmont
        if pmont.supported(ctx, a.shape):
            return pmont.mont_mul_relaxed(a, b, ctx)
    return nn.mont_mul_relaxed(a, b, ctx)


def sqr(a, ctx: FpCtx):
    from ..config import use_pallas
    if use_pallas():
        from ..ops.pallas import mont as pmont
        if pmont.supported(ctx, a.shape):
            return pmont.mont_sqr_relaxed(a, ctx)
    return nn.mont_sqr_relaxed(a, ctx)


def canon(a, ctx: FpCtx):
    """Relaxed -> canonical (exact limbs, value < p)."""
    return nn.canonicalize(a, ctx)


def pow_static(a, e: int, ctx: FpCtx):
    """a^e (Montgomery domain, relaxed) with static public exponent.
    Square-and-multiply via lax.scan over host-known bits."""
    if e == 0:
        return ctx.one(like=a)
    import jax
    nbits = e.bit_length()
    bits = np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                    dtype=np.uint32)

    def body(acc, bit):
        acc = sqr(acc, ctx)
        acc_m = mul(acc, a, ctx)
        return jnp.where(bit.astype(bool), acc_m, acc), None

    acc, _ = jax.lax.scan(body, a, jnp.asarray(bits[1:]))
    return acc


def inv(a, ctx: FpCtx):
    """Constant-schedule Fermat inverse (input/output Montgomery form).
    Returns 0 for input 0 (since 0^(p-2) = 0) — callers mask separately.
    Reference: fp_inv -> nn_modinv (src/fp/fp_mul.c:51); we use the Fermat
    path (src/nn/nn_modinv.c:504) which is branch-free and batchable."""
    return pow_static(a, ctx.p_int - 2, ctx)


def div(a, b, ctx: FpCtx):
    return mul(a, inv(b, ctx), ctx)


def eq_mask(a, b, ctx: FpCtx = None):
    """Lanewise equality. For relaxed reps a field ctx must be supplied so
    both sides are canonicalized first."""
    if ctx is not None:
        a = nn.canonicalize(a, ctx)
        b = nn.canonicalize(b, ctx)
    return nn.eq_mask(a, b)


def is_zero_mask(a, ctx: FpCtx = None):
    if ctx is not None:
        a = nn.canonicalize(a, ctx)
    return nn.is_zero_mask(a)


def select(cond, a, b):
    return nn.cnd_select(cond, a, b)


def legendre_qr_mask(a, ctx: FpCtx):
    """Quadratic-residue lane mask: True iff a is a QR mod p (or a == 0).
    a in Montgomery form."""
    ls = pow_static(a, (ctx.p_int - 1) // 2, ctx)  # in {1, p-1} (Mont form)
    one = ctx.const(1, like=a)
    return eq_mask(ls, one, ctx) | is_zero_mask(a, ctx)


def sqrt(a, ctx: FpCtx):
    """Batched Tonelli-Shanks square root (Montgomery domain).

    Returns (root, exists_mask). For lanes where a is a non-residue the
    root value is garbage and exists_mask is False. Fixed iteration bound
    ts_s (data-independent schedule; the reference's data-dependent loop
    fp_sqrt.c:107 becomes mask-and-continue).

    Fast path p % 4 == 3: sqrt = a^((p+1)/4).
    """
    p = ctx.p_int
    if p % 4 == 3:
        r = pow_static(a, (p + 1) // 4, ctx)
        ok = eq_mask(sqr(r, ctx), a, ctx)
        return r, ok

    if p % 8 == 5:
        # Atkin: r = a^((p+3)/8); fix by sqrt(-1) = 2^((p-1)/4) if needed
        r = pow_static(a, (p + 3) // 8, ctx)
        sqrtm1 = ctx.const(pow(2, (p - 1) // 4, p), like=a)
        fix = ~eq_mask(sqr(r, ctx), a, ctx)
        r = select(fix, mul(r, sqrtm1, ctx), r)
        ok = eq_mask(sqr(r, ctx), a, ctx)
        z0 = is_zero_mask(a, ctx)
        return select(z0, ctx.zero(like=a), r), ok | z0

    # general Tonelli-Shanks with fixed bound
    s, q, z = ctx.ts_s, ctx.ts_q, ctx.ts_z
    c = ctx.const(pow(z, q, p), like=a)           # z^q, Mont form
    t = pow_static(a, q, ctx)                      # a^q
    r = pow_static(a, (q + 1) // 2, ctx)           # a^((q+1)/2)
    one = ctx.const(1, like=a)

    # Standard batched TS: maintain (t, r, c, m). Because m is per-lane we
    # express each iteration with masks. Number of outer iterations <= s.
    # t2 chain: find i = ord2(t): compute squares t, t^2, t^4, ... t^(2^(s-1))
    # and pick the first equal to one — done per outer iteration.
    def ord2_lt_mask(t):
        # returns for each lane the exponent i (as int32) such that
        # t^(2^i) == 1, scanning a fixed s levels (i in [0, s]).
        cur = t
        i_found = jnp.full(t.shape[1:], s, jnp.int32)
        for i in range(s):
            is1 = eq_mask(cur, one, ctx)
            i_found = jnp.where((i_found == s) & is1, i, i_found)
            cur = sqr(cur, ctx)
        return i_found

    m = jnp.full(a.shape[1:], s, jnp.int32)
    for _ in range(s):
        i = ord2_lt_mask(t)
        done = (i == 0)
        # b = c^(2^(m-i-1)): square c (m-i-1) times — do s fixed squarings
        # with masked stop.
        b = c
        cnt = m - i - 1
        for j in range(s):
            b_next = sqr(b, ctx)
            b = select(jnp.int32(j) < cnt, b_next, b)
        r_new = mul(r, b, ctx)
        b2 = sqr(b, ctx)
        c_new = b2
        t_new = mul(t, b2, ctx)
        upd = ~done
        r = select(upd, r_new, r)
        c = select(upd, c_new, c)
        t = select(upd, t_new, t)
        m = jnp.where(upd, i, m)
    ok = eq_mask(sqr(r, ctx), a, ctx)
    # a == 0 -> sqrt 0
    z0 = is_zero_mask(a, ctx)
    r = select(z0, ctx.zero(like=a), r)
    ok = ok | z0
    return r, ok
