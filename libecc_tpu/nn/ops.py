"""Batched NN operations beyond the field hot path: general division,
binary GCD/XGCD, general modular inverse, logical ops.

Reference parity: src/nn/nn_div.c (nn_divrem :968, nn_mod :1005, nn_gcd
:1234, nn_xgcd :1179), nn_modinv.c (nn_modinv :220, nn_modinv_2exp :308,
nn_modinv_word :411), nn_logical.c (shifts/rotations/bitwise :37-541).

Design: these are *cold-path* utilities (key import, examples tier,
arbitrary-modulus reductions) — correctness and batchability over raw
speed. Every loop is a fixed-bound lax.scan/fori with lane masks instead
of data-dependent exits (the reference's word-serial loops don't batch).
The field hot path uses the Montgomery machinery in nn.core instead
(reduce_wide replaces reciprocal division for all in-library uses).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import core as nn
from .core import LIMB_BITS, LIMB_MASK, U32, _unstack, _stack


# ---------------------------------------------------------------------------
# Logical ops (nn_logical.c)
# ---------------------------------------------------------------------------

def lshift(a, n: int, k_out: int | None = None):
    """Static left shift by n bits; output widened to k_out limbs
    (default: same width, truncating like nn_lshift_fixedlen)."""
    k = a.shape[0]
    k_out = k_out or k
    ln, lb = n // LIMB_BITS, n % LIMB_BITS
    al = _unstack(a)
    z = jnp.zeros_like(al[0])
    out = []
    for i in range(k_out):
        src = i - ln
        lo = al[src] << lb if 0 <= src < k else z
        hi = al[src - 1] >> (LIMB_BITS - lb) if lb and 0 <= src - 1 < k else z
        out.append((lo | hi) & LIMB_MASK)
    return _stack(out)


def bitwise_xor(a, b):
    return a ^ b


def bitwise_or(a, b):
    return a | b


def bitwise_and(a, b):
    return a & b


def bitwise_not(a):
    """Complement within the K-limb width (nn_not)."""
    return (~a) & LIMB_MASK


def rotate_left(a, n: int, bitlen: int):
    """Rotate the low `bitlen` bits left by n (nn_lrot semantics)."""
    n %= bitlen
    lo = nn.truncate_bits(lshift(a, n), bitlen)
    hi = nn.rshift(a, bitlen - n)
    return lo | hi


def rotate_right(a, n: int, bitlen: int):
    return rotate_left(a, (bitlen - n) % bitlen, bitlen)


def bitlen_lanes(a):
    """Lanewise bit length -> int32[batch] (nn_bitlen)."""
    k = a.shape[0]
    pows = jnp.asarray((2 ** np.arange(LIMB_BITS + 1)).astype(np.uint32))
    pows = pows.reshape((LIMB_BITS + 1,) + (1,) * (a.ndim - 1))
    out = jnp.zeros(a.shape[1:], jnp.int32)
    for i in range(k):
        limb = a[i]
        bl = jnp.sum(limb[None] >= pows, axis=0).astype(jnp.int32)
        out = jnp.where(limb > 0, i * LIMB_BITS + bl, out)
    return out


def clz_lanes(a, nbits: int | None = None):
    """Lanewise count-leading-zeros within nbits (nn_clz)."""
    if nbits is None:
        nbits = a.shape[0] * LIMB_BITS
    return nbits - bitlen_lanes(a)


def getbit_lanes(a, i: int):
    return nn.get_bit(a, i)


# ---------------------------------------------------------------------------
# General division: batched binary long division (nn_divrem / nn_mod).
# ---------------------------------------------------------------------------

def divrem(a, b, nbits: int | None = None):
    """Batched (q, r) with a = q*b + r, 0 <= r < b, lanewise.

    a: uint32[Ka, N]; b: uint32[Kb, N], b > 0 lanes (b == 0 lanes return
    q = 0, r = a). Fixed schedule of `nbits` compare-subtract steps
    (default: full width of a) — the batched analog of nn_divrem
    (src/nn/nn_div.c:968; that one is word-serial with a precomputed
    reciprocal, which does not lane-vectorize)."""
    ka = a.shape[0]
    if nbits is None:
        nbits = ka * LIMB_BITS
    kb = b.shape[0]
    # working copies in a-width (b widened)
    if kb < ka:
        b = jnp.concatenate(
            [b, jnp.zeros((ka - kb,) + b.shape[1:], U32)], 0)
    q = jnp.zeros_like(a)
    r = jnp.zeros_like(a)
    b_nz = ~nn.is_zero_mask(b)

    def step(carry, i):
        q, r = carry
        # r = (r << 1) | bit_i(a)   with i running MSB -> LSB
        bit = _dyn_get_bit(a, i)
        r = _shl1_or(r, bit)
        ge = nn.geq_mask(r, b)
        r_sub, _ = nn.sub(r, b)
        r = nn.cnd_select(ge & b_nz, r_sub, r)
        q = _dyn_set_bit(q, i, ge & b_nz)
        return (q, r), None

    idxs = jnp.arange(nbits - 1, -1, -1, dtype=jnp.int32)
    (q, r), _ = jax.lax.scan(step, (q, r), idxs)
    r = nn.cnd_select(b_nz, r, a)
    q = nn.cnd_select(b_nz, q, jnp.zeros_like(q))
    return q, r


def _dyn_get_bit(a, i):
    """Bit i (traced int32) of each lane -> uint32[batch] in {0,1}."""
    limb_idx = (i // LIMB_BITS).astype(jnp.int32)
    sh = (i % LIMB_BITS).astype(jnp.uint32)
    sel = jax.lax.dynamic_index_in_dim(a, limb_idx, axis=0, keepdims=False)
    return (sel >> sh) & 1


def _dyn_set_bit(a, i, cond):
    limb_idx = (i // LIMB_BITS).astype(jnp.int32)
    sh = (i % LIMB_BITS).astype(jnp.uint32)
    limb = jax.lax.dynamic_index_in_dim(a, limb_idx, axis=0, keepdims=False)
    limb = jnp.where(cond, limb | (jnp.uint32(1) << sh), limb)
    return jax.lax.dynamic_update_index_in_dim(a, limb, limb_idx, axis=0)


def _shl1_or(a, bit):
    """(a << 1) | bit, limbwise (no widening; caller guarantees headroom)."""
    al = _unstack(a)
    out = []
    carry = bit.astype(U32)
    for i in range(len(al)):
        v = (al[i] << 1) | carry
        out.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return _stack(out)


def mod(a, b):
    """a mod b lanewise (nn_mod, src/nn/nn_div.c:1005)."""
    _, r = divrem(a, b)
    return r


# ---------------------------------------------------------------------------
# Binary GCD / XGCD / general modular inverse (nn_div.c:1179-1249,
# nn_modinv.c:220)
# ---------------------------------------------------------------------------

def gcd(a, b, nbits: int | None = None):
    """Batched binary GCD. Fixed 2*nbits iteration bound with lane masks
    (the reference's loop is data-dependent, nn_div.c:1234)."""
    k = max(a.shape[0], b.shape[0])
    if nbits is None:
        nbits = k * LIMB_BITS

    def widen(x):
        if x.shape[0] < k:
            return jnp.concatenate(
                [x, jnp.zeros((k - x.shape[0],) + x.shape[1:], U32)], 0)
        return x

    u, v = widen(a), widen(b)
    shift = jnp.zeros(a.shape[1:], jnp.int32)

    def step(carry, _):
        u, v, shift = carry
        u_z, v_z = nn.is_zero_mask(u), nn.is_zero_mask(v)
        done = u_z | v_z
        u_even = (u[0] & 1) == 0
        v_even = (v[0] & 1) == 0
        both_even = u_even & v_even & ~done
        u_half = nn.shift_right_bits(u, 1)
        v_half = nn.shift_right_bits(v, 1)
        # case: both even -> halve both, shift++
        u = nn.cnd_select(both_even | (u_even & ~done), u_half, u)
        v = nn.cnd_select(both_even | (v_even & ~u_even & ~done), v_half, v)
        shift = jnp.where(both_even, shift + 1, shift)
        # both odd: replace larger with (larger - smaller)/2
        u_odd_v_odd = ~u_even & ~v_even & ~done
        u_ge = nn.geq_mask(u, v)
        du, _ = nn.sub(u, v)
        dv, _ = nn.sub(v, u)
        u = nn.cnd_select(u_odd_v_odd & u_ge, nn.shift_right_bits(du, 1), u)
        v = nn.cnd_select(u_odd_v_odd & ~u_ge, nn.shift_right_bits(dv, 1), v)
        return (u, v, shift), None

    (u, v, shift), _ = jax.lax.scan(step, (u, v, shift),
                                    None, length=2 * nbits)
    g = nn.cnd_select(nn.is_zero_mask(u), v, u)
    # g <<= shift (lanewise variable shift): do it bit-serially, bounded
    max_shift = nbits

    def shl_step(carry, i):
        g = carry
        need = shift > i
        g2 = _shl1_or(g, jnp.zeros(g.shape[1:], U32))
        return nn.cnd_select(need, g2, g), None

    g, _ = jax.lax.scan(shl_step, g, jnp.arange(max_shift, dtype=jnp.int32))
    return g


def modinv(a, m, nbits: int | None = None):
    """Batched general modular inverse via the binary extended Euclid
    (works for any modulus m > 1 with gcd(a, m) == 1 — the reference's
    nn_modinv, nn_modinv.c:220; Fermat in nn.core covers prime moduli).

    Returns (inv, ok_mask): ok lanes where gcd(a, m) == 1 and m odd or a
    invertible. Fixed 2*nbits iterations.
    """
    k = max(a.shape[0], m.shape[0])
    if nbits is None:
        nbits = k * LIMB_BITS

    def widen(x):
        if x.shape[0] < k:
            return jnp.concatenate(
                [x, jnp.zeros((k - x.shape[0],) + x.shape[1:], U32)], 0)
        return x

    a, m = widen(a), widen(m)
    # binary xgcd maintaining  u*a ≡ x (mod m), v*a ≡ y (mod m)
    x, y = a, m
    u = _const_like(1, k, a)
    v = jnp.zeros_like(a)
    m_ctx_odd = (m[0] & 1) == 1   # algorithm requires odd modulus

    def half_mod(t, m):
        """t/2 mod m for odd m: t even -> t>>1 else (t+m)>>1 with carry."""
        t_even = (t[0] & 1) == 0
        t_half = nn.shift_right_bits(t, 1)
        tm, carry = nn.add(t, m)
        tm_half = nn.shift_right_bits(tm, 1)
        # restore the carry bit into the top limb
        top = tm_half[k - 1] | (carry.astype(U32) << (LIMB_BITS - 1))
        tm_half = tm_half.at[k - 1].set(top & LIMB_MASK)
        return nn.cnd_select(t_even, t_half, tm_half)

    def step(carry, _):
        x, y, u, v = carry
        x_z = nn.is_zero_mask(x)
        done = x_z
        x_even = (x[0] & 1) == 0
        act_half = x_even & ~done
        x = nn.cnd_select(act_half, nn.shift_right_bits(x, 1), x)
        u = nn.cnd_select(act_half, half_mod(u, m), u)
        # both odd now. Keep the (even) difference in the x slot so y stays
        # odd throughout: if x < y, swap roles first.
        both_odd = ~x_even & ~done
        x_ge = nn.geq_mask(x, y)
        dx, _ = nn.sub(x, y)
        dy, _ = nn.sub(y, x)
        du = _mod_sub(u, v, m)
        dv = _mod_sub(v, u, m)
        new_x = nn.cnd_select(both_odd,
                              nn.cnd_select(x_ge, dx, dy), x)
        new_y = nn.cnd_select(both_odd & ~x_ge, x, y)
        new_u = nn.cnd_select(both_odd,
                              nn.cnd_select(x_ge, du, dv), u)
        new_v = nn.cnd_select(both_odd & ~x_ge, u, v)
        return (new_x, new_y, new_u, new_v), None

    # bound: every iteration either halves x or turns a both-odd pair into
    # an even difference (halved next iteration) — <= 4*nbits + 2 total
    (x, y, u, v), _ = jax.lax.scan(step, (x, y, u, v),
                                   None, length=4 * nbits + 2)
    one = _const_like(1, k, a)
    ok = nn.eq_mask(y, one) & m_ctx_odd
    return v, ok


def _const_like(val: int, k: int, like):
    c = jnp.asarray(nn.to_limbs(val, k))
    return jnp.broadcast_to(c.reshape((k,) + (1,) * (like.ndim - 1)),
                            (k,) + like.shape[1:])


def _mod_sub(a, b, m):
    d, borrow = nn.sub(a, b)
    dm, _ = nn.add(d, m)
    return nn.cnd_select(borrow.astype(bool), dm, d)


def modinv_2exp(a, exp_bits: int):
    """a^-1 mod 2^exp_bits for odd a (nn_modinv_2exp, nn_modinv.c:308).
    Newton iteration: x <- x*(2 - a*x), doubling precision each step."""
    k = a.shape[0]
    kw = nn.num_limbs(exp_bits)
    x = _const_like(1, k, a)
    steps = max(1, (exp_bits - 1).bit_length())
    for _ in range(steps):
        ax = nn.mul(a, x)[:k]
        two = _const_like(2, k, a)
        t, _ = nn.sub(two, ax)
        x = nn.truncate_bits(nn.mul(x, t)[:k], exp_bits)
    ok = (a[0] & 1) == 1
    return nn.truncate_bits(x, exp_bits), ok


def modinv_word(a_word, m_word):
    """Scalar convenience (nn_modinv_word): host ints."""
    return pow(int(a_word), -1, int(m_word))


def xgcd(a, b, nbits: int | None = None):
    """Batched extended GCD (nn_xgcd, src/nn/nn_div.c:1179).

    Returns (g, u, v, sign_pos, ok): per lane
        u*a - v*b == g   where sign_pos
        v*b - u*a == g   otherwise
    with u, v >= 0 (the reference reports the sign out-of-band the same
    way). ok is False on a == 0 or b == 0 lanes.

    Strategy (composes the existing fixed-bound batched kernels instead of
    a signed-bignum binary xgcd): g = gcd(a,b); of the coprime reductions
    a/g, b/g at least one is odd — invert the other modulo it (modinv),
    then recover the second Bezout coefficient by exact division.
    """
    k = max(a.shape[0], b.shape[0])

    def widen(x, kw):
        if x.shape[0] < kw:
            return jnp.concatenate(
                [x, jnp.zeros((kw - x.shape[0],) + x.shape[1:], U32)], 0)
        return x

    a, b = widen(a, k), widen(b, k)
    g = gcd(a, b, nbits)
    ap, _ = divrem(a, g)
    bp, _ = divrem(b, g)
    bp_odd = (bp[0] & 1) == 1
    m1 = nn.cnd_select(bp_odd, bp, ap)      # odd modulus (coprime pair)
    x1 = nn.cnd_select(bp_odd, ap, bp)
    x1 = mod(x1, m1)
    # m1 == 1 lanes: inverse is vacuous, coefficient 1 works (m1 | other)
    one = _const_like(1, k, a)
    m1_is_1 = nn.eq_mask(m1, one)
    inv, inv_ok = modinv(nn.cnd_select(m1_is_1, one, x1),
                         nn.cnd_select(m1_is_1, _const_like(3, k, a), m1),
                         nbits)
    c = nn.cnd_select(m1_is_1, one, inv)
    # t = c * (a if bp_odd else b);  other_coef = (t - g) / (b if bp_odd
    # else a), exact by construction
    t = nn.mul(c, nn.cnd_select(bp_odd, a, b))          # 2k limbs
    k2 = t.shape[0]
    tg, _ = nn.sub(t, widen(g, k2))
    qq, rr = divrem(tg, widen(nn.cnd_select(bp_odd, b, a), k2))
    c_w = widen(c, k2)
    u = nn.cnd_select(bp_odd, c_w, qq)
    v = nn.cnd_select(bp_odd, qq, c_w)
    ok = (~nn.is_zero_mask(a)) & (~nn.is_zero_mask(b)) \
        & nn.is_zero_mask(rr) & (inv_ok | m1_is_1)
    return g, u, v, bp_odd, ok
