"""Batched fixed-limb natural-number (big integer) arithmetic for TPU.

TPU-native re-design of the reference nn layer (reference: src/nn/nn.c,
nn_add.c, nn_mul.c, nn_mul_redc1.c, nn_logical.c). Instead of one `nn`
struct with a dynamic `wlen`, a *batch* of big integers is a single
uint32 tensor of shape ``(K, *batch)`` — K limbs of ``LIMB_BITS`` bits
each, least-significant limb first, with the batch in the trailing
(lane) dimensions so every limb operation is a full-width VPU op.

Why 16-bit limbs in uint32 lanes: the VPU has no 64-bit integer
multiply; a 16x16 product fits exactly in uint32, and Comba column
sums of ``K`` hi/lo halves stay far below 2^32 for any practical K
(bound: K < 2^15). This replaces the reference's WORD_MUL half-word
schoolbook primitive (src/words/words.h:98-127) with lane-vectorized
exact uint32 arithmetic.

All functions are pure and jit-friendly: static shapes, no
data-dependent control flow. Where the reference returns error codes,
we return lane masks (bool arrays over the batch).
"""

from __future__ import annotations

import os as _os

import numpy as np
import jax
import jax.numpy as jnp

# Limb width. 15 (default): products need lo/hi 15-bit splitting before
# column accumulation (5 vector ops per limb product). 13: a full u32
# product column sum of K terms stays below 2^32 for K <= 44 (every
# supported field), so products accumulate RAW — ~2x fewer vector ops per
# Montgomery multiply at the cost of 10% more limbs. Benchmarked per
# hardware generation; all layers derive from this constant.
LIMB_BITS = int(_os.environ.get("LIBECC_TPU_LIMB_BITS", "15"))
assert LIMB_BITS in (13, 15), "supported limb widths: 13, 15"
LIMB_MASK = np.uint32((1 << LIMB_BITS) - 1)
# raw-column mode (see mont_mul_relaxed): only sound at <= 13 bits
RAW_COLS = LIMB_BITS <= 13
U32 = jnp.uint32


def num_limbs(bits: int) -> int:
    """Limb count for a given bit length (reference: BIT_LEN_WORDS, nn.h)."""
    return -(-bits // LIMB_BITS)


# ---------------------------------------------------------------------------
# Host-side conversions (python int <-> limb arrays). These are the analog of
# nn_init_from_buf / nn_export_to_buf (src/nn/nn.c:479,511) but live on host:
# device code only ever sees fixed-K limb tensors.
# ---------------------------------------------------------------------------

def to_limbs(x: int, k: int) -> np.ndarray:
    """Python int -> np.uint32[k], little-endian limbs."""
    if x < 0:
        raise ValueError("negative")
    if x >> (k * LIMB_BITS):
        raise ValueError(f"{x.bit_length()} bits does not fit in {k} limbs")
    return np.array([(x >> (LIMB_BITS * i)) & int(LIMB_MASK) for i in range(k)],
                    dtype=np.uint32)


def from_limbs(a) -> int:
    """np/jnp uint32[K] (single element, no batch) -> python int."""
    a = np.asarray(a)
    assert a.ndim == 1
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a))


def bytes_be_to_limbs_np(bufs: list[bytes], k: int) -> np.ndarray:
    """Vectorized host conversion: equal-length big-endian byte strings ->
    np.uint32[k, N] limbs. Uses the native C++ host runtime when built
    (native/host_runtime.cpp); numpy mirror of be_words_to_limbs otherwise.
    """
    from . import native
    nat = native.be_bytes_to_limbs(bufs, k)
    if nat is not None:
        return nat
    nb = len(bufs[0])
    pad = (-nb) % 4
    nw = (nb + pad) // 4
    joined = b"".join((b"\x00" * pad) + b for b in bufs)
    words = np.frombuffer(joined, dtype=">u4").reshape(len(bufs), nw).T
    words = words.astype(np.uint32)
    out = np.zeros((k, len(bufs)), np.uint32)
    total_bits = nw * 32
    for j in range(k):
        lo_bit = LIMB_BITS * j
        if lo_bit >= total_bits:
            break
        w_lo = nw - 1 - (lo_bit // 32)
        sh = lo_bit % 32
        v = words[w_lo] >> np.uint32(sh)
        take = 32 - sh
        if take < LIMB_BITS and w_lo - 1 >= 0:
            v = v | (words[w_lo - 1] << np.uint32(take))
        out[j] = v & LIMB_MASK
    return out


def limbs_to_bytes_be_np(a, nbytes: int) -> list[bytes]:
    """Vectorized host conversion: np.uint32[K, N] canonical limbs ->
    N big-endian byte strings of length nbytes (native C++ when built)."""
    from . import native
    nat = native.limbs_to_be_bytes(np.asarray(a), nbytes)
    if nat is not None:
        return nat
    a = np.asarray(a).astype(np.uint32)
    k, n = a.shape
    pad = (-nbytes) % 4
    nw = (nbytes + pad) // 4
    words = np.zeros((nw, n), np.uint32)
    for i in range(nw):
        lo_bit = 32 * i                                 # from LSB
        w = np.zeros(n, np.uint64)
        # bits [lo_bit, lo_bit+32) come from up to 3 limbs
        j0 = lo_bit // LIMB_BITS
        for j in range(j0, min(k, (lo_bit + 32 + LIMB_BITS - 1) // LIMB_BITS + 1)):
            shift = j * LIMB_BITS - lo_bit
            if shift >= 32:
                break
            if shift >= 0:
                w |= a[j].astype(np.uint64) << np.uint64(shift)
            else:
                w |= a[j].astype(np.uint64) >> np.uint64(-shift)
        words[nw - 1 - i] = (w & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    be = words.T.astype(">u4").tobytes()
    row = 4 * nw
    return [be[i * row + pad: (i + 1) * row] for i in range(n)]


def be_rows_to_limbs_dev(rows_u8, k: int):
    """DEVICE byte->limb unpack: uint8[N, L] big-endian rows ->
    uint32[k, N] canonical 15-bit limbs, inside jit.

    The host-side packers (native.be_bytes_to_limbs) move k*4 bytes per
    value over the host->device link; shipping the raw L bytes and
    unpacking on device cuts transfer 2.6x for 256-bit values — the e2e
    serving path's dominant cost on a tunneled/PCIe host link. Bit-
    compatible with bytes_be_to_limbs_np (same nb*8 <= k*15 contract)."""
    n, L = rows_u8.shape
    rev = rows_u8[:, ::-1].astype(U32)              # LSB-first bytes
    pad = (-L) % 4
    if pad:
        rev = jnp.concatenate(
            [rev, jnp.zeros((n, pad), U32)], axis=1)
    nw = (L + 3) // 4
    w = rev.reshape(n, nw, 4)
    words = (w[:, :, 0] | (w[:, :, 1] << 8) | (w[:, :, 2] << 16)
             | (w[:, :, 3] << 24))                  # (N, nw) LSW-first
    words = jnp.concatenate([words, jnp.zeros((n, 1), U32)], axis=1)
    total_bits = L * 8
    limbs = []
    for j in range(k):
        lo = j * LIMB_BITS
        if lo >= total_bits:
            limbs.append(jnp.zeros((n,), U32))
            continue
        q, r = divmod(lo, 32)
        v = words[:, q] >> r
        if r > 32 - LIMB_BITS:
            v = v | (words[:, q + 1] << (32 - r))
        limbs.append(v & jnp.uint32(LIMB_MASK))
    return jnp.stack(limbs, axis=0)


def batch_to_limbs(xs, k: int) -> np.ndarray:
    """list[int] -> np.uint32[k, N] (vectorized via fixed-width bytes)."""
    nb = (k * LIMB_BITS + 7) // 8
    bufs = [int(x).to_bytes(nb, "big") for x in xs]
    return bytes_be_to_limbs_np(bufs, k)


def batch_from_limbs(a) -> list:
    """np/jnp uint32[K, N] -> list[int] (vectorized)."""
    a = np.asarray(a)
    assert a.ndim == 2
    nb = (a.shape[0] * LIMB_BITS + 7) // 8
    return [int.from_bytes(b, "big") for b in limbs_to_bytes_be_np(a, nb)]


def limbs_to_bytes_be(x: int, nbytes: int) -> bytes:
    return int(x).to_bytes(nbytes, "big")


def be_words_to_limbs(words, total_bits: int, k_out: int):
    """Device-side radix conversion: big-endian uint32 words -> 15-bit limbs.

    words: uint32[W, *batch], interpreted as a big-endian W*32-bit integer
    (the natural output of the hash kernels); total_bits = W*32.
    Returns uint32[k_out, *batch] canonical limbs (little-endian 15-bit).
    Each limb straddles at most two 32-bit words — static index math, fully
    unrolled (~4 ops per limb). The analog of nn_init_from_buf (nn.c:479)
    but on-device, so hash -> scalar never leaves the chip.
    """
    nw = words.shape[0]
    assert total_bits == nw * 32
    out = []
    zero = jnp.zeros_like(words[0])
    for j in range(k_out):
        lo_bit = LIMB_BITS * j                      # bit offset from LSB
        if lo_bit >= total_bits:
            out.append(zero)
            continue
        # bit position from LSB -> word index from the END of the array
        w_lo = nw - 1 - (lo_bit // 32)              # word containing lo_bit
        sh = lo_bit % 32
        v = words[w_lo] >> sh
        take = 32 - sh
        if take < LIMB_BITS and w_lo - 1 >= 0:
            v = v | (words[w_lo - 1] << take)
        out.append(v & LIMB_MASK)
    return _stack(out)


# ---------------------------------------------------------------------------
# Internal list-of-limbs helpers. Hot code paths unstack the limb axis into a
# python list of (batch,)-shaped arrays so the K-step loops fully unroll at
# trace time with no slicing in the compiled graph.
# ---------------------------------------------------------------------------

def _unstack(a):
    return [a[i] for i in range(a.shape[0])]


def _stack(limbs):
    return jnp.stack(limbs, axis=0)


def _zero_like(limb):
    return jnp.zeros_like(limb)


# ---------------------------------------------------------------------------
# Add / sub with carry chains (reference: nn_add.c). K sequential vector ops.
# ---------------------------------------------------------------------------

def add(a, b):
    """(a + b) limbwise. Returns (sum uint32[K,...], carry uint32[...] in {0,1})."""
    al, bl = _unstack(a), _unstack(b)
    k = max(len(al), len(bl))
    out = []
    carry = None
    for i in range(k):
        s = None
        if i < len(al):
            s = al[i]
        if i < len(bl):
            s = bl[i] if s is None else s + bl[i]
        if carry is not None:
            s = carry if s is None else s + carry
        if s is None:
            s = _zero_like(al[0])
        out.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    return _stack(out), carry


def sub(a, b):
    """(a - b) limbwise mod 2^(16K). Returns (diff, borrow in {0,1})."""
    al, bl = _unstack(a), _unstack(b)
    out = []
    borrow = jnp.zeros_like(al[0])
    for i in range(len(al)):
        bi = bl[i] if i < len(bl) else None
        d = al[i] - borrow if bi is None else al[i] - bi - borrow
        out.append(d & LIMB_MASK)
        borrow = (d >> 31)  # uint32 wraparound sign bit = borrow
    return _stack(out), borrow


def cnd_select(cond, a, b):
    """Lanewise select: cond ? a : b. cond is a (batch,) bool/uint mask.

    Reference: constant-time WORD_MASK_IFNOTZERO selects (src/words/words.h:89);
    here selection is a vector predicate — constant-schedule by construction.
    """
    c = cond.astype(bool)
    return jnp.where(c[None, ...], a, b)


def cnd_swap(cond, a, b):
    """Lanewise conditional swap (reference: nn_cnd_swap, src/nn/nn.c:167)."""
    c = cond.astype(bool)[None, ...]
    return jnp.where(c, b, a), jnp.where(c, a, b)


def eq_mask(a, b):
    """Lanewise a == b -> bool[batch]."""
    return jnp.all(a == b, axis=0)


def is_zero_mask(a):
    return jnp.all(a == 0, axis=0)


def lt_mask(a, b):
    """Lanewise a < b -> bool[batch] (reference: nn_cmp, src/nn/nn.c:360)."""
    _, borrow = sub(a, b)
    return borrow.astype(bool)


def geq_mask(a, b):
    return ~lt_mask(a, b)


# ---------------------------------------------------------------------------
# Bit access / shifts (reference: nn_logical.c)
# ---------------------------------------------------------------------------

def get_bit(a, i: int):
    """Static bit index -> uint32[batch] in {0,1}."""
    return (a[i // LIMB_BITS] >> (i % LIMB_BITS)) & 1


def bits_msb_first(a, nbits: int):
    """Expand the low `nbits` bits of each lane into uint32[nbits, batch],
    most-significant bit first. Used to drive fixed-schedule ladders."""
    order = np.arange(nbits - 1, -1, -1)
    limb_idx = order // LIMB_BITS
    shifts = (order % LIMB_BITS).astype(np.uint32)
    sel = a[limb_idx]                                   # (nbits, *batch)
    sh = shifts.reshape((nbits,) + (1,) * (a.ndim - 1))
    return (sel >> sh) & 1


def shift_right_limbs(a, n: int):
    """Shift right by whole limbs (static n)."""
    k = a.shape[0]
    al = _unstack(a)
    out = [al[i + n] if i + n < k else _zero_like(al[0]) for i in range(k)]
    return _stack(out)


def shift_right_bits(a, n: int):
    """Static right-shift by n bits (n < 16), within fixed K."""
    assert 0 <= n < LIMB_BITS
    if n == 0:
        return a
    al = _unstack(a)
    k = len(al)
    out = []
    for i in range(k):
        lo = al[i] >> n
        hi = (al[i + 1] << (LIMB_BITS - n)) & LIMB_MASK if i + 1 < k else _zero_like(al[0])
        out.append(lo | hi)
    return _stack(out)


def rshift(a, n: int):
    """Static right shift by arbitrary n bits."""
    a = shift_right_limbs(a, n // LIMB_BITS)
    return shift_right_bits(a, n % LIMB_BITS)


def truncate_bits(a, nbits: int):
    """Keep only the low nbits (mask the rest). Static nbits."""
    k = a.shape[0]
    al = _unstack(a)
    out = []
    for i in range(k):
        lo = i * LIMB_BITS
        if lo + LIMB_BITS <= nbits:
            out.append(al[i])
        elif lo >= nbits:
            out.append(_zero_like(al[0]))
        else:
            out.append(al[i] & np.uint32((1 << (nbits - lo)) - 1))
    return _stack(out)


# ---------------------------------------------------------------------------
# Multiplication: tensorized product scanning ("Comba as one tensor op").
# Reference: schoolbook nn_mul (src/nn/nn_mul.c:123-190). Instead of a K^2
# scalar multiply loop, ONE elementwise multiply produces all limb products
# (Ka, Kb, *batch); hi/lo halves are summed into diagonal columns with a
# short padded-shift loop. Columns are "relaxed" (< 2^(17+log2 K)) and only
# resolved to canonical 16-bit limbs by an explicit carry chain.
# ---------------------------------------------------------------------------

def _mul_columns(a, b):
    """Relaxed product columns: uint32[Ka+Kb, *batch], column k holding
    sum_{i+j=k} lo16(a_i b_j) + sum_{i+j=k-1} hi16(a_i b_j)."""
    ka, kb = a.shape[0], b.shape[0]
    nc = ka + kb
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    prod = a[:, None] * b[None]                  # (Ka, Kb, *B) exact in u32
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    # row i occupies columns [i, i+Kb] once lo/hi are merged:
    pad_cfg = [(0, 0), (0, 1)] + [(0, 0)] * len(bshape)
    comb = jnp.pad(lo, pad_cfg)
    pad_cfg[1] = (1, 0)
    comb = comb + jnp.pad(hi, pad_cfg)           # (Ka, Kb+1, *B)
    rows = []
    for i in range(ka):
        pre = [(i, nc - i - (kb + 1))] + [(0, 0)] * len(bshape)
        rows.append(jnp.pad(comb[i], pre))
    return jnp.sum(jnp.stack(rows, axis=0), axis=0)


def _mul_columns_raw(a, b):
    """RAW product columns (13-bit mode): uint32[Ka+Kb, *batch], column c
    holding sum_{i+j=c} a_i*b_j with NO lo/hi splitting. Sound whenever
    every column sum < 2^32 — with relaxed limbs <= 2^13 + 2^9 that is
    K <= 44 (up to 546-bit moduli). 2 vector ops per limb product instead
    of the 5 the split costs; the top column is structurally zero."""
    ka, kb = a.shape[0], b.shape[0]
    nc = ka + kb
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    prod = a[:, None] * b[None]                  # (Ka, Kb, *B)
    rows = []
    for i in range(ka):
        pre = [(i, nc - i - kb)] + [(0, 0)] * len(bshape)
        rows.append(jnp.pad(prod[i], pre))
    return jnp.sum(jnp.stack(rows, axis=0), axis=0)


def _carry_raw(cols):
    """Exact carry-out value(cols)/R of an R-divisible RAW low half
    (13-bit mode; the raw-mode analog of _f32_carry below).

    Exact decomposition: with lo = cols & M, hi = cols >> 13,
        carry = hi[k-1] + sum_{d>=1} (lo[k-d] + hi[k-d-1]) * 2^(-13 d).
    Terms are <= 2^13 + 2^19 (exact in f32); the d>=4 tail is < 2^-32 and
    three f32 adds round by < 0.2, so rint() recovers the integer."""
    k = cols.shape[0]
    lo = cols & LIMB_MASK
    hi = cols >> LIMB_BITS

    def f(x):
        return x.astype(jnp.int32).astype(jnp.float32)

    acc = f(hi[k - 1])
    for d in range(1, 4):
        term = lo[k - d]
        if k - d - 1 >= 0:
            term = term + hi[k - d - 1]
        acc = acc + f(term) * np.float32(2.0 ** (-LIMB_BITS * d))
    return jnp.rint(acc).astype(U32)


def _carry_chain(cols, out_limbs: int):
    """Resolve relaxed columns into canonical 16-bit limbs.
    Returns (stacked limbs uint32[out_limbs, *B], final carry uint32[*B])."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for k in range(out_limbs):
        c = cols[k] + carry if k < cols.shape[0] else carry
        out.append(c & LIMB_MASK)
        carry = c >> LIMB_BITS
    return _stack(out), carry


def mul(a, b):
    """Full product: uint32[Ka,...] x uint32[Kb,...] -> uint32[Ka+Kb,...]."""
    cols = _mul_columns(a, b)
    out, _ = _carry_chain(cols, a.shape[0] + b.shape[0])
    return out


def sqr(a):
    return mul(a, a)


# ---------------------------------------------------------------------------
# Montgomery machinery (reference: nn_mul_redc1.c CIOS, :124-218).
# TPU-native reformulation: instead of CIOS's sequential K-step interleaved
# reduction, use the fully parallel SOS form
#     m = (T mod R) * (-p^-1 mod R) mod R        (one truncated product)
#     result = (T + m*p) / R                     (one full product + shift)
# so a Montgomery multiply is 3 tensorized column-products plus carry chains
# — no data dependence across limb index except the cheap carry chains.
# ---------------------------------------------------------------------------

class MontCtx:
    """Per-modulus Montgomery context. All constants are host-computed python
    ints baked into the trace (the analog of the precomputed r/r2/mpinv curve
    constants, reference: src/curves/known/ec_params_external.h:42-70).
    """

    def __init__(self, p: int, k: int | None = None):
        if p % 2 == 0:
            raise ValueError("Montgomery requires odd modulus")
        self.p_int = p
        self.bits = p.bit_length()
        self.k = k if k is not None else num_limbs(self.bits)
        if p >> (self.k * LIMB_BITS):
            raise ValueError("modulus does not fit in k limbs")
        self.R = 1 << (self.k * LIMB_BITS)
        self.r_int = self.R % p
        self.r2_int = (self.R * self.R) % p
        self.mpinv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        # full-width -p^-1 mod R for the parallel SOS reduction
        self.pinv_full = to_limbs((-pow(p, -1, self.R)) % self.R, self.k)
        self.p = to_limbs(p, self.k)
        # --- relaxed-subtraction complement constants (see mod_sub_relaxed).
        # Subtrahend contract: value < 2^(bits+4), relaxed limbs <= 2^17-1.
        # Complement width: smallest limb count whose weights cover the value.
        self.sub_kc = min(self.k, num_limbs(self.bits + 5))
        cc = (1 << 17) - 1
        self.sub_cc = np.uint32(cc)
        c1 = cc * (((1 << (LIMB_BITS * self.sub_kc)) - 1) // ((1 << LIMB_BITS) - 1))
        self.sub_c0 = to_limbs((-c1) % p, self.k)
        # relaxed arithmetic is only sound with enough radix headroom;
        # raw-column mode (13-bit limbs) additionally needs every column
        # sum of K products < 2^32 -> K <= 44
        self.relaxed_ok = (self.R >> self.bits) >= (1 << 24) and (
            not RAW_COLS or self.k <= 44)
        self.r = to_limbs(self.r_int, self.k)
        self.r2 = to_limbs(self.r2_int, self.k)
        self.one_limbs = to_limbs(1, self.k)

    def __repr__(self):
        return f"MontCtx(bits={self.bits}, k={self.k})"


def _cond_sub_p(limbs, carry, pl):
    """Given value v = carry*2^(16K) + limbs with v < 2p, return v mod p.
    Constant-schedule conditional subtract."""
    k = len(pl)
    s = []
    borrow = jnp.zeros_like(limbs[0])
    for i in range(k):
        d = limbs[i] - pl[i] - borrow
        s.append(d & LIMB_MASK)
        borrow = d >> 31
    take_sub = (carry >= borrow)
    out = [jnp.where(take_sub, s[i], limbs[i]) for i in range(k)]
    return out


def _const_bcast(arr_np, bshape):
    c = jnp.asarray(arr_np)
    return c.reshape(c.shape + (1,) * len(bshape))


def mont_mul(a, b, ctx: MontCtx):
    """Montgomery product a*b*R^-1 mod p, canonical (<p) output.

    Valid whenever a*b < R*p (in particular for canonical a,b < p).
    Reference algorithm: _nn_mul_redc1 CIOS (src/nn/nn_mul_redc1.c:124-218);
    here the parallel SOS form (see module comment above).
    """
    k = ctx.k
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    t_cols = _mul_columns(a, b)                       # (2k, *B) relaxed
    # T mod R exactly: resolve low k columns
    t_lo, c_lo = _carry_chain(t_cols[:k], k)          # canonical, carry into col k
    # m = T_lo * (-p^-1) mod R  (truncated product, low k limbs exact)
    pinv = _const_bcast(ctx.pinv_full, bshape)
    m_cols = _mul_columns(t_lo, pinv)[:k]
    m, _ = _carry_chain(m_cols, k)
    # U = m * p; S = T + U is divisible by R. Low-half columns of S carry out
    # c_total; high half = T_hi + U_hi + carries.
    p_arr = _const_bcast(ctx.p, bshape)
    u_cols = _mul_columns(m, p_arr)                   # (2k, *B) relaxed
    # carry out of low half of S: S_lo columns = t_cols_lo + u_cols_lo, but we
    # already resolved t_lo; recombine: low columns = t_lo + u_lo (+ c_lo at k)
    s_lo_cols = t_lo + u_cols[:k]
    _, c_s = _carry_chain(s_lo_cols, k)               # limbs are all zero
    hi_cols = t_cols[k:] + u_cols[k:]
    hi_cols = hi_cols.at[0].add(c_lo + c_s)
    limbs, top = _carry_chain(hi_cols, k)
    pl = [np.uint32(v) for v in ctx.p]
    return _stack(_cond_sub_p(_unstack(limbs), top, pl))


def mont_sqr(a, ctx: MontCtx):
    return mont_mul(a, a, ctx)


# ---------------------------------------------------------------------------
# RELAXED (carry-free) arithmetic — the field hot path.
#
# A *relaxed* element is any uint32[K, *batch] limb vector whose weighted sum
# Σ limb_i 2^(15 i) equals the represented value; limbs may exceed 15 bits.
# Invariants maintained by this layer (with K = num_limbs(bits) + 2, so the
# Montgomery radix R = 2^(15K) has >= 2^25 headroom over p):
#
#   (V)  every value stays < 2^(bits+17)  (the sub-complement bound), and
#        products a*b < R*p always holds;
#   (L)  limbs entering a product are <= 2^15 + 2^8 (one relaxation pass);
#        limbs anywhere are < 2^18.
#
# There are NO sequential carry chains here: addition is one vector add,
# subtraction is a complement trick, and Montgomery reduction resolves its
# single cross-boundary carry with an exactly-rounded float32 dot product.
# Canonicalization (exact 15-bit limbs, value < p) happens only at
# boundaries via `canonicalize`.
#
# This is the TPU-native replacement for the reference's word-serial
# carry-propagating nn layer (src/nn/nn_add.c, nn_mul_redc1.c): on a lane
# machine, deferring carries turns every op into a full-width VPU op.
# ---------------------------------------------------------------------------

def relax_once(a, drop_top_carry: bool = True):
    """One relaxation pass: limb' = (limb & M) + (prev_limb >> 15).
    Value-preserving except the top limb's carry (dropped when requested —
    callers rely on value < R). Input limbs < 2^22 -> output <= 2^15 + 2^7."""
    lo = a & LIMB_MASK
    hi = a >> LIMB_BITS
    pad = [(1, 0)] + [(0, 0)] * (a.ndim - 1)
    hi_up = jnp.pad(hi, pad)[:-1] if drop_top_carry else jnp.pad(hi, pad)
    return lo + hi_up


def mod_add_relaxed(a, b):
    """Relaxed modular add: ONE vector add (carries deferred)."""
    return a + b


def mod_sub_relaxed(a, b, ctx: MontCtx):
    """Relaxed modular subtract via limbwise complement.

    a - b  ==  a + (CC_vec - b) + c0   (mod p)
    where CC_vec = (2^17-1) * Σ_{i<kc} 2^15i and c0 = -CC_vec mod p.
    Contract: b's relaxed limbs <= 2^17-1 and value(b) < 2^(bits+4)
    (so its limbs above kc are zero). 3 vector ops, no borrows.
    """
    assert ctx.relaxed_ok, "relaxed ops need a headroom ctx (use FpCtx)"
    kc = ctx.sub_kc
    comp = ctx.sub_cc - b[:kc]
    if kc < b.shape[0]:
        comp = jnp.concatenate(
            [comp, jnp.zeros((b.shape[0] - kc,) + b.shape[1:], U32)], 0)
    c0 = _const_bcast(ctx.sub_c0, ())
    c0 = c0.reshape((ctx.k,) + (1,) * (a.ndim - 1))
    return a + comp + c0


def mod_neg_relaxed(a, ctx: MontCtx):
    """Relaxed negation: complement only (value CC_vec - a + c0 ≡ -a mod p)."""
    z = jnp.zeros_like(a)
    return mod_sub_relaxed(z, a, ctx)


def _f32_carry(cols_lo):
    """Exact carry-out of a low half whose VALUE is divisible by R.

    carry = value(cols_lo) / R computed by an exactly-rounded f32 sum of the
    top columns: the true quotient is an integer < 2^9 and all dropped /
    rounding error is < 2^-20, so rint() recovers it exactly."""
    k = cols_lo.shape[0]
    acc = cols_lo[k - 1].astype(jnp.float32) * np.float32(2.0 ** -LIMB_BITS)
    acc = acc + cols_lo[k - 2].astype(jnp.float32) * np.float32(2.0 ** (-2 * LIMB_BITS))
    acc = acc + cols_lo[k - 3].astype(jnp.float32) * np.float32(2.0 ** (-3 * LIMB_BITS))
    return jnp.rint(acc).astype(U32)


def mont_mul_relaxed(a, b, ctx: MontCtx):
    """Relaxed Montgomery product: value(out) ≡ a*b*R^-1 (mod p),
    value(out) < ~2.2p, limbs <= 2^15 + 2^8. No carry chains.

    Inputs: any relaxed reps with value(a)*value(b) < R*p/4 and limbs < 2^22
    (one relaxation pass is applied here).
    Reference algorithm being replaced: CIOS _nn_mul_redc1
    (src/nn/nn_mul_redc1.c:124-218)."""
    assert ctx.relaxed_ok, "relaxed ops need a headroom ctx (use FpCtx)"
    k = ctx.k
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    pinv = _const_bcast(ctx.pinv_full, bshape)
    p_arr = _const_bcast(ctx.p, bshape)
    ar = relax_once(a)
    br = relax_once(b)
    if RAW_COLS:
        # 13-bit raw-column SOS: no lo/hi splits anywhere; extra relax
        # passes keep every column sum < 2^32 (bounds: cols of a raw
        # product of relax-once'd operands <= K*2^26.3 < 2^31.8; after
        # one relax, limbs <= 2^13+2^19; after two, <= 2^13+2^6).
        t_cols = relax_once(_mul_columns_raw(ar, br))  # (2k): exact value
        t_lo2 = relax_once(t_cols[:k])                # == T mod R
        m = relax_once(relax_once(
            _mul_columns_raw(t_lo2, pinv)[:k]))       # value < R(1+eps)
        u_cols = _mul_columns_raw(m, p_arr)
        s_lo = t_cols[:k] + u_cols[:k]                # value ≡ 0 (mod R)
        carry = _carry_raw(s_lo)
        hi = t_cols[k:] + u_cols[k:]
        hi = hi.at[0].add(carry)
        # double relax: output limbs <= 2^13+2^6, satisfying both the
        # mul-input and the sub-complement (<= 2^17-1) contracts
        return relax_once(relax_once(hi))
    t_cols = _mul_columns(ar, br)                     # (2k, *B), cols < 2^22
    # m = (T mod R) * (-p^-1) mod R, then relaxed so value(m) < R(1+2^-7)
    t_lo_r = relax_once(t_cols[:k])                   # mod R: top carry dropped
    m = relax_once(_mul_columns(t_lo_r, pinv)[:k])    # value < R(1+eps)
    u_cols = _mul_columns(m, p_arr)                   # (2k, *B)
    s_lo = t_cols[:k] + u_cols[:k]                    # value ≡ 0 (mod R)
    carry = _f32_carry(s_lo)
    hi = t_cols[k:] + u_cols[k:]
    hi = hi.at[0].add(carry)
    return relax_once(hi)


def _sqr_columns(a):
    """Comba-squaring product columns: same COLUMN-VALUE semantics as
    _mul_columns(a, a) computed with half the limb products — the
    off-diagonal products a_i*a_j (i < j) are formed once and doubled
    (2p < 2^31.1 for relax-once'd limbs, exact in u32). Column k holds
    sum over {i<=j, i+j=k} of lo16(d_ij) + sum over i+j=k-1 of hi16,
    where d_ij = 2*p_ij off-diagonal, p_ii on the diagonal. The limb
    split differs from _mul_columns (lo(2p) != 2*lo(p)) but the weighted
    value of every column pair is identical; every bound used downstream
    (cols < 2^22, f32-carry exactness) still holds."""
    ka = a.shape[0]
    prod = a[:, None] * a[None]                  # (Ka, Ka, *B)
    iu = np.arange(ka)
    mshape = (ka, ka) + (1,) * (prod.ndim - 2)
    upper = jnp.asarray(iu[:, None] < iu[None, :]).reshape(mshape)
    diag = jnp.asarray(iu[:, None] == iu[None, :]).reshape(mshape)
    eff = jnp.where(upper, prod + prod,
                    jnp.where(diag, prod, jnp.zeros_like(prod)))
    lo = eff & LIMB_MASK
    hi = eff >> LIMB_BITS
    bshape = a.shape[1:]
    pad_cfg = [(0, 0), (0, 1)] + [(0, 0)] * len(bshape)
    comb = jnp.pad(lo, pad_cfg)
    pad_cfg[1] = (1, 0)
    comb = comb + jnp.pad(hi, pad_cfg)           # (Ka, Ka+1, *B)
    nc = 2 * ka
    rows = []
    for i in range(ka):
        pre = [(i, nc - i - (ka + 1))] + [(0, 0)] * len(bshape)
        rows.append(jnp.pad(comb[i], pre))
    return jnp.sum(jnp.stack(rows, axis=0), axis=0)


def mont_sqr_relaxed(a, ctx: MontCtx):
    """Relaxed Montgomery squaring. 15-bit mode runs the Comba-squaring
    phase-1 (_sqr_columns) — half the limb products of a general multiply
    (the classic NN squaring optimization the reference leaves on the
    table; nn_mul.c uses the generic path). Value-identical to
    mont_mul_relaxed(a, a); relaxed limb REPRESENTATIONS may differ
    (both canonicalize identically)."""
    if RAW_COLS:
        return mont_mul_relaxed(a, a, ctx)
    assert ctx.relaxed_ok, "relaxed ops need a headroom ctx (use FpCtx)"
    k = ctx.k
    bshape = a.shape[1:]
    pinv = _const_bcast(ctx.pinv_full, bshape)
    p_arr = _const_bcast(ctx.p, bshape)
    ar = relax_once(a)
    t_cols = _sqr_columns(ar)
    t_lo_r = relax_once(t_cols[:k])
    m = relax_once(_mul_columns(t_lo_r, pinv)[:k])
    u_cols = _mul_columns(m, p_arr)
    s_lo = t_cols[:k] + u_cols[:k]
    carry = _f32_carry(s_lo)
    hi = t_cols[k:] + u_cols[k:]
    hi = hi.at[0].add(carry)
    return relax_once(hi)


def canonicalize(a, ctx: MontCtx):
    """Relaxed rep (any value < R) -> canonical limbs, value reduced mod p.
    Boundary-only op (export, comparisons): two exact Montgomery multiplies
    (x -> x*R -> x mod p) plus a carry chain."""
    limbs, top = _carry_chain(a, ctx.k)               # top == 0 since value < R
    t = mont_mul(limbs, _const_limbs(ctx.r2, limbs), ctx)
    return mont_mul(t, _const_limbs(ctx.one_limbs, t), ctx)


def canonicalize_from_mont(a, ctx: MontCtx):
    """Relaxed Montgomery-domain rep (value x*R + c*p, < ~3p) -> canonical
    PLAIN-domain limbs (x mod p, < p). One exact Montgomery multiply by 1."""
    limbs, _ = _carry_chain(a, ctx.k)
    return mont_mul(limbs, _const_limbs(ctx.one_limbs, limbs), ctx)


def to_mont(a, ctx: MontCtx):
    """a -> a*R mod p (reference: fp_redcify)."""
    r2 = jnp.asarray(ctx.r2)
    r2 = r2.reshape(r2.shape + (1,) * (a.ndim - 1))
    return mont_mul(a, jnp.broadcast_to(r2, a.shape), ctx)


def from_mont(a, ctx: MontCtx):
    """a*R -> a mod p (reference: fp_unredcify)."""
    one = jnp.asarray(ctx.one_limbs)
    one = one.reshape(one.shape + (1,) * (a.ndim - 1))
    return mont_mul(a, jnp.broadcast_to(one, a.shape), ctx)


# ---------------------------------------------------------------------------
# Modular add/sub/neg for canonical operands (< p).
# Reference: nn_mod_add/sub/neg (src/nn/nn_add.c:337,398,467).
# ---------------------------------------------------------------------------

def _const_limbs(ctx_arr, like):
    c = jnp.asarray(ctx_arr)
    return jnp.broadcast_to(c.reshape(c.shape + (1,) * (like.ndim - 1)), like.shape)


def mod_add(a, b, ctx: MontCtx):
    al, bl = _unstack(a), _unstack(b)
    k = ctx.k
    out = []
    carry = jnp.zeros_like(al[0])
    for i in range(k):
        s = al[i] + bl[i] + carry
        out.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    pl = [np.uint32(v) for v in ctx.p]
    return _stack(_cond_sub_p(out, carry, pl))


def mod_sub(a, b, ctx: MontCtx):
    d, borrow = sub(a, b)
    dp, _ = add(d, _const_limbs(ctx.p, d))
    # if borrow: use d + p (wrapped add restores the true value)
    return cnd_select(borrow.astype(bool), dp, d)


def mod_neg(a, ctx: MontCtx):
    """(-a) mod p, with (-0) = 0."""
    p = _const_limbs(ctx.p, a)
    d, _ = sub(p, a)
    z = is_zero_mask(a)
    return cnd_select(z, jnp.zeros_like(a), d)


def mod_reduce_once(a, ctx: MontCtx):
    """a mod p for a < 2p (single conditional subtract)."""
    al = _unstack(a)
    pl = [np.uint32(v) for v in ctx.p]
    z = jnp.zeros_like(al[0])
    return _stack(_cond_sub_p(al, z, pl))


def reduce_wide(x, ctx: MontCtx):
    """x mod p for x up to 2K limbs wide (e.g. 512-bit hash mod 256-bit q).

    Splits x = x_hi*R + x_lo and uses three Montgomery multiplies — no
    division machinery needed (replaces the reference's reciprocal division
    path nn_divrem, src/nn/nn_div.c:968, for all in-library uses).
    """
    k = ctx.k
    if x.shape[0] <= k:
        xl = jnp.concatenate([x, jnp.zeros((k - x.shape[0],) + x.shape[1:], U32)], 0) \
            if x.shape[0] < k else x
        t = mont_mul(xl, _const_limbs(ctx.r2, xl), ctx)       # x*R mod p
        return mont_mul(t, _const_limbs(ctx.one_limbs, t), ctx)     # x mod p
    assert x.shape[0] <= 2 * k
    x_lo, x_hi = x[:k], x[k:]
    if x_hi.shape[0] < k:
        pad = jnp.zeros((k - x_hi.shape[0],) + x.shape[1:], U32)
        x_hi = jnp.concatenate([x_hi, pad], 0)
    r2 = _const_limbs(ctx.r2, x_lo)
    one = _const_limbs(ctx.one_limbs, x_lo)
    t_hi = mont_mul(x_hi, r2, ctx)              # x_hi * R mod p
    t_lo = mont_mul(mont_mul(x_lo, r2, ctx), one, ctx)  # x_lo mod p
    return mod_add(t_hi, t_lo, ctx)


# ---------------------------------------------------------------------------
# Modular exponentiation / inversion.
# ---------------------------------------------------------------------------

def mont_pow_static(a_mont, e: int, ctx: MontCtx):
    """a^e mod p with *static* exponent, a in Montgomery form, result in
    Montgomery form. Square-and-multiply driven by a lax.scan over the
    (host-known) exponent bits — fixed schedule, one traced body.

    Reference: nn_mod_pow_redc Montgomery-ladder (src/nn/nn_mod_pow.c:242);
    a static exponent needs no ladder hardening (it is public).
    """
    if e == 0:
        return _const_limbs(ctx.r, a_mont)  # 1 in Montgomery form
    nbits = e.bit_length()
    bits = np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                    dtype=np.uint32)

    def body(acc, bit):
        acc = mont_sqr(acc, ctx)
        acc_m = mont_mul(acc, a_mont, ctx)
        acc = jnp.where(bit.astype(bool), acc_m, acc)
        return acc, None

    # first bit is always 1: start from a
    acc, _ = jax.lax.scan(body, a_mont, jnp.asarray(bits[1:]))
    return acc


def mont_inv_fermat(a_mont, ctx: MontCtx):
    """Constant-schedule modular inverse via Fermat: a^(p-2) (prime p).
    Reference: nn_modinv_fermat (src/nn/nn_modinv.c:504). Input/output in
    Montgomery form. Returns garbage for a == 0 (caller masks)."""
    return mont_pow_static(a_mont, ctx.p_int - 2, ctx)


def mod_pow(base, exp, ctx: MontCtx, nbits: int | None = None):
    """base^exp mod p with *traced* exponent limbs (uint32[K,...]).
    Fixed-schedule square-and-multiply over nbits (default: modulus bits).
    Non-Montgomery domain in/out."""
    if nbits is None:
        nbits = ctx.k * LIMB_BITS
    b = to_mont(base, ctx)
    bits = bits_msb_first(exp, nbits)  # (nbits, batch)
    acc0 = _const_limbs(ctx.r, b)      # 1 in Montgomery form

    def body(acc, bit):
        acc = mont_sqr(acc, ctx)
        acc_m = mont_mul(acc, b, ctx)
        acc = cnd_select(bit.astype(bool), acc_m, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, bits)
    return from_mont(acc, ctx)
