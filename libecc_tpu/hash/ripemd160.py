"""RIPEMD-160 (ISO/IEC 10118-3).

Host streaming implementation. Reference parity: src/hash/ripemd160.c.
Little-endian words; two parallel 80-step lines combined at block end.
"""

from __future__ import annotations

import struct

from .base import HashAlg, BlockHashState

M32 = 0xFFFFFFFF

IV = [0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0]

# message word order, left line then right line (5 rounds of 16)
RL = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13,
]
RR = [
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11,
]
# rotation amounts
SL = [
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6,
]
SR = [
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11,
]
KL = [0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E]
KR = [0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000]


def _rotl(x, n):
    return ((x << n) | (x >> (32 - n))) & M32


def _f(j, x, y, z):
    if j < 16:
        return x ^ y ^ z
    if j < 32:
        return (x & y) | (~x & z & M32)
    if j < 48:
        return (x | (~y & M32)) ^ z
    if j < 64:
        return (x & z) | (y & ~z & M32)
    return x ^ (y | (~z & M32))


def _compress(h, block: bytes):
    x = struct.unpack("<16I", block)
    al, bl, cl, dl, el = h
    ar, br, cr, dr, er = h
    for j in range(80):
        t = (al + _f(j, bl, cl, dl) + x[RL[j]] + KL[j // 16]) & M32
        t = (_rotl(t, SL[j]) + el) & M32
        al, el, dl, cl, bl = el, dl, _rotl(cl, 10), bl, t
        t = (ar + _f(79 - j, br, cr, dr) + x[RR[j]] + KR[j // 16]) & M32
        t = (_rotl(t, SR[j]) + er) & M32
        ar, er, dr, cr, br = er, dr, _rotl(cr, 10), br, t
    return [
        (h[1] + cl + dr) & M32,
        (h[2] + dl + er) & M32,
        (h[3] + el + ar) & M32,
        (h[4] + al + br) & M32,
        (h[0] + bl + cr) & M32,
    ]


class _Ripemd160(BlockHashState):
    block_size = 64

    def __init__(self):
        super().__init__()
        self._h = list(IV)

    def _compress(self, block: bytes):
        self._h = _compress(self._h, block)

    def digest(self) -> bytes:
        h = list(self._h)
        pad = self._buf + b"\x80"
        pad += b"\x00" * ((56 - len(pad)) % 64)
        pad += struct.pack("<Q", self._length * 8)
        for i in range(0, len(pad), 64):
            h = _compress(h, pad[i:i + 64])
        return struct.pack("<5I", *h)


# ---------------------------------------------------------------------------
# Batched device kernel: RIPEMD-160 is pure 32-bit ARX, same shape as the
# SHA-256 device kernel (scan over 80 dual-line steps); the only wrinkle
# is little-endian words and the per-step message-word permutation, which
# rides the scan xs as scalar indices (dynamic-slice on the 16-word axis,
# not a per-lane gather).
# ---------------------------------------------------------------------------

def pack_blocks_ripemd160(msgs: list[bytes]):
    """Pad+pack -> uint32[nblk, 16, N] little-endian words (MD4-style
    padding: 0x80, zeros, <Q bit length)."""
    import numpy as np
    padded = []
    for m in msgs:
        pad = b"\x80" + b"\x00" * ((55 - len(m)) % 64)
        padded.append(m + pad + struct.pack("<Q", len(m) * 8))
    nblk = {len(p) // 64 for p in padded}
    if len(nblk) != 1:
        raise ValueError("batch must pad to the same block count")
    nblk = nblk.pop()
    arr = np.frombuffer(b"".join(padded), dtype="<u4")
    return np.ascontiguousarray(
        arr.reshape(len(msgs), nblk, 16).transpose(1, 2, 0)).astype(
            np.uint32)


def ripemd160_device(blocks):
    """Batched RIPEMD-160: uint32[nblk, 16, *batch] -> uint32[5, *batch]
    in the BIG-endian word convention shared by all device hash fns."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    bshape = blocks.shape[2:]
    h0 = jnp.broadcast_to(
        jnp.array(IV, jnp.uint32).reshape((5,) + (1,) * len(bshape)),
        (5,) + bshape)

    def _rotl_d(x, n):
        return (x << np.uint32(n)) | (x >> np.uint32(32 - n))

    def _f_d(sel, x, y, z):
        """All five boolean lines computed, one selected by the static
        per-step index riding the scan xs."""
        cands = jnp.stack([
            x ^ y ^ z,
            (x & y) | (~x & z),
            (x | ~y) ^ z,
            (x & z) | (y & ~z),
            x ^ (y | ~z),
        ], 0)
        onehot = (jnp.arange(5, dtype=jnp.int32) == sel).astype(jnp.uint32)
        return jnp.tensordot(onehot, cands, axes=1)

    xs = jnp.asarray(np.stack([
        np.array(RL, np.int32), np.array(RR, np.int32),
        np.array(SL, np.int32), np.array(SR, np.int32),
        np.array([KL[j // 16] for j in range(80)], np.uint32).view(np.int32),
        np.array([KR[j // 16] for j in range(80)], np.uint32).view(np.int32),
        np.array([j // 16 for j in range(80)], np.int32),
        np.array([(79 - j) // 16 for j in range(80)], np.int32),
    ], axis=1))                                        # (80, 8)

    def step(carry, x_j):
        st, w = carry                                  # (10, *B), (16, *B)
        rl, rr, sl, sr = x_j[0], x_j[1], x_j[2], x_j[3]
        kl = x_j[4].astype(jnp.uint32)
        kr = x_j[5].astype(jnp.uint32)
        fl_sel, fr_sel = x_j[6], x_j[7]
        al, bl, cl, dl, el = [st[i] for i in range(5)]
        ar, br, cr, dr, er = [st[i] for i in range(5, 10)]
        wl = jax.lax.dynamic_index_in_dim(w, rl, 0, keepdims=False)
        wr = jax.lax.dynamic_index_in_dim(w, rr, 0, keepdims=False)
        t = al + _f_d(fl_sel, bl, cl, dl) + wl + kl
        # rotate by a traced amount: uint32 shifts with traced n
        sl32 = sl.astype(jnp.uint32)
        t = ((t << sl32) | (t >> (np.uint32(32) - sl32))) + el
        al, el, dl, cl, bl = el, dl, _rotl_d(cl, 10), bl, t
        t = ar + _f_d(fr_sel, br, cr, dr) + wr + kr
        sr32 = sr.astype(jnp.uint32)
        t = ((t << sr32) | (t >> (np.uint32(32) - sr32))) + er
        ar, er, dr, cr, br = er, dr, _rotl_d(cr, 10), br, t
        return (jnp.stack([al, bl, cl, dl, el,
                           ar, br, cr, dr, er], 0), w), None

    def block_body(h, blk):
        st0 = jnp.concatenate([h, h], 0)
        (st, _), _ = jax.lax.scan(step, (st0, blk), xs)
        bl_, cl_, dl_, el_ = st[1], st[2], st[3], st[4]
        al_ = st[0]
        br_, cr_, dr_, er_ = st[6], st[7], st[8], st[9]
        ar_ = st[5]
        return jnp.stack([
            h[1] + cl_ + dr_,
            h[2] + dl_ + er_,
            h[3] + el_ + ar_,
            h[4] + al_ + br_,
            h[0] + bl_ + cr_,
        ], 0), None

    h, _ = jax.lax.scan(block_body, h0, blocks)
    # digest bytes are the LE serialization of h -> bswap into the shared
    # big-endian word convention
    return ((h >> 24) | ((h >> 8) & 0xFF00)
            | ((h & 0xFF00) << 8) | (h << 24))


RIPEMD160 = HashAlg("RIPEMD160", 20, 64, _Ripemd160,
                    device_fn=ripemd160_device,
                    pack_fn=pack_blocks_ripemd160,
                    aliases=("RIPEMD-160",))

ALGS = [RIPEMD160]
