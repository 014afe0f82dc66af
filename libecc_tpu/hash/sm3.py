"""SM3 (GB/T 32905-2016, Chinese national standard hash).

Host streaming implementation plus a batched TPU kernel sharing the
sha2-style device layout (uint32[nblk, 16, N] big-endian blocks).
Reference parity: src/hash/sm3.c (360 LoC).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import HashAlg, BlockHashState

IV = [0x7380166F, 0x4914B2B9, 0x172442D7, 0xDA8A0600,
      0xA96F30BC, 0x163138AA, 0xE38DEE4D, 0xB0FB0E4E]

M32 = 0xFFFFFFFF


def _rotl(x, n):
    n %= 32
    return ((x << n) | (x >> (32 - n))) & M32


def _p0(x):
    return x ^ _rotl(x, 9) ^ _rotl(x, 17)


def _p1(x):
    return x ^ _rotl(x, 15) ^ _rotl(x, 23)


def _compress(state, block: bytes):
    w = list(struct.unpack(">16I", block))
    for j in range(16, 68):
        w.append(_p1(w[j - 16] ^ w[j - 9] ^ _rotl(w[j - 3], 15))
                 ^ _rotl(w[j - 13], 7) ^ w[j - 6])
    w1 = [w[j] ^ w[j + 4] for j in range(64)]
    a, b, c, d, e, f, g, h = state
    for j in range(64):
        t = 0x79CC4519 if j < 16 else 0x7A879D8A
        ss1 = _rotl((_rotl(a, 12) + e + _rotl(t, j)) & M32, 7)
        ss2 = ss1 ^ _rotl(a, 12)
        if j < 16:
            ff = a ^ b ^ c
            gg = e ^ f ^ g
        else:
            ff = (a & b) | (a & c) | (b & c)
            gg = (e & f) | (~e & g)
        tt1 = (ff + d + ss2 + w1[j]) & M32
        tt2 = (gg + h + ss1 + w[j]) & M32
        d = c
        c = _rotl(b, 9)
        b = a
        a = tt1
        h = g
        g = _rotl(f, 19)
        f = e
        e = _p0(tt2)
    return [s ^ v for s, v in zip(state, (a, b, c, d, e, f, g, h))]


class _Sm3(BlockHashState):
    block_size = 64

    def __init__(self):
        super().__init__()
        self._h = list(IV)

    def _compress(self, block: bytes):
        self._h = _compress(self._h, block)

    def digest(self) -> bytes:
        h = list(self._h)
        bitlen = self._length * 8
        pad = self._buf + b"\x80"
        pad += b"\x00" * ((56 - len(pad)) % 64)
        pad += struct.pack(">Q", bitlen)
        for i in range(0, len(pad), 64):
            h = _compress(h, pad[i:i + 64])
        return struct.pack(">8I", *h)


# ---------------------------------------------------------------------------
# Batched device kernel (same layout as the SHA-256 kernel: blocks
# uint32[nblk, 16, N] -> digest words uint32[8, N]).
# ---------------------------------------------------------------------------

def _device_sm3(blocks):
    import jax
    import jax.numpy as jnp

    def rotl(x, n):
        n %= 32
        if n == 0:
            return x
        return (x << n) | (x >> (32 - n))

    def p0(x):
        return x ^ rotl(x, 9) ^ rotl(x, 17)

    def p1(x):
        return x ^ rotl(x, 15) ^ rotl(x, 23)

    tj = jnp.asarray(
        np.array([_rotl(0x79CC4519 if j < 16 else 0x7A879D8A, j)
                  for j in range(64)], np.uint32))

    # Rounds run as lax.scan over 8-round chunks (two scans: the j<16
    # boolean-function variant, then the majority variant). A fully
    # unrolled 64-round chain triggers a superlinear XLA:CPU optimizer
    # blowup (hours of compile past ~48 rounds, observed on multiple
    # hosts); 8-round chunks keep intra-chunk fusion with O(1) compile.
    CH = 8

    def make_rounds(late: bool):
        def chunk(state8, xs):
            a, b, c, d, e, f, g, h = [state8[i] for i in range(8)]
            for jj in range(CH):
                t, wj, w1j = xs[0][jj], xs[1][jj], xs[2][jj]
                ss1 = rotl(rotl(a, 12) + e + t, 7)
                ss2 = ss1 ^ rotl(a, 12)
                if late:
                    ff = (a & b) | (a & c) | (b & c)
                    gg = (e & f) | (~e & g)
                else:
                    ff = a ^ b ^ c
                    gg = e ^ f ^ g
                tt1 = ff + d + ss2 + w1j
                tt2 = gg + h + ss1 + wj
                d, c, b, a = c, rotl(b, 9), a, tt1
                h, g, f, e = g, rotl(f, 19), e, p0(tt2)
            return jnp.stack([a, b, c, d, e, f, g, h], 0), None
        return chunk

    def block_step(state, blk):
        w = [blk[i] for i in range(16)]
        for j in range(16, 68):
            w.append(p1(w[j - 16] ^ w[j - 9] ^ rotl(w[j - 3], 15))
                     ^ rotl(w[j - 13], 7) ^ w[j - 6])
        ws = jnp.stack(w, 0)                         # (68, *B)
        w1 = ws[:64] ^ ws[4:]                        # (64, *B)
        bshape = blk.shape[1:]
        tjb = jnp.broadcast_to(
            tj.reshape((64,) + (1,) * len(bshape)), (64,) + bshape)
        chunks = lambda x, lo, hi: x[lo:hi].reshape(
            ((hi - lo) // CH, CH) + x.shape[1:])
        s8, _ = jax.lax.scan(
            make_rounds(False), state,
            (chunks(tjb, 0, 16), chunks(ws, 0, 16), chunks(w1, 0, 16)))
        s8, _ = jax.lax.scan(
            make_rounds(True), s8,
            (chunks(tjb, 16, 64), chunks(ws, 16, 64), chunks(w1, 16, 64)))
        return state ^ s8, None

    n = blocks.shape[-1]
    iv = jnp.broadcast_to(
        jnp.asarray(np.array(IV, np.uint32))[:, None], (8, n))
    state, _ = jax.lax.scan(block_step, iv, blocks)
    return state


def _pack_be64len(msgs, block_size=64):
    """Pad messages MD-style (0x80 ... be64 bitlen) and pack to
    uint32[nblk, 16, N] big-endian words. Shared with SHA-256 layout.
    Lengths may differ as long as every message pads to the same block
    count (same constraint as the other hash packers)."""
    n = len(msgs)
    padded = []
    for m in msgs:
        p = m + b"\x80"
        p += b"\x00" * ((56 - len(p)) % 64)
        p += struct.pack(">Q", len(m) * 8)
        padded.append(p)
    nblks = {len(p) // 64 for p in padded}
    if len(nblks) != 1:
        raise ValueError("batch must pad to the same block count")
    nblk = nblks.pop()
    arr = np.frombuffer(b"".join(padded), dtype=">u4")
    arr = arr.reshape(n, nblk, 16).transpose(1, 2, 0).astype(np.uint32)
    return arr


SM3 = HashAlg("SM3", 32, 64, _Sm3, device_fn=_device_sm3,
              pack_fn=_pack_be64len, aliases=("SM-3",))

ALGS = [SM3]
