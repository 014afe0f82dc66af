"""Streebog (GOST R 34.11-2012 / RFC 6986): 256- and 512-bit digests.

Host streaming implementation, vectorized over the 8 state words with
numpy uint64 (the LPS transform is 8 table lookups x 8 words done as one
fancy-index gather + XOR-reduce). Reference parity: src/hash/streebog.c,
tables in streebog.h (extracted to _streebog_tables.npz by
scripts/extract_streebog_tables.py — public standard constants).

Structure: state h, 512-bit counters N and Sigma; per 64-byte block M
(little-endian u64 words): h = gN(h, M, N); N += bits; Sigma += M.
Finalize: pad with 0x01, process, then g0(h, N), g0(h, Sigma).
STREEBOG256 outputs the high half h[4..7].
"""

from __future__ import annotations

import os
import struct

import numpy as np

from .base import HashAlg, BlockHashState

_T = np.load(os.path.join(os.path.dirname(__file__), "_streebog_tables.npz"))
PI = _T["PI"]          # uint64[8, 256] combined S-box + linear transform
C = _T["C"]            # uint64[12, 8] round constants

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _lps(x: np.ndarray) -> np.ndarray:
    """LPS transform on a state vector uint64[8]: substitute+permute+linear,
    table form: out[i] = XOR_j PI[j][byte_i(x[j])]."""
    b = x[:, None] >> (np.arange(8, dtype=np.uint64)[None, :] * np.uint64(8))
    b = (b & np.uint64(0xFF)).astype(np.intp)          # [j, i] byte i of word j
    # out[i] = xor over j of PI[j][b[j, i]]
    vals = PI[np.arange(8)[:, None], b]                # [j, i]
    return np.bitwise_xor.reduce(vals, axis=0)


def _g(h, m, n):
    """Compression gN (reference: streebog.h gN)."""
    k = _lps(h ^ n)
    t = _lps(k ^ m)
    k = _lps(k ^ C[0])
    for j in range(1, 12):
        t = _lps(k ^ t)
        k = _lps(k ^ C[j])
    return h ^ t ^ k ^ m


def _add512(a, b):
    """512-bit add over uint64[8] little-endian words."""
    out = np.zeros(8, np.uint64)
    carry = np.uint64(0)
    for i in range(8):
        s = (int(a[i]) + int(b[i]) + int(carry))
        out[i] = np.uint64(s & 0xFFFFFFFFFFFFFFFF)
        carry = np.uint64(s >> 64)
    return out


class _Streebog(BlockHashState):
    block_size = 64
    digest_size = 64

    def __init__(self):
        super().__init__()
        fill = 0x0101010101010101 if self.digest_size == 32 else 0
        self._h = np.full(8, fill, np.uint64)
        self._n = np.zeros(8, np.uint64)
        self._sigma = np.zeros(8, np.uint64)

    def _ingest(self, block: bytes, bits: int):
        m = np.frombuffer(block, dtype="<u8")
        self._h = _g(self._h, m, self._n)
        add = np.zeros(8, np.uint64)
        add[0] = np.uint64(bits)
        self._n = _add512(self._n, add)
        self._sigma = _add512(self._sigma, m)

    def _compress(self, block: bytes):
        self._ingest(block, 512)

    def digest(self) -> bytes:
        h, n, sigma = self._h.copy(), self._n.copy(), self._sigma.copy()
        rem = self._buf
        last = rem + b"\x01" + b"\x00" * (63 - len(rem))
        m = np.frombuffer(last, dtype="<u8")
        h = _g(h, m, n)
        add = np.zeros(8, np.uint64)
        add[0] = np.uint64(8 * len(rem))
        n = _add512(n, add)
        sigma = _add512(sigma, m)
        z = np.zeros(8, np.uint64)
        h = _g(h, n, z)
        h = _g(h, sigma, z)
        out = h.astype("<u8").tobytes()
        return out[32:] if self.digest_size == 32 else out


class _Streebog256(_Streebog):
    digest_size = 32


class _Streebog512(_Streebog):
    digest_size = 64


# ---------------------------------------------------------------------------
# Batched device kernel.
#
# State = uint32[8 words, 4 chunks, N], 16-bit little-endian chunks of the
# 8 u64 state words. The LPS transform's 64 table lookups become one-hot
# MXU matmuls (the comb-select trick, curves/scalar_mul.py): for each
# source word j, the 8 byte indices select rows of PI[j] (split into four
# 16-bit chunk planes so the f32 products are exact), XOR-combined across
# j. Reference: src/hash/streebog.c (tables streebog.h).
# ---------------------------------------------------------------------------

def pack_blocks_streebog(msgs: list[bytes]):
    """Pad+pack -> uint32[nblk, 33, N]: rows 0..31 are the block's 8 u64
    words as 16-bit LE chunks; row 32 is the per-lane N-counter bit
    increment for that block (512 for full blocks, 8*rem for the final
    padded block — always present, matching the host finalize)."""
    n = len(msgs)
    nblks = {len(m) // 64 + 1 for m in msgs}
    if len(nblks) != 1:
        raise ValueError("batch must pad to the same block count")
    nblk = nblks.pop()
    datas = []
    rems = np.empty(n, np.uint32)
    for j, m in enumerate(msgs):
        rem = m[(nblk - 1) * 64:]
        datas.append(m[: (nblk - 1) * 64] + rem + b"\x01"
                     + b"\x00" * (63 - len(rem)))
        rems[j] = 8 * len(rem)
    arr = np.frombuffer(b"".join(datas), dtype="<u2")
    out = np.empty((nblk, 33, n), np.uint32)
    out[:, :32, :] = arr.reshape(n, nblk, 32).transpose(1, 2, 0)
    out[:, 32, :] = 512
    out[nblk - 1, 32, :] = rems
    return out


def _device_tables():
    pi16 = np.zeros((8, 256, 4), np.float32)
    for j in range(8):
        v = _T["PI"][j]
        for c in range(4):
            pi16[j, :, c] = ((v >> np.uint64(16 * c))
                             & np.uint64(0xFFFF)).astype(np.float32)
    c16 = np.zeros((12, 8, 4), np.uint32)
    for r in range(12):
        for w in range(8):
            for c in range(4):
                c16[r, w, c] = int(C[r, w]) >> (16 * c) & 0xFFFF
    return pi16, c16


def _streebog_device(blocks, out256: bool):
    import jax
    import jax.numpy as jnp

    pi16_np, c16_np = _device_tables()
    pi16 = jnp.asarray(pi16_np)                      # (8, 256, 4) f32
    c16 = jnp.asarray(c16_np)                        # (12, 8, 4) u32
    bshape = blocks.shape[2:]
    iota256 = jnp.arange(256, dtype=jnp.uint32)

    def lps(x):                                      # (8, 4, *B)
        out = None
        flat = x.reshape((8, 4) + (-1,))             # flatten batch
        for j in range(8):
            ch = flat[j]                             # (4, B)
            b = [(ch[i // 2] >> np.uint32(8 * (i % 2))) & np.uint32(0xFF)
                 for i in range(8)]
            idx = jnp.stack(b, 0).reshape(-1)        # (8*B,)
            onehot = (iota256[:, None] == idx[None, :]).astype(jnp.float32)
            sel = jax.lax.dot_general(
                pi16[j], onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (4, 8*B)
            sel = sel.astype(jnp.uint32).reshape((4, 8) + flat.shape[2:])
            sel = jnp.swapaxes(sel, 0, 1)            # (8 words, 4, B)
            out = sel if out is None else out ^ sel
        return out.reshape(x.shape)

    def add512(a, b):                                # chunks (8, 4, *B)
        af = a.reshape((32,) + a.shape[2:])
        bf = b.reshape((32,) + b.shape[2:])
        outs = []
        carry = jnp.zeros_like(af[0])
        for i in range(32):
            s = af[i] + bf[i] + carry
            outs.append(s & np.uint32(0xFFFF))
            carry = s >> np.uint32(16)
        return jnp.stack(outs, 0).reshape(a.shape)

    def g(h, m, n):
        k = lps(h ^ n)
        t = lps(k ^ m)
        k = lps(k ^ jnp.broadcast_to(
            c16[0].reshape((8, 4) + (1,) * len(bshape)), h.shape))

        def rnd(carry, cr):
            k, t = carry
            t = lps(k ^ t)
            k = lps(k ^ jnp.broadcast_to(
                cr.reshape((8, 4) + (1,) * len(bshape)), k.shape))
            return (k, t), None

        (k, t), _ = jax.lax.scan(rnd, (k, t), c16[1:])
        return h ^ t ^ k ^ m

    fill = 0x0101 if out256 else 0
    h0 = jnp.full((8, 4) + bshape, np.uint32(fill), jnp.uint32)
    zeros = jnp.zeros((8, 4) + bshape, jnp.uint32)

    def block_body(carry, blk):
        h, nctr, sigma = carry
        m = blk[:32].reshape((8, 4) + bshape)
        inc = blk[32]                                # (*B,) bits, < 2^16
        h = g(h, m, nctr)
        inc_state = jnp.zeros_like(nctr).at[0, 0].set(inc)
        nctr = add512(nctr, inc_state)
        sigma = add512(sigma, m)
        return (h, nctr, sigma), None

    (h, nctr, sigma), _ = jax.lax.scan(
        block_body, (h0, zeros, zeros), blocks)
    h = g(h, nctr, zeros)
    h = g(h, sigma, zeros)
    # digest bytes = LE serialization of h words; emit BE u32 convention
    lo = h[:, 0] | (h[:, 1] << np.uint32(16))        # (8, *B) u64 lo half
    hi = h[:, 2] | (h[:, 3] << np.uint32(16))
    bs = lambda x: ((x >> np.uint32(24)) | ((x >> np.uint32(8)) & np.uint32(0xFF00))
                    | ((x & np.uint32(0xFF00)) << np.uint32(8))
                    | (x << np.uint32(24)))
    words = []
    for w in range(8):
        words += [bs(lo[w]), bs(hi[w])]
    out = jnp.stack(words, 0)                        # (16, *B)
    return out[8:] if out256 else out


def streebog256_device(blocks):
    return _streebog_device(blocks, True)


def streebog512_device(blocks):
    return _streebog_device(blocks, False)


STREEBOG256 = HashAlg("STREEBOG256", 32, 64, _Streebog256,
                      device_fn=streebog256_device,
                      pack_fn=pack_blocks_streebog,
                      aliases=("STREEBOG-256", "GOST34112012256"))
STREEBOG512 = HashAlg("STREEBOG512", 64, 64, _Streebog512,
                      device_fn=streebog512_device,
                      pack_fn=pack_blocks_streebog,
                      aliases=("STREEBOG-512", "GOST34112012512"))

ALGS = [STREEBOG256, STREEBOG512]
