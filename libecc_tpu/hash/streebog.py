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


STREEBOG256 = HashAlg("STREEBOG256", 32, 64, _Streebog256,
                      aliases=("STREEBOG-256", "GOST34112012256"))
STREEBOG512 = HashAlg("STREEBOG512", 64, 64, _Streebog512,
                      aliases=("STREEBOG-512", "GOST34112012512"))

ALGS = [STREEBOG256, STREEBOG512]
