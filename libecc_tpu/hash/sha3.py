"""SHA-3 family + SHAKE (FIPS 202): host streaming + batched device Keccak.

Reference parity: src/hash/sha3.c, sha3-224/256/384/512.c, shake.c,
shake256.c, keccak.h (KECCAKF macro rounds, keccak.h:34-105).

Device design: Keccak-f[1600] is pure bit logic (xor/and/not/rot) — ideal
VPU work. The 25 64-bit lanes live as (hi, lo) uint32 pairs in a
(25, 2, N) tensor; the 24 rounds run under lax.scan with the round
constants as scan input.
"""

from __future__ import annotations

import struct

import numpy as np
import jax
import jax.numpy as jnp

from .base import HashAlg, HashState

RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y]
ROT = [[0, 36, 3, 41, 18],
       [1, 44, 10, 45, 2],
       [62, 6, 43, 15, 61],
       [28, 55, 25, 21, 56],
       [27, 20, 39, 8, 14]]

M64 = 0xFFFFFFFFFFFFFFFF


def _rol64(v, n):
    n %= 64
    return ((v << n) | (v >> (64 - n))) & M64


def keccak_f_host(A):
    """A: 5x5 list of ints (A[x][y]). In-place 24 rounds."""
    for rnd in range(24):
        C = [A[x][0] ^ A[x][1] ^ A[x][2] ^ A[x][3] ^ A[x][4] for x in range(5)]
        D = [C[(x - 1) % 5] ^ _rol64(C[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                A[x][y] ^= D[x]
        B = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                B[y][(2 * x + 3 * y) % 5] = _rol64(A[x][y], ROT[x][y])
        for x in range(5):
            for y in range(5):
                A[x][y] = B[x][y] ^ ((~B[(x + 1) % 5][y]) & B[(x + 2) % 5][y])
        A[0][0] ^= RC[rnd]
    return A


class _KeccakState(HashState):
    """Sponge with byte-rate `rate`, domain-separation byte `dsbyte`."""

    rate = 136
    dsbyte = 0x06
    _outlen = 32

    def __init__(self, outlen=None):
        self._st = [[0] * 5 for _ in range(5)]
        self._buf = b""
        if outlen is not None:
            self._outlen = outlen

    def update(self, data: bytes):
        self._buf += bytes(data)
        while len(self._buf) >= self.rate:
            self._absorb(self._buf[: self.rate])
            self._buf = self._buf[self.rate:]

    def _absorb(self, block: bytes):
        lanes = struct.unpack("<%dQ" % (self.rate // 8), block)
        for i, lane in enumerate(lanes):
            x, y = i % 5, i // 5
            self._st[x][y] ^= lane
        keccak_f_host(self._st)

    def digest(self) -> bytes:
        # pad: dsbyte ... 0x80
        st = [row[:] for row in self._st]
        buf = self._buf
        pad = bytearray(self.rate - len(buf))
        pad[0] = self.dsbyte
        pad[-1] |= 0x80
        block = buf + bytes(pad)
        lanes = struct.unpack("<%dQ" % (self.rate // 8), block)
        for i, lane in enumerate(lanes):
            x, y = i % 5, i // 5
            st[x][y] ^= lane
        keccak_f_host(st)
        out = b""
        while len(out) < self._outlen:
            for i in range(self.rate // 8):
                x, y = i % 5, i // 5
                out += struct.pack("<Q", st[x][y])
                if len(out) >= self._outlen:
                    break
            if len(out) < self._outlen:
                keccak_f_host(st)
        return out[: self._outlen]


class _Sha3_224(_KeccakState):
    rate = 144; _outlen = 28


class _Sha3_256(_KeccakState):
    rate = 136; _outlen = 32


class _Sha3_384(_KeccakState):
    rate = 104; _outlen = 48


class _Sha3_512(_KeccakState):
    rate = 72; _outlen = 64


class _Shake128(_KeccakState):
    rate = 168; dsbyte = 0x1F; _outlen = 32


class _Shake256(_KeccakState):
    rate = 136; dsbyte = 0x1F; _outlen = 114  # Ed448 uses 114-byte output


def shake256(data: bytes, outlen: int) -> bytes:
    st = _Shake256(outlen=outlen)
    st.update(data)
    return st.digest()


def shake128(data: bytes, outlen: int) -> bytes:
    st = _Shake128(outlen=outlen)
    st.update(data)
    return st.digest()


# ---------------------------------------------------------------------------
# Batched device Keccak
# ---------------------------------------------------------------------------

def _rol_pair(h, l, n):
    n %= 64
    if n == 0:
        return h, l
    if n == 32:
        return l, h
    if n < 32:
        nh = (h << np.uint32(n)) | (l >> np.uint32(32 - n))
        nl = (l << np.uint32(n)) | (h >> np.uint32(32 - n))
        return nh, nl
    m = n - 32
    nh = (l << np.uint32(m)) | (h >> np.uint32(32 - m))
    nl = (h << np.uint32(m)) | (l >> np.uint32(32 - m))
    return nh, nl


def keccak_f_device(state):
    """state: uint32[25, 2, *batch] with lane i=(x + 5y) as (hi, lo).
    One Keccak-f[1600] permutation; rounds under lax.scan."""
    rc_pairs = np.array([(c >> 32, c & 0xFFFFFFFF) for c in RC], np.uint32)

    def rnd(st, rc):
        def lane(x, y):
            i = x + 5 * y
            return st[i, 0], st[i, 1]

        C = [None] * 5
        for x in range(5):
            h = lane(x, 0)[0] ^ lane(x, 1)[0] ^ lane(x, 2)[0] ^ lane(x, 3)[0] ^ lane(x, 4)[0]
            l = lane(x, 0)[1] ^ lane(x, 1)[1] ^ lane(x, 2)[1] ^ lane(x, 3)[1] ^ lane(x, 4)[1]
            C[x] = (h, l)
        D = []
        for x in range(5):
            rh, rl = _rol_pair(*C[(x + 1) % 5], 1)
            D.append((C[(x - 1) % 5][0] ^ rh, C[(x - 1) % 5][1] ^ rl))
        A = {}
        for x in range(5):
            for y in range(5):
                h, l = lane(x, y)
                A[(x, y)] = (h ^ D[x][0], l ^ D[x][1])
        B = {}
        for x in range(5):
            for y in range(5):
                B[(y, (2 * x + 3 * y) % 5)] = _rol_pair(*A[(x, y)], ROT[x][y])
        outs = [None] * 25
        for x in range(5):
            for y in range(5):
                bh, bl = B[(x, y)]
                b1h, b1l = B[((x + 1) % 5, y)]
                b2h, b2l = B[((x + 2) % 5, y)]
                nh = bh ^ (~b1h & b2h)
                nl = bl ^ (~b1l & b2l)
                outs[x + 5 * y] = jnp.stack([nh, nl], 0)
        st = jnp.stack(outs, 0)
        st = st.at[0, 0].set(st[0, 0] ^ rc[0]).at[0, 1].set(st[0, 1] ^ rc[1])
        return st, None

    state, _ = jax.lax.scan(rnd, state, jnp.asarray(rc_pairs))
    return state


def _keccak_absorb_device(blocks, rate_lanes: int):
    """blocks: uint32[nblk, rate_lanes*2, *batch] (lane-major (hi,lo)) —
    pre-padded sponge input. Returns final state uint32[25, 2, *batch]."""
    bshape = blocks.shape[2:]
    st = jnp.zeros((25, 2) + bshape, jnp.uint32)

    def body(st, blk):
        lanes = blk.reshape((rate_lanes, 2) + bshape)
        st = st.at[:rate_lanes].set(st[:rate_lanes] ^ lanes)
        return keccak_f_device(st), None

    st, _ = jax.lax.scan(body, st, blocks)
    return st


def make_sha3_device(rate: int, outlen: int, dsbyte: int = 0x06):
    """Build a device fn: blocks uint32[nblk, rate//4, *b] -> uint32 words.
    Output: ceil(outlen/4) uint32 words in BIG-endian word convention
    (matching the other hash device fns for e_from_digest_bits)."""
    rate_lanes = rate // 8

    def fn(blocks):
        st = _keccak_absorb_device(blocks, rate_lanes)
        # squeeze outlen bytes (single squeeze: outlen <= rate for SHA3)
        nlanes = (outlen + 7) // 8
        outs = []
        for i in range(nlanes):
            x, y = i % 5, i // 5
            hi, lo = st[i, 0], st[i, 1]
            # lanes are little-endian 64-bit: byte order lo first
            # convert to big-endian u32 words: bswap(lo), bswap(hi)
            outs.append(_bswap32(lo))
            outs.append(_bswap32(hi))
        words = jnp.stack(outs, 0)
        nwords = (outlen + 3) // 4
        return words[:nwords]

    return fn


def _bswap32(x):
    return ((x >> 24) | ((x >> 8) & 0xFF00) |
            ((x << 8) & 0xFF0000) | (x << 24))


def pack_blocks_keccak(msgs: list[bytes], rate: int, dsbyte: int = 0x06):
    """Pad+pack messages -> uint32[nblk, rate//4, N] (lane-major hi/lo)."""
    padded = []
    for m in msgs:
        padlen = rate - (len(m) % rate)
        pad = bytearray(padlen)
        pad[0] = dsbyte
        pad[-1] |= 0x80
        padded.append(m + bytes(pad))
    nblk = {len(p) // rate for p in padded}
    if len(nblk) != 1:
        raise ValueError("batch must pad to the same block count")
    nblk = nblk.pop()
    rl = rate // 8
    lanes = np.frombuffer(b"".join(padded), dtype="<u8").reshape(
        len(msgs), nblk, rl).transpose(1, 2, 0)
    out = np.empty((nblk, rl * 2, len(msgs)), np.uint32)
    out[:, 0::2, :] = (lanes >> np.uint64(32)).astype(np.uint32)    # hi
    out[:, 1::2, :] = (lanes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return out


SHA3_224 = HashAlg("SHA3_224", 28, 144, _Sha3_224,
                   make_sha3_device(144, 28),
                   lambda msgs: pack_blocks_keccak(msgs, 144),
                   aliases=("SHA3-224",))
SHA3_256 = HashAlg("SHA3_256", 32, 136, _Sha3_256,
                   make_sha3_device(136, 32),
                   lambda msgs: pack_blocks_keccak(msgs, 136),
                   aliases=("SHA3-256",))
SHA3_384 = HashAlg("SHA3_384", 48, 104, _Sha3_384,
                   make_sha3_device(104, 48),
                   lambda msgs: pack_blocks_keccak(msgs, 104),
                   aliases=("SHA3-384",))
SHA3_512 = HashAlg("SHA3_512", 64, 72, _Sha3_512,
                   make_sha3_device(72, 64),
                   lambda msgs: pack_blocks_keccak(msgs, 72),
                   aliases=("SHA3-512",))
SHAKE256 = HashAlg("SHAKE256", 114, 136, _Shake256,
                   make_sha3_device(136, 114, 0x1F),
                   lambda msgs: pack_blocks_keccak(msgs, 136, 0x1F),
                   aliases=("SHAKE-256",))
SHAKE128 = HashAlg("SHAKE128", 32, 168, _Shake128,
                   make_sha3_device(168, 32, 0x1F),
                   lambda msgs: pack_blocks_keccak(msgs, 168, 0x1F),
                   aliases=("SHAKE-128",))

ALGS = [SHA3_224, SHA3_256, SHA3_384, SHA3_512, SHAKE128, SHAKE256]
