"""SHA-2 family: SHA-224/256/384/512/512-224/512-256.

Host streaming implementations (pure Python, the IUF surface) plus batched
TPU kernels. Reference parity: src/hash/sha224.c .. sha512-256.c,
sha256_core / sha512_core compression functions.

Device design: a batch of same-block-count messages is uint32[nblk, 16, N]
(SHA-256) or uint32[nblk, 32, N] (SHA-512 as hi/lo uint32 pairs — the TPU
has no 64-bit lanes, so each 64-bit word is a (hi, lo) pair with explicit
carry on adds). The compression rounds run under lax.scan with the round
constants as scan inputs; every operation is a full-lane VPU op.
"""

from __future__ import annotations

import struct

import numpy as np
import jax
import jax.numpy as jnp

from .base import HashAlg, BlockHashState

# ---------------------------------------------------------------------------
# Constants (FIPS 180-4)
# ---------------------------------------------------------------------------

K256 = [
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
]

H256 = [0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
        0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19]
H224 = [0xc1059ed8, 0x367cd507, 0x3070dd17, 0xf70e5939,
        0xffc00b31, 0x68581511, 0x64f98fa7, 0xbefa4fa4]

K512 = [
    0x428a2f98d728ae22, 0x7137449123ef65cd, 0xb5c0fbcfec4d3b2f, 0xe9b5dba58189dbbc,
    0x3956c25bf348b538, 0x59f111f1b605d019, 0x923f82a4af194f9b, 0xab1c5ed5da6d8118,
    0xd807aa98a3030242, 0x12835b0145706fbe, 0x243185be4ee4b28c, 0x550c7dc3d5ffb4e2,
    0x72be5d74f27b896f, 0x80deb1fe3b1696b1, 0x9bdc06a725c71235, 0xc19bf174cf692694,
    0xe49b69c19ef14ad2, 0xefbe4786384f25e3, 0x0fc19dc68b8cd5b5, 0x240ca1cc77ac9c65,
    0x2de92c6f592b0275, 0x4a7484aa6ea6e483, 0x5cb0a9dcbd41fbd4, 0x76f988da831153b5,
    0x983e5152ee66dfab, 0xa831c66d2db43210, 0xb00327c898fb213f, 0xbf597fc7beef0ee4,
    0xc6e00bf33da88fc2, 0xd5a79147930aa725, 0x06ca6351e003826f, 0x142929670a0e6e70,
    0x27b70a8546d22ffc, 0x2e1b21385c26c926, 0x4d2c6dfc5ac42aed, 0x53380d139d95b3df,
    0x650a73548baf63de, 0x766a0abb3c77b2a8, 0x81c2c92e47edaee6, 0x92722c851482353b,
    0xa2bfe8a14cf10364, 0xa81a664bbc423001, 0xc24b8b70d0f89791, 0xc76c51a30654be30,
    0xd192e819d6ef5218, 0xd69906245565a910, 0xf40e35855771202a, 0x106aa07032bbd1b8,
    0x19a4c116b8d2d0c8, 0x1e376c085141ab53, 0x2748774cdf8eeb99, 0x34b0bcb5e19b48a8,
    0x391c0cb3c5c95a63, 0x4ed8aa4ae3418acb, 0x5b9cca4f7763e373, 0x682e6ff3d6b2b8a3,
    0x748f82ee5defb2fc, 0x78a5636f43172f60, 0x84c87814a1f0ab72, 0x8cc702081a6439ec,
    0x90befffa23631e28, 0xa4506cebde82bde9, 0xbef9a3f7b2c67915, 0xc67178f2e372532b,
    0xca273eceea26619c, 0xd186b8c721c0c207, 0xeada7dd6cde0eb1e, 0xf57d4f7fee6ed178,
    0x06f067aa72176fba, 0x0a637dc5a2c898a6, 0x113f9804bef90dae, 0x1b710b35131c471b,
    0x28db77f523047d84, 0x32caab7b40c72493, 0x3c9ebe0a15c9bebc, 0x431d67c49c100d4c,
    0x4cc5d4becb3e42b6, 0x597f299cfc657e2a, 0x5fcb6fab3ad6faec, 0x6c44198c4a475817,
]

H512 = [0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b,
        0xa54ff53a5f1d36f1, 0x510e527fade682d1, 0x9b05688c2b3e6c1f,
        0x1f83d9abfb41bd6b, 0x5be0cd19137e2179]
H384 = [0xcbbb9d5dc1059ed8, 0x629a292a367cd507, 0x9159015a3070dd17,
        0x152fecd8f70e5939, 0x67332667ffc00b31, 0x8eb44a8768581511,
        0xdb0c2e0d64f98fa7, 0x47b5481dbefa4fa4]
H512_224 = [0x8c3d37c819544da2, 0x73e1996689dcd4d6, 0x1dfab7ae32ff9c82,
            0x679dd514582f9fcf, 0x0f6d2b697bd44da8, 0x77e36f7304c48942,
            0x3f9d85a86a1d36c8, 0x1112e6ad91d692a1]
H512_256 = [0x22312194fc2bf72c, 0x9f555fa3c84c64c2, 0x2393b86b6f53b151,
            0x963877195940eabd, 0x96283ee2a88effe3, 0xbe5e1e2553863992,
            0x2b0199fc2c85b8aa, 0x0eb72ddc81c52ca2]


def _rotr32(x, n):
    return ((x >> n) | (x << (32 - n))) & 0xFFFFFFFF


def _rotr64(x, n):
    return ((x >> n) | (x << (64 - n))) & 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# Host streaming implementations (pure python ints)
# ---------------------------------------------------------------------------

class _Sha256State(BlockHashState):
    block_size = 64
    _iv = H256
    _outlen = 32

    def __init__(self):
        super().__init__()
        self._h = list(self._iv)

    def _compress(self, block: bytes):
        w = list(struct.unpack(">16I", block))
        for t in range(16, 64):
            s0 = _rotr32(w[t - 15], 7) ^ _rotr32(w[t - 15], 18) ^ (w[t - 15] >> 3)
            s1 = _rotr32(w[t - 2], 17) ^ _rotr32(w[t - 2], 19) ^ (w[t - 2] >> 10)
            w.append((w[t - 16] + s0 + w[t - 7] + s1) & 0xFFFFFFFF)
        a, b, c, d, e, f, g, h = self._h
        for t in range(64):
            S1 = _rotr32(e, 6) ^ _rotr32(e, 11) ^ _rotr32(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = (h + S1 + ch + K256[t] + w[t]) & 0xFFFFFFFF
            S0 = _rotr32(a, 2) ^ _rotr32(a, 13) ^ _rotr32(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = (S0 + maj) & 0xFFFFFFFF
            h, g, f, e, d, c, b, a = g, f, e, (d + t1) & 0xFFFFFFFF, c, b, a, (t1 + t2) & 0xFFFFFFFF
        self._h = [(x + y) & 0xFFFFFFFF for x, y in
                   zip(self._h, [a, b, c, d, e, f, g, h])]

    def digest(self) -> bytes:
        # standard MD padding: 0x80, zeros, 64-bit bit length
        msglen = self._length
        pad = b"\x80" + b"\x00" * ((55 - msglen) % 64) + struct.pack(">Q", msglen * 8)
        clone = self.__class__()
        clone._h = list(self._h)
        clone._buf = self._buf
        clone._length = self._length
        BlockHashState.update(clone, pad)
        assert not clone._buf
        out = b"".join(struct.pack(">I", x) for x in clone._h)
        return out[: self._outlen]


class _Sha224State(_Sha256State):
    _iv = H224
    _outlen = 28


class _Sha512State(BlockHashState):
    block_size = 128
    _iv = H512
    _outlen = 64

    def __init__(self):
        super().__init__()
        self._h = list(self._iv)

    def _compress(self, block: bytes):
        w = list(struct.unpack(">16Q", block))
        for t in range(16, 80):
            s0 = _rotr64(w[t - 15], 1) ^ _rotr64(w[t - 15], 8) ^ (w[t - 15] >> 7)
            s1 = _rotr64(w[t - 2], 19) ^ _rotr64(w[t - 2], 61) ^ (w[t - 2] >> 6)
            w.append((w[t - 16] + s0 + w[t - 7] + s1) & 0xFFFFFFFFFFFFFFFF)
        a, b, c, d, e, f, g, h = self._h
        M = 0xFFFFFFFFFFFFFFFF
        for t in range(80):
            S1 = _rotr64(e, 14) ^ _rotr64(e, 18) ^ _rotr64(e, 41)
            ch = (e & f) ^ (~e & g)
            t1 = (h + S1 + ch + K512[t] + w[t]) & M
            S0 = _rotr64(a, 28) ^ _rotr64(a, 34) ^ _rotr64(a, 39)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = (S0 + maj) & M
            h, g, f, e, d, c, b, a = g, f, e, (d + t1) & M, c, b, a, (t1 + t2) & M
        self._h = [(x + y) & M for x, y in zip(self._h, [a, b, c, d, e, f, g, h])]

    def digest(self) -> bytes:
        msglen = self._length
        pad = b"\x80" + b"\x00" * ((111 - msglen) % 128) + struct.pack(">QQ", 0, msglen * 8)
        clone = self.__class__()
        clone._h = list(self._h)
        clone._buf = self._buf
        clone._length = self._length
        BlockHashState.update(clone, pad)
        assert not clone._buf
        out = b"".join(struct.pack(">Q", x) for x in clone._h)
        return out[: self._outlen]


class _Sha384State(_Sha512State):
    _iv = H384
    _outlen = 48


class _Sha512_224State(_Sha512State):
    _iv = H512_224
    _outlen = 28


class _Sha512_256State(_Sha512State):
    _iv = H512_256
    _outlen = 32


# ---------------------------------------------------------------------------
# Batched device kernel: SHA-256 family
# ---------------------------------------------------------------------------

def pack_blocks_sha256(msgs: list[bytes]) -> np.ndarray:
    """Pad+pack equal-*block-count* messages -> uint32[nblk, 16, N].
    Messages may have different lengths as long as the padded block counts
    match (host-side bucketing handles the general case).

    Equal-LENGTH batches take the native C++ packer (OpenMP across the
    batch, native/host_runtime.cpp md_pad_pack_be64) — this is the e2e
    sign/verify hot path, where the Python struct loop costs ~14 ms per
    8192-message batch vs ~1 ms native."""
    if len(msgs) >= 64 and all(len(m) == len(msgs[0]) for m in msgs):
        from ..nn import native
        out = native.md_pad_pack_be64(msgs)
        if out is not None:
            return out
    padded = []
    for m in msgs:
        pad = b"\x80" + b"\x00" * ((55 - len(m)) % 64) + struct.pack(">Q", len(m) * 8)
        padded.append(m + pad)
    nblk = {len(p) // 64 for p in padded}
    if len(nblk) != 1:
        raise ValueError("all messages in a batch must pad to the same block count")
    nblk = nblk.pop()
    arr = np.frombuffer(b"".join(padded), dtype=">u4")
    return np.ascontiguousarray(
        arr.reshape(len(msgs), nblk, 16).transpose(1, 2, 0)).astype(
            np.uint32)


def blocks_from_bytes_dev(msg_u8, mlen: int):
    """DEVICE pad+pack for 64-byte-block big-endian hashes (SHA-2/SM3
    layout): uint8[N, mlen] -> uint32[nblk, 16, N], inside jit. Static
    mlen (one trace per length). Bit-identical to pack_blocks_sha256 —
    the fused e2e path ships raw message bytes and pads on device."""
    n = msg_u8.shape[0]
    nblk = (mlen + 9 + 63) // 64
    padlen = nblk * 64
    tail = np.zeros(padlen - mlen, np.uint8)
    tail[0] = 0x80
    bitlen = mlen * 8
    for i in range(8):
        tail[-1 - i] = (bitlen >> (8 * i)) & 0xFF
    padded = jnp.concatenate(
        [msg_u8, jnp.broadcast_to(jnp.asarray(tail)[None],
                                  (n, tail.shape[0]))], axis=1)
    b = padded.reshape(n, nblk * 16, 4).astype(jnp.uint32)
    words = ((b[:, :, 0] << 24) | (b[:, :, 1] << 16)
             | (b[:, :, 2] << 8) | b[:, :, 3])      # (N, nblk*16) BE
    return words.T.reshape(nblk, 16, n)


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def sha256_device(blocks, iv=H256):
    """Batched SHA-256: uint32[nblk, 16, *batch] -> uint32[8, *batch].
    lax.scan over blocks; inner scan over the 64 rounds with a rolling
    16-word message schedule. Reference: sha256 core compression
    (src/hash/sha256.c)."""
    bshape = blocks.shape[2:]
    h0 = jnp.broadcast_to(
        jnp.array(iv, jnp.uint32).reshape((8,) + (1,) * len(bshape)),
        (8,) + bshape)
    k_arr = jnp.array(K256, jnp.uint32)

    def round_body(carry, kt):
        st, w = carry                      # st: (8, *B), w: (16, *B) rolling
        a, b, c, d, e, f, g, h = [st[i] for i in range(8)]
        w0 = w[0]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + kt + w0
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        st = jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g], 0)
        # schedule: w16 = sigma1(w14) + w9 + sigma0(w1) + w0
        s0 = _rotr(w[1], 7) ^ _rotr(w[1], 18) ^ (w[1] >> 3)
        s1 = _rotr(w[14], 17) ^ _rotr(w[14], 19) ^ (w[14] >> 10)
        w16 = w0 + s0 + w[9] + s1
        w = jnp.concatenate([w[1:], w16[None]], 0)
        return (st, w), None

    def block_body(h, blk):
        (st, _), _ = jax.lax.scan(round_body, (h, blk), k_arr)
        return h + st, None

    h, _ = jax.lax.scan(block_body, h0, blocks)
    return h


def sha224_device(blocks):
    return sha256_device(blocks, iv=H224)[:7]


# ---------------------------------------------------------------------------
# Batched device kernel: SHA-512 family (64-bit words as hi/lo uint32 pairs)
# ---------------------------------------------------------------------------

def pack_blocks_sha512(msgs: list[bytes]) -> np.ndarray:
    """Pad+pack -> uint32[nblk, 32, N]: 16 words as (hi, lo) pairs."""
    padded = []
    for m in msgs:
        pad = (b"\x80" + b"\x00" * ((111 - len(m)) % 128)
               + struct.pack(">QQ", 0, len(m) * 8))
        padded.append(m + pad)
    nblk = {len(p) // 128 for p in padded}
    if len(nblk) != 1:
        raise ValueError("batch must pad to the same block count")
    nblk = nblk.pop()
    arr = np.frombuffer(b"".join(padded), dtype=">u4")
    # (hi, lo) interleaved naturally in big-endian word order
    return np.ascontiguousarray(
        arr.reshape(len(msgs), nblk, 32).transpose(1, 2, 0)).astype(
            np.uint32)


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def _rotr64_pair(h, l, n):
    if n == 32:
        return l, h
    if n < 32:
        nh = (h >> np.uint32(n)) | (l << np.uint32(32 - n))
        nl = (l >> np.uint32(n)) | (h << np.uint32(32 - n))
        return nh, nl
    m = n - 32
    nh = (l >> np.uint32(m)) | (h << np.uint32(32 - m))
    nl = (h >> np.uint32(m)) | (l << np.uint32(32 - m))
    return nh, nl


def _shr64_pair(h, l, n):
    assert 0 < n < 32
    return h >> np.uint32(n), (l >> np.uint32(n)) | (h << np.uint32(32 - n))


def sha512_device(blocks, iv=H512):
    """Batched SHA-512: uint32[nblk, 32, *batch] -> uint32[16, *batch]
    (8 words as hi/lo pairs). Reference: sha512_core.c."""
    bshape = blocks.shape[2:]
    iv_pairs = []
    for v in iv:
        iv_pairs += [v >> 32, v & 0xFFFFFFFF]
    h0 = jnp.broadcast_to(
        jnp.array(iv_pairs, jnp.uint32).reshape((16,) + (1,) * len(bshape)),
        (16,) + bshape)
    k_pairs = np.zeros((80, 2), np.uint32)
    for i, v in enumerate(K512):
        k_pairs[i] = (v >> 32, v & 0xFFFFFFFF)
    k_arr = jnp.asarray(k_pairs)

    def round_body(carry, kt):
        st, w = carry                      # st: (16,*B), w: (32,*B)
        kth, ktl = kt[0], kt[1]
        ah, al, bh, bl, ch_, cl, dh, dl, eh, el, fh, fl, gh, gl, hh, hl = \
            [st[i] for i in range(16)]
        w0h, w0l = w[0], w[1]
        s1a = _rotr64_pair(eh, el, 14)
        s1b = _rotr64_pair(eh, el, 18)
        s1c = _rotr64_pair(eh, el, 41)
        S1h, S1l = s1a[0] ^ s1b[0] ^ s1c[0], s1a[1] ^ s1b[1] ^ s1c[1]
        chh = (eh & fh) ^ (~eh & gh)
        chl = (el & fl) ^ (~el & gl)
        t1h, t1l = _add64(hh, hl, S1h, S1l)
        t1h, t1l = _add64(t1h, t1l, chh, chl)
        t1h, t1l = _add64(t1h, t1l, kth, ktl)
        t1h, t1l = _add64(t1h, t1l, w0h, w0l)
        s0a = _rotr64_pair(ah, al, 28)
        s0b = _rotr64_pair(ah, al, 34)
        s0c = _rotr64_pair(ah, al, 39)
        S0h, S0l = s0a[0] ^ s0b[0] ^ s0c[0], s0a[1] ^ s0b[1] ^ s0c[1]
        majh = (ah & bh) ^ (ah & ch_) ^ (bh & ch_)
        majl = (al & bl) ^ (al & cl) ^ (bl & cl)
        t2h, t2l = _add64(S0h, S0l, majh, majl)
        nah, nal = _add64(t1h, t1l, t2h, t2l)
        ndh, ndl = _add64(dh, dl, t1h, t1l)
        st = jnp.stack([nah, nal, ah, al, bh, bl, ch_, cl,
                        ndh, ndl, eh, el, fh, fl, gh, gl], 0)
        # schedule
        w1h, w1l = w[2], w[3]
        w9h, w9l = w[18], w[19]
        w14h, w14l = w[28], w[29]
        g0a = _rotr64_pair(w1h, w1l, 1)
        g0b = _rotr64_pair(w1h, w1l, 8)
        g0c = _shr64_pair(w1h, w1l, 7)
        g0h, g0l = g0a[0] ^ g0b[0] ^ g0c[0], g0a[1] ^ g0b[1] ^ g0c[1]
        g1a = _rotr64_pair(w14h, w14l, 19)
        g1b = _rotr64_pair(w14h, w14l, 61)
        g1c = _shr64_pair(w14h, w14l, 6)
        g1h, g1l = g1a[0] ^ g1b[0] ^ g1c[0], g1a[1] ^ g1b[1] ^ g1c[1]
        nh, nl = _add64(w0h, w0l, g0h, g0l)
        nh, nl = _add64(nh, nl, w9h, w9l)
        nh, nl = _add64(nh, nl, g1h, g1l)
        w = jnp.concatenate([w[2:], nh[None], nl[None]], 0)
        return (st, w), None

    def block_body(h, blk):
        (st, _), _ = jax.lax.scan(round_body, (h, blk), k_arr)
        outs = []
        for i in range(8):
            sh, sl = _add64(h[2 * i], h[2 * i + 1], st[2 * i], st[2 * i + 1])
            outs += [sh, sl]
        return jnp.stack(outs, 0), None

    h, _ = jax.lax.scan(block_body, h0, blocks)
    return h


def sha384_device(blocks):
    return sha512_device(blocks, iv=H384)[:12]


# ---------------------------------------------------------------------------
# Registry entries
# ---------------------------------------------------------------------------

SHA256 = HashAlg("SHA256", 32, 64, _Sha256State, sha256_device, pack_blocks_sha256,
                 aliases=("SHA-256", "sha256"))
SHA224 = HashAlg("SHA224", 28, 64, _Sha224State, sha224_device, pack_blocks_sha256,
                 aliases=("SHA-224",))
SHA512 = HashAlg("SHA512", 64, 128, _Sha512State, sha512_device, pack_blocks_sha512,
                 aliases=("SHA-512",))
SHA384 = HashAlg("SHA384", 48, 128, _Sha384State, sha384_device, pack_blocks_sha512,
                 aliases=("SHA-384",))
SHA512_224 = HashAlg("SHA512_224", 28, 128, _Sha512_224State,
                     lambda blocks: sha512_device(blocks, iv=H512_224)[:7],
                     pack_blocks_sha512, aliases=("SHA-512/224", "SHA512-224"))
SHA512_256 = HashAlg("SHA512_256", 32, 128, _Sha512_256State,
                     lambda blocks: sha512_device(blocks, iv=H512_256)[:8],
                     pack_blocks_sha512, aliases=("SHA-512/256", "SHA512-256"))

ALGS = [SHA224, SHA256, SHA384, SHA512, SHA512_224, SHA512_256]
