"""BELT-HASH (STB 34.101.31) and BASH-224/256/384/512 (STB 34.101.77) —
Belarusian standard hash functions.

Host streaming implementations. Reference parity: src/hash/belt-hash.c
(belt block cipher + sigma compression) and src/hash/bash.c/bash.h
(bash-f sponge). The BELT S-box and BASH round constants are public
standard data from the STB specifications.
"""

from __future__ import annotations

import struct

from .base import HashAlg, BlockHashState

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF

# -- BELT block cipher (STB 34.101.31) ---------------------------------------

BELT_S = bytes([
    0xB1, 0x94, 0xBA, 0xC8, 0x0A, 0x08, 0xF5, 0x3B, 0x36, 0x6D, 0x00, 0x8E, 0x58, 0x4A, 0x5D, 0xE4,
    0x85, 0x04, 0xFA, 0x9D, 0x1B, 0xB6, 0xC7, 0xAC, 0x25, 0x2E, 0x72, 0xC2, 0x02, 0xFD, 0xCE, 0x0D,
    0x5B, 0xE3, 0xD6, 0x12, 0x17, 0xB9, 0x61, 0x81, 0xFE, 0x67, 0x86, 0xAD, 0x71, 0x6B, 0x89, 0x0B,
    0x5C, 0xB0, 0xC0, 0xFF, 0x33, 0xC3, 0x56, 0xB8, 0x35, 0xC4, 0x05, 0xAE, 0xD8, 0xE0, 0x7F, 0x99,
    0xE1, 0x2B, 0xDC, 0x1A, 0xE2, 0x82, 0x57, 0xEC, 0x70, 0x3F, 0xCC, 0xF0, 0x95, 0xEE, 0x8D, 0xF1,
    0xC1, 0xAB, 0x76, 0x38, 0x9F, 0xE6, 0x78, 0xCA, 0xF7, 0xC6, 0xF8, 0x60, 0xD5, 0xBB, 0x9C, 0x4F,
    0xF3, 0x3C, 0x65, 0x7B, 0x63, 0x7C, 0x30, 0x6A, 0xDD, 0x4E, 0xA7, 0x79, 0x9E, 0xB2, 0x3D, 0x31,
    0x3E, 0x98, 0xB5, 0x6E, 0x27, 0xD3, 0xBC, 0xCF, 0x59, 0x1E, 0x18, 0x1F, 0x4C, 0x5A, 0xB7, 0x93,
    0xE9, 0xDE, 0xE7, 0x2C, 0x8F, 0x0C, 0x0F, 0xA6, 0x2D, 0xDB, 0x49, 0xF4, 0x6F, 0x73, 0x96, 0x47,
    0x06, 0x07, 0x53, 0x16, 0xED, 0x24, 0x7A, 0x37, 0x39, 0xCB, 0xA3, 0x83, 0x03, 0xA9, 0x8B, 0xF6,
    0x92, 0xBD, 0x9B, 0x1C, 0xE5, 0xD1, 0x41, 0x01, 0x54, 0x45, 0xFB, 0xC9, 0x5E, 0x4D, 0x0E, 0xF2,
    0x68, 0x20, 0x80, 0xAA, 0x22, 0x7D, 0x64, 0x2F, 0x26, 0x87, 0xF9, 0x34, 0x90, 0x40, 0x55, 0x11,
    0xBE, 0x32, 0x97, 0x13, 0x43, 0xFC, 0x9A, 0x48, 0xA0, 0x2A, 0x88, 0x5F, 0x19, 0x4B, 0x09, 0xA1,
    0x7E, 0xCD, 0xA4, 0xD0, 0x15, 0x44, 0xAF, 0x8C, 0xA5, 0x84, 0x50, 0xBF, 0x66, 0xD2, 0xE8, 0x8A,
    0xA2, 0xD7, 0x46, 0x52, 0x42, 0xA8, 0xDF, 0xB3, 0x69, 0x74, 0xC5, 0x51, 0xEB, 0x23, 0x29, 0x21,
    0xD4, 0xEF, 0xD9, 0xB4, 0x3A, 0x62, 0x28, 0x75, 0x91, 0x14, 0x10, 0xEA, 0x77, 0x6C, 0xDA, 0x1D,
])

# precomputed G tables: G_TAB[x] = S-box applied bytewise to 32-bit word x
# (computed lazily per rotation below)


def _g(x: int, r: int) -> int:
    y = (BELT_S[x & 0xFF] | (BELT_S[(x >> 8) & 0xFF] << 8)
         | (BELT_S[(x >> 16) & 0xFF] << 16) | (BELT_S[(x >> 24) & 0xFF] << 24))
    return ((y << r) | (y >> (32 - r))) & M32


# key index schedule: row i is the 7-element window starting at -i mod 8
_KIDX = [[(j - i) % 8 for j in range(7)] for i in range(8)]


def belt_encrypt(block: bytes, key32: bytes) -> bytes:
    """BELT block encryption: 16-byte block, 32-byte key schedule."""
    a, b, c, d = struct.unpack("<4I", block)
    k = struct.unpack("<8I", key32)
    for i in range(8):
        ki = _KIDX[i]
        b ^= _g((a + k[ki[0]]) & M32, 5)
        c ^= _g((d + k[ki[1]]) & M32, 21)
        a = (a - _g((b + k[ki[2]]) & M32, 13)) & M32
        e = _g((b + c + k[ki[3]]) & M32, 21) ^ (i + 1)
        b = (b + e) & M32
        c = (c - e) & M32
        d = (d + _g((c + k[ki[4]]) & M32, 13)) & M32
        b ^= _g((a + k[ki[5]]) & M32, 21)
        c ^= _g((d + k[ki[6]]) & M32, 5)
        a, b = b, a
        c, d = d, c
        b, c = c, b
    return struct.pack("<4I", b, d, a, c)


def belt_key_schedule(k: bytes) -> bytes:
    """Key -> 32-byte schedule (16/24/32-byte keys, STB 34.101.31 §6.1)."""
    if len(k) == 16:
        return k + k
    if len(k) == 24:
        ext = bytes(k[i - 24] ^ k[i - 20] ^ k[i - 16] for i in range(24, 32))
        return k + ext
    if len(k) == 32:
        return k
    raise ValueError("belt key must be 16/24/32 bytes")


def _xor16(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def _sigma1(x: bytes, h: bytes) -> bytes:
    """sigma1(X, H) = E_X(h_lo ^ h_hi) ^ (h_lo ^ h_hi)  (16 bytes)."""
    t = _xor16(h[:16], h[16:])
    return _xor16(belt_encrypt(t, x), t)


def _sigma2(x: bytes, h: bytes) -> bytes:
    """sigma2(X, H): the 32-byte belt compression output (new h)."""
    teta0 = _sigma1(x, h)
    k1 = teta0 + h[16:]
    r0 = _xor16(belt_encrypt(x[:16], k1), x[:16])
    k2 = bytes(v ^ 0xFF for v in teta0) + h[:16]
    r1 = _xor16(belt_encrypt(x[16:], k2), x[16:])
    return r0 + r1


class _BeltHash(BlockHashState):
    block_size = 32

    def __init__(self):
        super().__init__()
        self._h = struct.pack("<4Q", 0x3BF5080AC8BA94B1, 0xE45D4A588E006D36,
                              0xACC7B61B9DFA0485, 0x0DCEFD02C2722E25)
        self._ctr = 0          # 128-bit bit counter
        self._s = b"\x00" * 16  # accumulator

    def _block(self, x: bytes, nbytes: int):
        self._ctr = (self._ctr + 8 * nbytes) & ((1 << 128) - 1)
        self._s = _xor16(self._s, _sigma1(x, self._h))
        self._h = _sigma2(x, self._h)

    def _compress(self, block: bytes):
        self._block(block, 32)

    def digest(self) -> bytes:
        h, s, ctr = self._h, self._s, self._ctr
        if self._buf:
            x = self._buf + b"\x00" * (32 - len(self._buf))
            ctr = (ctr + 8 * len(self._buf)) & ((1 << 128) - 1)
            s = _xor16(s, _sigma1(x, h))
            h = _sigma2(x, h)
        state = ctr.to_bytes(16, "little") + s
        return _sigma2(state, h)


BELT_HASH = HashAlg("BELT_HASH", 32, 32, _BeltHash,
                    aliases=("BELT-HASH", "BELTHASH"))


# -- BASH sponge (STB 34.101.77) ----------------------------------------------

BASH_RC = [
    0x3BF5080AC8BA94B1, 0xC1D1659C1BBD92F6, 0x60E8B2CE0DDEC97B,
    0xEC5FB8FE790FBC13, 0xAA043DE6436706A7, 0x8929FF6A5E535BFD,
    0x98BF1E2C50C97550, 0x4C5F8F162864BAA8, 0x262FC78B14325D54,
    0x1317E3C58A192EAA, 0x098BF1E2C50C9755, 0xD8EE19681D669304,
    0x6C770CB40EB34982, 0x363B865A0759A4C1, 0xC73622B47C4C0ACE,
    0x639B115A3E260567, 0xEDE6693460F3DA1D, 0xAAD8D5034F9935A0,
    0x556C6A81A7CC9AD0, 0x2AB63540D3E64D68, 0x155B1AA069F326B4,
    0x0AAD8D5034F9935A, 0x0556C6A81A7CC9AD, 0xDE8082CD72DEBC78,
]

BASH_ROT = [
    (8, 53, 14, 1), (56, 51, 34, 7), (8, 37, 46, 49), (56, 3, 2, 23),
    (8, 21, 14, 33), (56, 19, 34, 39), (8, 5, 46, 17), (56, 35, 2, 55),
]

_PERM_SRC = [15, 10, 9, 12, 11, 14, 13, 8,
             17, 16, 19, 18, 21, 20, 23, 22,
             6, 3, 0, 5, 2, 7, 4, 1]


def _rot64(x, n):
    n %= 64
    if n == 0:
        return x
    return ((x << n) | (x >> (64 - n))) & M64


def bash_f(s: list[int]) -> list[int]:
    """bash-f permutation on 24 u64 words (STB 34.101.77 §6)."""
    s = list(s)
    for rnd in range(24):
        for v in range(8):
            w0, w1, w2 = s[v], s[v + 8], s[v + 16]
            m1, n1, m2, n2 = BASH_ROT[v]
            t0 = _rot64(w0, m1)
            w0 = w0 ^ w1 ^ w2
            t1 = w1 ^ _rot64(w0, n1)
            w1 = t0 ^ t1
            w2 = w2 ^ _rot64(w2, m2) ^ _rot64(t1, n2)
            t0 = (~w2) & M64
            t1 = w0 | w2
            t2 = w0 & w1
            t0 = t0 | w1
            s[v] = w0 ^ t0
            s[v + 8] = w1 ^ t1
            s[v + 16] = w2 ^ t2
        s = [s[_PERM_SRC[i]] for i in range(24)]
        s[23] ^= BASH_RC[rnd]
    return s


class _Bash(BlockHashState):
    digest_size = 32

    def __init__(self):
        super().__init__()
        self.block_size = 192 - 2 * self.digest_size
        # state: 192 bytes; absorb OVERWRITES the rate prefix
        st = bytearray(192)
        st[184] = self.digest_size       # <l/4>_64 tag word at s[23] (LE)
        self._st = bytes(st)

    def _ingest(self, chunk: bytes):
        st = bytearray(self._st)
        st[: len(chunk)] = chunk
        words = list(struct.unpack("<24Q", bytes(st)))
        self._st = struct.pack("<24Q", *bash_f(words))

    def _compress(self, block: bytes):
        self._ingest(block)

    def digest(self) -> bytes:
        st = bytearray(self._st)
        pos = len(self._buf)
        st[pos: self.block_size] = b"\x00" * (self.block_size - pos)
        st[:pos] = self._buf
        st[pos] = 0x40
        words = list(struct.unpack("<24Q", bytes(st)))
        out = struct.pack("<24Q", *bash_f(words))
        return out[: self.digest_size]


def _mk_bash(bits):
    class _B(_Bash):
        digest_size = bits // 8
    _B.__name__ = f"_Bash{bits}"
    return _B


BASH224 = HashAlg("BASH224", 28, 192 - 56, _mk_bash(224), aliases=("BASH-224",))
BASH256 = HashAlg("BASH256", 32, 192 - 64, _mk_bash(256), aliases=("BASH-256",))
BASH384 = HashAlg("BASH384", 48, 192 - 96, _mk_bash(384), aliases=("BASH-384",))
BASH512 = HashAlg("BASH512", 64, 192 - 128, _mk_bash(512), aliases=("BASH-512",))

# ---------------------------------------------------------------------------
# Batched device kernels.
#
# BASH: bash-f is a 24-round ARX permutation over 24 u64 words — same
# device shape as Keccak (hash/sha3.py): u64 lanes as (hi, lo) u32 pairs,
# scan over rounds. Absorption OVERWRITES the rate prefix (bash.h:162
# semantics), so blocks carry the full rate bytes incl. final padding.
#
# BELT: the belt block cipher's G_r = S-box-per-byte + rotate; the byte
# substitution is a one-hot MXU matmul against the 256-entry S table
# (comb-select trick). State h, 128-bit counter and accumulator ride the
# scan carry; the final sigma2(ctr||s, h) runs after the scan.
# ---------------------------------------------------------------------------

import numpy as np


def _pack_bash_factory(digest_size: int):
    rate = 192 - 2 * digest_size

    def pack(msgs: list[bytes]):
        n = len(msgs)
        nblks = {len(m) // rate + 1 for m in msgs}
        if len(nblks) != 1:
            raise ValueError("batch must pad to the same block count")
        nblk = nblks.pop()
        # each block = the full rate region content (48 u32 LE words of
        # the first rate bytes; capacity area untouched by absorb)
        datas = []
        for m in msgs:
            rem = m[(nblk - 1) * rate:]
            datas.append(m[: (nblk - 1) * rate] + rem + b"\x40"
                         + b"\x00" * (rate - len(rem) - 1))
        arr = np.frombuffer(b"".join(datas), dtype="<u4")
        return np.ascontiguousarray(
            arr.reshape(n, nblk, rate // 4).transpose(1, 2, 0)).astype(
                np.uint32)
    return pack


def _bash_f_device(st):
    """st: uint32[24, 2, *batch] (hi, lo) u64 lanes -> permuted state."""
    import jax
    import jax.numpy as jnp

    def rol(h, l, n):
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

    rc_pairs = np.array([(v >> 32, v & M32) for v in BASH_RC], np.uint32)

    def rnd(st, rc):
        lanes = {i: (st[i, 0], st[i, 1]) for i in range(24)}
        out = dict(lanes)
        for v in range(8):
            w0h, w0l = lanes[v]
            w1h, w1l = lanes[v + 8]
            w2h, w2l = lanes[v + 16]
            m1, n1, m2, n2 = BASH_ROT[v]
            t0h, t0l = rol(w0h, w0l, m1)
            w0h, w0l = w0h ^ w1h ^ w2h, w0l ^ w1l ^ w2l
            r1h, r1l = rol(w0h, w0l, n1)
            t1h, t1l = w1h ^ r1h, w1l ^ r1l
            nw1h, nw1l = t0h ^ t1h, t0l ^ t1l
            r2h, r2l = rol(w2h, w2l, m2)
            r3h, r3l = rol(t1h, t1l, n2)
            w2h, w2l = w2h ^ r2h ^ r3h, w2l ^ r2l ^ r3l
            s0h, s0l = (~w2h) | nw1h, (~w2l) | nw1l
            s1h, s1l = w0h | w2h, w0l | w2l
            s2h, s2l = w0h & nw1h, w0l & nw1l
            out[v] = (w0h ^ s0h, w0l ^ s0l)
            out[v + 8] = (nw1h ^ s1h, nw1l ^ s1l)
            out[v + 16] = (w2h ^ s2h, w2l ^ s2l)
        permuted = [out[_PERM_SRC[i]] for i in range(24)]
        lh, ll = permuted[23]
        permuted[23] = (lh ^ rc[0], ll ^ rc[1])
        return jnp.stack([jnp.stack(p, 0) for p in permuted], 0), None

    import jax
    st, _ = jax.lax.scan(rnd, st, jnp.asarray(rc_pairs))
    return st


def _bash_device_factory(digest_size: int):
    rate = 192 - 2 * digest_size

    def fn(blocks):
        import jax
        import jax.numpy as jnp
        bshape = blocks.shape[2:]
        st = jnp.zeros((24, 2) + bshape, jnp.uint32)
        # s[23] = <l/4>_64 tag (LE u64 value digest_size)
        st = st.at[23, 1].set(jnp.full(bshape, digest_size, jnp.uint32))

        def body(st, blk):
            # blk: (rate//4, *B) LE u32 words -> overwrite rate prefix
            lanes = blk.reshape((rate // 8, 2) + bshape)
            # LE u64: first u32 is the LOW half
            lo = lanes[:, 0]
            hi = lanes[:, 1]
            st = st.at[: rate // 8, 0].set(hi)
            st = st.at[: rate // 8, 1].set(lo)
            return _bash_f_device(st), None

        st, _ = jax.lax.scan(body, st, blocks)
        # digest = first digest_size bytes of the LE state serialization
        bs = lambda x: ((x >> np.uint32(24))
                        | ((x >> np.uint32(8)) & np.uint32(0xFF00))
                        | ((x & np.uint32(0xFF00)) << np.uint32(8))
                        | (x << np.uint32(24)))
        words = []
        for i in range((digest_size + 7) // 8):
            words += [bs(st[i, 1]), bs(st[i, 0])]     # lo bytes then hi
        return jnp.stack(words, 0)[: (digest_size + 3) // 4]
    return fn


def _belt_device_tables():
    return np.frombuffer(BELT_S, np.uint8).astype(np.float32)[None, :]  # (1,256)


def _belt_hash_device(blocks):
    """BELT-HASH device kernel.

    blocks: uint32[nblk, 9, N] — rows 0..7 the 32-byte block as LE u32
    words, row 8 the per-lane BIT-length increment of that block.
    Output: uint32[8, N] big-endian digest words."""
    import jax
    import jax.numpy as jnp

    s_tab = jnp.asarray(_belt_device_tables())       # (1, 256) f32
    iota256 = jnp.arange(256, dtype=jnp.uint32)
    bshape = blocks.shape[2:]

    def G(x, r):
        """S-box every byte of x (u32, *B) via one-hot matmul, then
        rotl r."""
        flat = x.reshape(-1)
        bts = [(flat >> np.uint32(8 * i)) & np.uint32(0xFF)
               for i in range(4)]
        idx = jnp.stack(bts, 0).reshape(-1)           # (4*B,)
        onehot = (iota256[:, None] == idx[None, :]).astype(jnp.float32)
        sel = jax.lax.dot_general(
            s_tab, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # (1, 4*B)
        sb = sel.astype(jnp.uint32).reshape((4,) + x.shape)
        y = (sb[0] | (sb[1] << np.uint32(8)) | (sb[2] << np.uint32(16))
             | (sb[3] << np.uint32(24)))
        if r == 0:
            return y
        return (y << np.uint32(r)) | (y >> np.uint32(32 - r))

    def belt_encrypt_dev(blk4, key8):
        """blk4: list of 4 (u32,*B); key8: list of 8 -> 4 words out."""
        a, b, c, d = blk4
        k = key8
        for i in range(8):
            ki = _KIDX[i]
            b = b ^ G(a + k[ki[0]], 5)
            c = c ^ G(d + k[ki[1]], 21)
            a = a - G(b + k[ki[2]], 13)
            e = G(b + c + k[ki[3]], 21) ^ np.uint32(i + 1)
            b = b + e
            c = c - e
            d = d + G(c + k[ki[4]], 13)
            b = b ^ G(a + k[ki[5]], 21)
            c = c ^ G(d + k[ki[6]], 5)
            a, b = b, a
            c, d = d, c
            b, c = c, b
        return [b, d, a, c]

    def sigma1_dev(x8, h8):
        t = [h8[i] ^ h8[i + 4] for i in range(4)]
        enc = belt_encrypt_dev(t, x8)
        return [enc[i] ^ t[i] for i in range(4)]

    def sigma2_dev(x8, h8):
        teta0 = sigma1_dev(x8, h8)
        k1 = teta0 + h8[4:]
        r0e = belt_encrypt_dev(x8[:4], k1)
        r0 = [r0e[i] ^ x8[i] for i in range(4)]
        k2 = [v ^ np.uint32(0xFFFFFFFF) for v in teta0] + h8[:4]
        r1e = belt_encrypt_dev(x8[4:], k2)
        r1 = [r1e[i] ^ x8[4 + i] for i in range(4)]
        return r0 + r1

    h_iv = np.frombuffer(struct.pack(
        "<4Q", 0x3BF5080AC8BA94B1, 0xE45D4A588E006D36,
        0xACC7B61B9DFA0485, 0x0DCEFD02C2722E25), dtype="<u4")

    def unstack8(arr):
        return [arr[i] for i in range(8)]

    def body(carry, blk):
        h, s, ctr = carry                            # (8,*B),(4,*B),(4,*B)
        x8 = unstack8(blk[:8])
        inc = blk[8]
        h_l = unstack8(h)
        s1 = sigma1_dev(x8, h_l)
        s = jnp.stack([s[i] ^ s1[i] for i in range(4)], 0)
        h = jnp.stack(sigma2_dev(x8, h_l), 0)
        # 128-bit counter += inc (32-bit chunks with carries)
        c0 = ctr[0] + inc
        carry0 = (c0 < ctr[0]).astype(jnp.uint32)
        c1 = ctr[1] + carry0
        carry1 = (c1 < ctr[1]).astype(jnp.uint32)
        c2 = ctr[2] + carry1
        carry2 = (c2 < ctr[2]).astype(jnp.uint32)
        c3 = ctr[3] + carry2
        ctr = jnp.stack([c0, c1, c2, c3], 0)
        return (h, s, ctr), None

    h0 = jnp.broadcast_to(
        jnp.asarray(h_iv.copy()).reshape((8,) + (1,) * len(bshape)),
        (8,) + bshape)
    z4 = jnp.zeros((4,) + bshape, jnp.uint32)
    (h, s, ctr), _ = jax.lax.scan(body, (h0, z4, z4), blocks)
    # final: sigma2(ctr128 || s, h)
    state = [ctr[0], ctr[1], ctr[2], ctr[3], s[0], s[1], s[2], s[3]]
    out = sigma2_dev(state, unstack8(h))
    bs = lambda x: ((x >> np.uint32(24))
                    | ((x >> np.uint32(8)) & np.uint32(0xFF00))
                    | ((x & np.uint32(0xFF00)) << np.uint32(8))
                    | (x << np.uint32(24)))
    return jnp.stack([bs(w) for w in out], 0)


def pack_blocks_belt(msgs: list[bytes]):
    """-> uint32[nblk, 9, N]: rows 0..7 = 32-byte block LE words, row 8 =
    per-lane bit increment (256 full, 8*rem final partial; messages that
    are a multiple of 32 bytes have NO padding block — all batch members
    must agree on the block count)."""
    n = len(msgs)
    nblks = {-(-len(m) // 32) for m in msgs}
    if len(nblks) != 1:
        raise ValueError("batch must pad to the same block count")
    nblk = nblks.pop()
    out = np.zeros((nblk, 9, n), np.uint32)
    if nblk:
        datas = [m + b"\x00" * (nblk * 32 - len(m)) for m in msgs]
        arr = np.frombuffer(b"".join(datas), dtype="<u4")
        out[:, :8, :] = arr.reshape(n, nblk, 8).transpose(1, 2, 0)
        out[:, 8, :] = 256
        out[nblk - 1, 8, :] = [8 * (len(m) - (nblk - 1) * 32)
                               for m in msgs]
    return out


BELT_HASH.device_fn = _belt_hash_device
BELT_HASH.pack_fn = pack_blocks_belt
for _alg in (BASH224, BASH256, BASH384, BASH512):
    _alg.device_fn = _bash_device_factory(_alg.digest_size)
    _alg.pack_fn = _pack_bash_factory(_alg.digest_size)

ALGS = [BELT_HASH, BASH224, BASH256, BASH384, BASH512]
