"""Legacy / examples-tier hash family: MD2, MD4, MD5, SHA-0, SHA-1,
MDC-2 (single-DES, ISO/IEC 10118 padding 1 & 2) and GOST R 34.11-94
(both the "test parameter" and RFC 4357 CryptoPro S-boxes).

Reference parity target: /root/reference/src/examples/hash/{md2,md4,md5,
sha0,sha1,mdc2,tdes,gostr34_11_94}.c — the reference keeps these OUT of the
production library and ships them as pluggable example digests for
RSA PKCS#1 v1.5 / X.509 compatibility (examples/hash/hash.c). We mirror
that tiering: host-only implementations (no device kernels — these are
legacy compatibility digests, not benchmark workloads), registered into
the main hash registry so HMAC / RSA PKCS#1 / CLI can name them.

Bit-exactness is enforced against oracle vectors dumped from the compiled
reference example code (tests/vectors/legacy_hash_kats.jsonl, regenerable
via `make -C scripts/oracle legacy`).

Constant tables (MD2 pi-derived S-box, DES S-boxes/permutations, GOST
28147-89 S-boxes) are public standard data (RFC 1319, FIPS 46-3,
GOST R 34.11-94 / RFC 4357).
"""

from __future__ import annotations

import struct

from ..hash.base import HashAlg, HashState, BlockHashState
from ..hash.registry import register

MASK32 = 0xFFFFFFFF


def _rotl32(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & MASK32


# ---------------------------------------------------------------------------
# MD2 (RFC 1319) — 16-byte blocks, pi-digit S-box, running checksum
# ---------------------------------------------------------------------------

_MD2_S = bytes.fromhex(
    "292e43c9a2d87c013d3654a1ecf0061362a705f3c0c7738c98932bd9bc4c82ca"
    "1e9b573cfdd4e01667426f188a17e512be4ec4d6da9ede49a0fbf58ebb2fee7a"
    "a968799115b2073f94c210890b225f21807f5d9a5a903227353ecce7bff79703"
    "ff1930b348a5b5d1d75e922aac56aac64fb838d296a47db676fc6be29c7404f1"
    "459d705964718720865bcf65e62da8021b6025adaeb0b9f61c46616934407e0f"
    "5547a323dd51af3ac35cf9cebac5ea262c530d6e85288409d3dfcdf441814d52"
    "6adc37c86cc1abfa24e17b080cbdb14a7888958be363e86de9cbd5fe3b001d39"
    "f2efb70e6658d0e4a67772f8eb754b0a314450b48fed1f1adb998d339f118314")


class Md2State(HashState):
    block_size = 16

    def __init__(self):
        self._x = bytearray(48)
        self._cksum = bytearray(16)
        self._buf = b""

    def _compress(self, block: bytes):
        x = self._x
        for j in range(16):
            x[16 + j] = block[j]
            x[32 + j] = x[16 + j] ^ x[j]
        t = 0
        for r in range(18):
            for j in range(48):
                x[j] ^= _MD2_S[t]
                t = x[j]
            t = (t + r) & 0xFF
        # checksum over the raw block
        ck = self._cksum
        l = ck[15]
        for j in range(16):
            ck[j] ^= _MD2_S[block[j] ^ l]
            l = ck[j]

    def update(self, data: bytes):
        self._buf += bytes(data)
        while len(self._buf) >= 16:
            self._compress(self._buf[:16])
            self._buf = self._buf[16:]

    def digest(self) -> bytes:
        # pad to a full block with `padlen` bytes of value padlen (always
        # adds 1..16 bytes), then absorb the checksum as a final block
        x = Md2State()
        x._x = bytearray(self._x)
        x._cksum = bytearray(self._cksum)
        x._buf = self._buf
        padlen = 16 - len(x._buf)
        x.update(bytes([padlen]) * padlen)
        x._compress(bytes(x._cksum))
        return bytes(x._x[:16])


# ---------------------------------------------------------------------------
# MD4 (RFC 1320) / MD5 (RFC 1321) — 64-byte blocks, little-endian lengths
# ---------------------------------------------------------------------------

class _Md45Base(BlockHashState):
    block_size = 64
    _iv = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)

    def __init__(self):
        super().__init__()
        self._h = list(self._iv)

    def digest(self) -> bytes:
        clone = type(self)()
        clone._h = list(self._h)
        clone._buf = self._buf
        clone._length = self._length
        bitlen = clone._length * 8
        pad = b"\x80" + b"\x00" * ((55 - clone._length) % 64)
        clone.update(pad + struct.pack("<Q", bitlen))
        assert not clone._buf
        return struct.pack("<4I", *clone._h)


_MD5_K = [int(abs(__import__("math").sin(i + 1)) * 2**32) & MASK32
          for i in range(64)]
_MD5_R = ([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 +
          [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4)


class Md5State(_Md45Base):
    def _compress(self, block: bytes):
        m = struct.unpack("<16I", block)
        a, b, c, d = self._h
        for i in range(64):
            if i < 16:
                f, g = (b & c) | (~b & d), i
            elif i < 32:
                f, g = (d & b) | (~d & c), (5 * i + 1) % 16
            elif i < 48:
                f, g = b ^ c ^ d, (3 * i + 5) % 16
            else:
                f, g = c ^ (b | (~d & MASK32)), (7 * i) % 16
            f = (f + a + _MD5_K[i] + m[g]) & MASK32
            a, d, c = d, c, b
            b = (b + _rotl32(f, _MD5_R[i])) & MASK32
        h = self._h
        h[0] = (h[0] + a) & MASK32
        h[1] = (h[1] + b) & MASK32
        h[2] = (h[2] + c) & MASK32
        h[3] = (h[3] + d) & MASK32


class Md4State(_Md45Base):
    def _compress(self, block: bytes):
        x = struct.unpack("<16I", block)
        a, b, c, d = self._h

        def rnd1(a, b, c, d, k, s):
            return _rotl32((a + ((b & c) | (~b & d)) + x[k]) & MASK32, s)

        def rnd2(a, b, c, d, k, s):
            return _rotl32(
                (a + ((b & c) | (b & d) | (c & d)) + x[k] + 0x5A827999)
                & MASK32, s)

        def rnd3(a, b, c, d, k, s):
            return _rotl32((a + (b ^ c ^ d) + x[k] + 0x6ED9EBA1) & MASK32, s)

        for k in range(0, 16, 4):
            a = rnd1(a, b, c, d, k, 3)
            d = rnd1(d, a, b, c, k + 1, 7)
            c = rnd1(c, d, a, b, k + 2, 11)
            b = rnd1(b, c, d, a, k + 3, 19)
        for k in (0, 1, 2, 3):
            a = rnd2(a, b, c, d, k, 3)
            d = rnd2(d, a, b, c, k + 4, 5)
            c = rnd2(c, d, a, b, k + 8, 9)
            b = rnd2(b, c, d, a, k + 12, 13)
        for k in (0, 2, 1, 3):
            a = rnd3(a, b, c, d, k, 3)
            d = rnd3(d, a, b, c, k + 8, 9)
            c = rnd3(c, d, a, b, k + 4, 11)
            b = rnd3(b, c, d, a, k + 12, 15)
        h = self._h
        h[0] = (h[0] + a) & MASK32
        h[1] = (h[1] + b) & MASK32
        h[2] = (h[2] + c) & MASK32
        h[3] = (h[3] + d) & MASK32


# ---------------------------------------------------------------------------
# SHA-0 / SHA-1 (FIPS 180; SHA-0 = SHA-1 without the W-schedule rotate)
# ---------------------------------------------------------------------------

class _Sha01Base(BlockHashState):
    block_size = 64
    _w_rot = 0  # SHA-0; SHA-1 sets 1

    def __init__(self):
        super().__init__()
        self._h = [0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476,
                   0xC3D2E1F0]

    def _compress(self, block: bytes):
        w = list(struct.unpack(">16I", block))
        for i in range(16, 80):
            t = w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16]
            w.append(_rotl32(t, self._w_rot) if self._w_rot else t)
        a, b, c, d, e = self._h
        for i in range(80):
            if i < 20:
                f, k = (b & c) | (~b & d), 0x5A827999
            elif i < 40:
                f, k = b ^ c ^ d, 0x6ED9EBA1
            elif i < 60:
                f, k = (b & c) | (b & d) | (c & d), 0x8F1BBCDC
            else:
                f, k = b ^ c ^ d, 0xCA62C1D6
            t = (_rotl32(a, 5) + f + e + k + w[i]) & MASK32
            e, d, c, b, a = d, c, _rotl32(b, 30), a, t
        h = self._h
        for i, v in enumerate((a, b, c, d, e)):
            h[i] = (h[i] + v) & MASK32

    def digest(self) -> bytes:
        clone = type(self)()
        clone._h = list(self._h)
        clone._buf = self._buf
        clone._length = self._length
        bitlen = clone._length * 8
        pad = b"\x80" + b"\x00" * ((55 - clone._length) % 64)
        clone.update(pad + struct.pack(">Q", bitlen))
        return struct.pack(">5I", *clone._h)


class Sha0State(_Sha01Base):
    _w_rot = 0


class Sha1State(_Sha01Base):
    _w_rot = 1


# ---------------------------------------------------------------------------
# DES (encryption only; FIPS 46-3) — the MDC-2 block primitive
# ---------------------------------------------------------------------------

_DES_IP = [58, 50, 42, 34, 26, 18, 10, 2, 60, 52, 44, 36, 28, 20, 12, 4,
           62, 54, 46, 38, 30, 22, 14, 6, 64, 56, 48, 40, 32, 24, 16, 8,
           57, 49, 41, 33, 25, 17, 9, 1, 59, 51, 43, 35, 27, 19, 11, 3,
           61, 53, 45, 37, 29, 21, 13, 5, 63, 55, 47, 39, 31, 23, 15, 7]
_DES_FP = [40, 8, 48, 16, 56, 24, 64, 32, 39, 7, 47, 15, 55, 23, 63, 31,
           38, 6, 46, 14, 54, 22, 62, 30, 37, 5, 45, 13, 53, 21, 61, 29,
           36, 4, 44, 12, 52, 20, 60, 28, 35, 3, 43, 11, 51, 19, 59, 27,
           34, 2, 42, 10, 50, 18, 58, 26, 33, 1, 41, 9, 49, 17, 57, 25]
_DES_E = [32, 1, 2, 3, 4, 5, 4, 5, 6, 7, 8, 9, 8, 9, 10, 11, 12, 13,
          12, 13, 14, 15, 16, 17, 16, 17, 18, 19, 20, 21, 20, 21, 22, 23,
          24, 25, 24, 25, 26, 27, 28, 29, 28, 29, 30, 31, 32, 1]
_DES_P = [16, 7, 20, 21, 29, 12, 28, 17, 1, 15, 23, 26, 5, 18, 31, 10,
          2, 8, 24, 14, 32, 27, 3, 9, 19, 13, 30, 6, 22, 11, 4, 25]
_DES_PC1 = [57, 49, 41, 33, 25, 17, 9, 1, 58, 50, 42, 34, 26, 18,
            10, 2, 59, 51, 43, 35, 27, 19, 11, 3, 60, 52, 44, 36,
            63, 55, 47, 39, 31, 23, 15, 7, 62, 54, 46, 38, 30, 22,
            14, 6, 61, 53, 45, 37, 29, 21, 13, 5, 28, 20, 12, 4]
_DES_PC2 = [14, 17, 11, 24, 1, 5, 3, 28, 15, 6, 21, 10,
            23, 19, 12, 4, 26, 8, 16, 7, 27, 20, 13, 2,
            41, 52, 31, 37, 47, 55, 30, 40, 51, 45, 33, 48,
            44, 49, 39, 56, 34, 53, 46, 42, 50, 36, 29, 32]
_DES_SHIFTS = [1, 1, 2, 2, 2, 2, 2, 2, 1, 2, 2, 2, 2, 2, 2, 1]
_DES_S = [
    [14, 4, 13, 1, 2, 15, 11, 8, 3, 10, 6, 12, 5, 9, 0, 7,
     0, 15, 7, 4, 14, 2, 13, 1, 10, 6, 12, 11, 9, 5, 3, 8,
     4, 1, 14, 8, 13, 6, 2, 11, 15, 12, 9, 7, 3, 10, 5, 0,
     15, 12, 8, 2, 4, 9, 1, 7, 5, 11, 3, 14, 10, 0, 6, 13],
    [15, 1, 8, 14, 6, 11, 3, 4, 9, 7, 2, 13, 12, 0, 5, 10,
     3, 13, 4, 7, 15, 2, 8, 14, 12, 0, 1, 10, 6, 9, 11, 5,
     0, 14, 7, 11, 10, 4, 13, 1, 5, 8, 12, 6, 9, 3, 2, 15,
     13, 8, 10, 1, 3, 15, 4, 2, 11, 6, 7, 12, 0, 5, 14, 9],
    [10, 0, 9, 14, 6, 3, 15, 5, 1, 13, 12, 7, 11, 4, 2, 8,
     13, 7, 0, 9, 3, 4, 6, 10, 2, 8, 5, 14, 12, 11, 15, 1,
     13, 6, 4, 9, 8, 15, 3, 0, 11, 1, 2, 12, 5, 10, 14, 7,
     1, 10, 13, 0, 6, 9, 8, 7, 4, 15, 14, 3, 11, 5, 2, 12],
    [7, 13, 14, 3, 0, 6, 9, 10, 1, 2, 8, 5, 11, 12, 4, 15,
     13, 8, 11, 5, 6, 15, 0, 3, 4, 7, 2, 12, 1, 10, 14, 9,
     10, 6, 9, 0, 12, 11, 7, 13, 15, 1, 3, 14, 5, 2, 8, 4,
     3, 15, 0, 6, 10, 1, 13, 8, 9, 4, 5, 11, 12, 7, 2, 14],
    [2, 12, 4, 1, 7, 10, 11, 6, 8, 5, 3, 15, 13, 0, 14, 9,
     14, 11, 2, 12, 4, 7, 13, 1, 5, 0, 15, 10, 3, 9, 8, 6,
     4, 2, 1, 11, 10, 13, 7, 8, 15, 9, 12, 5, 6, 3, 0, 14,
     11, 8, 12, 7, 1, 14, 2, 13, 6, 15, 0, 9, 10, 4, 5, 3],
    [12, 1, 10, 15, 9, 2, 6, 8, 0, 13, 3, 4, 14, 7, 5, 11,
     10, 15, 4, 2, 7, 12, 9, 5, 6, 1, 13, 14, 0, 11, 3, 8,
     9, 14, 15, 5, 2, 8, 12, 3, 7, 0, 4, 10, 1, 13, 11, 6,
     4, 3, 2, 12, 9, 5, 15, 10, 11, 14, 1, 7, 6, 0, 8, 13],
    [4, 11, 2, 14, 15, 0, 8, 13, 3, 12, 9, 7, 5, 10, 6, 1,
     13, 0, 11, 7, 4, 9, 1, 10, 14, 3, 5, 12, 2, 15, 8, 6,
     1, 4, 11, 13, 12, 3, 7, 14, 10, 15, 6, 8, 0, 5, 9, 2,
     6, 11, 13, 8, 1, 4, 10, 7, 9, 5, 0, 15, 14, 2, 3, 12],
    [13, 2, 8, 4, 6, 15, 11, 1, 10, 9, 3, 14, 5, 0, 12, 7,
     1, 15, 13, 8, 10, 3, 7, 4, 12, 5, 6, 11, 0, 14, 9, 2,
     7, 11, 4, 1, 9, 12, 14, 2, 0, 6, 10, 13, 15, 3, 5, 8,
     2, 1, 14, 7, 4, 10, 8, 13, 15, 12, 9, 0, 3, 5, 6, 11],
]


def _permute(val: int, nbits_in: int, table) -> int:
    out = 0
    for pos in table:
        out = (out << 1) | ((val >> (nbits_in - pos)) & 1)
    return out


def _des_subkeys(key8: bytes):
    k = int.from_bytes(key8, "big")
    cd = _permute(k, 64, _DES_PC1)
    c, d = cd >> 28, cd & 0xFFFFFFF
    keys = []
    for s in _DES_SHIFTS:
        c = ((c << s) | (c >> (28 - s))) & 0xFFFFFFF
        d = ((d << s) | (d >> (28 - s))) & 0xFFFFFFF
        keys.append(_permute((c << 28) | d, 56, _DES_PC2))
    return keys


def des_encrypt_block(key8: bytes, block8: bytes) -> bytes:
    """Single-DES ECB encryption of one 8-byte block (FIPS 46-3).
    Parity bits of `key8` are ignored (as in the standard key schedule)."""
    v = _permute(int.from_bytes(block8, "big"), 64, _DES_IP)
    l, r = v >> 32, v & MASK32
    for sk in _des_subkeys(key8):
        e = _permute(r, 32, _DES_E) ^ sk
        sout = 0
        for i in range(8):
            six = (e >> (42 - 6 * i)) & 0x3F
            row = ((six & 0x20) >> 4) | (six & 1)
            col = (six >> 1) & 0xF
            sout = (sout << 4) | _DES_S[i][16 * row + col]
        l, r = r, l ^ _permute(sout, 32, _DES_P)
    return _permute((r << 32) | l, 64, _DES_FP).to_bytes(8, "big")


# ---------------------------------------------------------------------------
# MDC-2 (single DES; reference mdc2.c) — ISO/IEC 10118-2 padding 1 and 2
# ---------------------------------------------------------------------------

class Mdc2State(HashState):
    """MDC-2 over single-DES. padding=1: zero-pad a trailing partial block
    only; padding=2: always append a 0x80-started block (reference
    mdc2.c mdc2_final)."""

    block_size = 8

    def __init__(self, padding: int = 1):
        self._a = bytearray(b"\x52" * 8)
        self._b = bytearray(b"\x25" * 8)
        self._buf = b""
        self._padding = padding

    def _process(self, m: bytes):
        a, b = self._a, self._b
        a[0] = (a[0] & 0x9F) | 0x40
        b[0] = (b[0] & 0x9F) | 0x20
        # odd-parity the key bytes (DES ignores parity bits; kept for
        # fidelity with the reference's key conditioning)
        v = des_encrypt_block(bytes(a), m)
        w = des_encrypt_block(bytes(b), m)
        v = bytes(x ^ y for x, y in zip(v, m))
        w = bytes(x ^ y for x, y in zip(w, m))
        self._a = bytearray(v[:4] + w[4:])
        self._b = bytearray(w[:4] + v[4:])

    def update(self, data: bytes):
        self._buf += bytes(data)
        while len(self._buf) >= 8:
            self._process(self._buf[:8])
            self._buf = self._buf[8:]

    def digest(self) -> bytes:
        clone = Mdc2State(self._padding)
        clone._a = bytearray(self._a)
        clone._b = bytearray(self._b)
        clone._buf = self._buf
        if clone._padding == 1:
            if clone._buf:
                clone._process(clone._buf + b"\x00" * (8 - len(clone._buf)))
        else:
            clone._process(
                clone._buf + b"\x80" + b"\x00" * (7 - len(clone._buf)))
        return bytes(clone._a) + bytes(clone._b)


# ---------------------------------------------------------------------------
# GOST R 34.11-94 (reference gostr34_11_94.c) — GOST 28147-89 based
# ---------------------------------------------------------------------------

_GOST_SBOX_NORM = [
    [4, 10, 9, 2, 13, 8, 0, 14, 6, 11, 1, 12, 7, 15, 5, 3],
    [14, 11, 4, 12, 6, 13, 15, 10, 2, 3, 8, 1, 0, 7, 5, 9],
    [5, 8, 1, 13, 10, 3, 4, 2, 14, 15, 12, 7, 6, 0, 9, 11],
    [7, 13, 10, 1, 0, 8, 9, 15, 14, 4, 6, 12, 11, 2, 5, 3],
    [6, 12, 7, 1, 5, 15, 13, 8, 4, 10, 9, 14, 0, 3, 11, 2],
    [4, 11, 10, 0, 7, 2, 1, 13, 3, 6, 8, 5, 9, 12, 15, 14],
    [13, 11, 4, 1, 3, 15, 5, 9, 0, 10, 14, 7, 6, 8, 2, 12],
    [1, 15, 13, 0, 5, 7, 10, 4, 9, 2, 3, 14, 6, 11, 8, 12],
]
_GOST_SBOX_RFC4357 = [
    [10, 4, 5, 6, 8, 1, 3, 7, 13, 12, 14, 0, 9, 2, 11, 15],
    [5, 15, 4, 0, 2, 13, 11, 9, 1, 7, 6, 3, 12, 14, 10, 8],
    [7, 15, 12, 14, 9, 4, 1, 0, 3, 11, 5, 2, 6, 10, 8, 13],
    [4, 10, 7, 12, 0, 15, 2, 8, 14, 1, 6, 5, 13, 11, 9, 3],
    [7, 6, 4, 11, 9, 12, 2, 10, 1, 8, 0, 14, 15, 13, 3, 5],
    [7, 6, 2, 4, 13, 9, 15, 0, 10, 1, 5, 11, 8, 14, 12, 3],
    [13, 14, 4, 1, 7, 0, 5, 10, 3, 12, 8, 15, 6, 2, 9, 11],
    [1, 3, 10, 9, 5, 11, 4, 15, 8, 6, 7, 14, 13, 0, 2, 12],
]

# key-generation constant C2 (C1=C3=0); bytes as stored little-endian in
# the reference's u64[4] (gostr34_11_94.c:86)
_GOST_C2 = b"".join(struct.pack("<Q", c) for c in (
    0xFF000000FFFF00FF, 0x00FFFF00FF0000FF,
    0xFF00FF00FF00FF00, 0x00FF00FF00FF00FF))


def _gost_A(y: bytes) -> bytes:
    # words are 8-byte units of the state memory (u64 mem order)
    y1, y2, y3, y4 = y[24:32], y[16:24], y[8:16], y[0:8]
    return bytes(a ^ b for a, b in zip(y1, y2)) + y4 + y3 + y2


def _gost_P(y: bytes) -> bytes:
    out = bytearray(32)
    for i in range(4):
        for k in range(1, 9):
            out[32 - (i + 4 * (k - 1)) - 1] = y[8 * i + k - 1]
    return bytes(out)


def _gost_encrypt(key32: bytes, block8: bytes, sbox) -> bytes:
    """GOST 28147-89 encryption of one 8-byte unit, exactly as the
    reference wires it (gostr34_11_94.c:135 — L/R loaded big-endian from
    the state word, subkeys little-endian from the key memory)."""
    l = int.from_bytes(block8[0:4], "big")
    r = int.from_bytes(block8[4:8], "big")
    subkeys = [int.from_bytes(key32[4 * i:4 * i + 4], "little")
               for i in range(8)]
    for rnd in range(32):
        sk = subkeys[rnd % 8] if rnd < 24 else subkeys[7 - (rnd % 8)]
        t = (r + sk) & MASK32
        s = 0
        for nib in range(8):
            s |= sbox[nib][(t >> (4 * nib)) & 0xF] << (4 * nib)
        t = _rotl32(s, 11) ^ l
        l, r = r, t
    return l.to_bytes(4, "little") + r.to_bytes(4, "little")


def _gost_psi(g: bytes) -> bytes:
    # 16-bit unit shuffle on state memory
    out = g[2:32]
    t = bytes(a ^ b for a, b in zip(g[0:2], g[2:4]))
    t = bytes(a ^ b for a, b in zip(t, g[4:6]))
    t = bytes(a ^ b for a, b in zip(t, g[6:8]))
    t = bytes(a ^ b for a, b in zip(t, g[24:26]))
    t = bytes(a ^ b for a, b in zip(t, g[30:32]))
    return out + t


def _xor32(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


class Gost94State(HashState):
    """GOST R 34.11-94 (reference gostr34_11_94.c). State kept in the
    reference's u64[4] memory layout; `data order` = reversed memory."""

    block_size = 32

    def __init__(self, sbox=None):
        self._h = bytes(32)          # state memory (LE u64[4] layout)
        self._sum = 0                # 256-bit checksum of blocks
        self._total = 0
        self._buf = b""
        self._sbox = sbox if sbox is not None else _GOST_SBOX_NORM

    def _process(self, data: bytes):
        m = data[::-1]               # block in state-memory order
        h = self._h[::-1]            # reference reverses H the same way
        # key generation (gostr34_11_94_key_generation)
        u, v = h, m
        keys = [_gost_P(_xor32(u, v))]
        for i in range(1, 4):
            u = _gost_A(u)
            if i == 2:               # C2 applied at i==2 (C[i-1], C1=C3=0)
                u = _xor32(u, _GOST_C2)
            v = _gost_A(_gost_A(v))
            keys.append(_gost_P(_xor32(u, v)))
        # state encryption: s_i = E(K_i, h_i) with h_1 = word 3 of memory
        s = b"".join(
            _gost_encrypt(keys[i], h[8 * (3 - i):8 * (3 - i) + 8],
                          self._sbox)
            for i in range(4))
        # output transform: psi^12(S) ^ M ^ H (word+byte reversal folds
        # into plain data-order XOR, see gostr34_11_94.c:252-295), psi^61
        g = s
        for _ in range(12):
            g = _gost_psi(g)
        g = _gost_psi(_xor32(g, m[::-1]))
        g = _xor32(g, h[::-1])
        for _ in range(61):
            g = _gost_psi(g)
        self._h = g          # output transform writes state memory directly
        self._sum = (self._sum + int.from_bytes(data, "little")) % (1 << 256)

    def update(self, data: bytes):
        data = bytes(data)
        self._total += len(data)
        self._buf += data
        while len(self._buf) >= 32:
            self._process(self._buf[:32])
            self._buf = self._buf[32:]

    def digest(self) -> bytes:
        clone = Gost94State(self._sbox)
        clone._h, clone._sum = self._h, self._sum
        clone._total, clone._buf = self._total, self._buf
        if clone._buf:
            clone._process(clone._buf + b"\x00" * (32 - len(clone._buf)))
            clone._buf = b""
        length_block = struct.pack("<Q", 8 * clone._total) + bytes(24)
        sum_block = clone._sum.to_bytes(32, "little")
        clone._process(length_block)
        clone._process(sum_block)
        return clone._h              # digest = raw state memory


# ---------------------------------------------------------------------------
# Registration
# ---------------------------------------------------------------------------

def _mk(name, dsize, bsize, factory, aliases=()):
    return HashAlg(name=name, digest_size=dsize, block_size=bsize,
                   new=factory, aliases=aliases)


ALGS = [
    _mk("MD2", 16, 16, Md2State),
    _mk("MD4", 16, 64, Md4State),
    _mk("MD5", 16, 64, Md5State),
    _mk("SHA0", 20, 64, Sha0State, aliases=("SHA-0",)),
    _mk("SHA1", 20, 64, Sha1State, aliases=("SHA-1",)),
    _mk("MDC2_PAD1", 16, 8, lambda: Mdc2State(1), aliases=("MDC2",)),
    _mk("MDC2_PAD2", 16, 8, lambda: Mdc2State(2)),
    _mk("GOST34_11_94_NORM", 32, 32, lambda: Gost94State(_GOST_SBOX_NORM),
        aliases=("GOST34_11_94", "GOSTR34_11_94")),
    _mk("GOST34_11_94_RFC4357", 32, 32,
        lambda: Gost94State(_GOST_SBOX_RFC4357)),
]

for _alg in ALGS:
    register(_alg)

del _alg
