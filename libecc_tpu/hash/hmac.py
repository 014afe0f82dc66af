"""HMAC (FIPS 198-1) generic over any registered hash.

Reference: src/hash/hmac.c (185 LoC) — used by RFC 6979 deterministic
ECDSA nonces (DECDSA) and exposed as a public capability. Host-side
implementation (HMAC chains are sequential; batching happens at the
message level in the sig layer, which calls this per lane on host or
uses the batched device DRBG when available).
"""

from __future__ import annotations

from .registry import get_hash


def hmac(key: bytes, msg: bytes, hash_name="SHA256") -> bytes:
    alg = get_hash(hash_name)
    bs = alg.block_size
    if len(key) > bs:
        key = alg.hash(key)
    key = key + b"\x00" * (bs - len(key))
    ipad = bytes(k ^ 0x36 for k in key)
    opad = bytes(k ^ 0x5C for k in key)
    inner = alg.hash(ipad + msg)
    return alg.hash(opad + inner)


class Hmac:
    """Streaming HMAC (init/update/finalize), mirroring hmac_init/update/
    finalize (src/hash/hmac.h:26-34)."""

    def __init__(self, key: bytes, hash_name="SHA256"):
        self.alg = get_hash(hash_name)
        bs = self.alg.block_size
        if len(key) > bs:
            key = self.alg.hash(key)
        key = key + b"\x00" * (bs - len(key))
        self._opad = bytes(k ^ 0x5C for k in key)
        self._inner = self.alg.new()
        self._inner.update(bytes(k ^ 0x36 for k in key))

    def update(self, data: bytes):
        self._inner.update(data)

    def digest(self) -> bytes:
        return self.alg.hash(self._opad + self._inner.digest())
