"""Hash layer base: registry entry + streaming (IUF) host API.

TPU-native analog of the reference hash registry (src/hash/hash_algs.h:241
`hash_mapping`, table :258). Each algorithm provides:

  * a host streaming implementation (init/update/finalize — the IUF surface
    used by signature contexts, HMAC and RFC 6979), operating on bytes;
  * optionally a *batched device kernel*: a jit-friendly function mapping
    pre-padded message blocks uint32[nblk, words, N] -> digest uint32[w, N],
    used by the batched sign/verify pipelines (hashing is part of the
    benchmark workload, SURVEY §6).

Messages on TPU are fixed-shape: the host packs/pads variable-length
messages into block tensors (the reference's arbitrary-length streaming
becomes host-side bucketing; hashes are sequential in blocks by design, so
the batch axis — not the message axis — carries the parallelism;
SURVEY §2.13).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass
class HashAlg:
    name: str
    digest_size: int
    block_size: int
    new: Callable[[], "HashState"]             # host streaming state factory
    # device batched: f(blocks u32[nblk, bwords, N]) -> u32[dwords, N]
    device_fn: Callable | None = None
    # device: pad+pack a batch of equal-length messages (host helper)
    pack_fn: Callable | None = None
    aliases: tuple = ()

    def hash(self, data: bytes) -> bytes:
        st = self.new()
        st.update(data)
        return st.digest()

    def hash_scattered(self, chunks) -> bytes:
        """Digest of a scattered chunk list, absorbed in order without
        concatenating on the caller's side (the reference's
        hfunc_scattered entry, src/hash/hash_algs.h:241 — used for
        multi-buffer signing inputs)."""
        st = self.new()
        for c in chunks:
            st.update(c)
        return st.digest()


class HashState:
    """Host streaming hash state (init/update/finalize pattern,
    reference: hfunc_init/update/finalize, src/hash/hash_algs.h:115)."""

    def update(self, data: bytes) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def digest(self) -> bytes:  # pragma: no cover - interface
        raise NotImplementedError


class BlockHashState(HashState):
    """Generic Merkle-Damgård style buffering driver: subclasses implement
    `_compress(block: bytes)` and `_finalize_padding()`/`_output()`."""

    block_size = 64

    def __init__(self):
        self._buf = b""
        self._length = 0

    def update(self, data: bytes):
        if not isinstance(data, (bytes, bytearray, memoryview)):
            raise TypeError("bytes required")
        self._length += len(data)
        self._buf += bytes(data)
        while len(self._buf) >= self.block_size:
            self._compress(self._buf[: self.block_size])
            self._buf = self._buf[self.block_size:]

    def _compress(self, block: bytes):  # pragma: no cover - interface
        raise NotImplementedError
