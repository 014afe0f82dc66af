"""ctypes loader for the native host runtime (native/host_runtime.cpp).

Builds the shared library on first use (g++, cached in native/build/) and
exposes the batched byte<->limb converters. All callers fall back to the
numpy implementations in nn.core when the toolchain or build is missing,
so the native layer is a pure acceleration of the host boundary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_ROOT = os.path.normpath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SO = os.path.join(_ROOT, "native", "build", "libecc_tpu_host.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("LIBECC_TPU_NO_NATIVE"):
        return None
    from . import core as _core
    if _core.LIMB_BITS != 15:
        return None          # C++ converters hardcode 15-bit limbs
    try:
        # the .so is built -march=native: rebuild when the PHYSICAL host
        # changed under us (microVM migration — /proc/cpuinfo is a
        # template; see libecc_tpu._host_cpu_fingerprint)
        import libecc_tpu as _pkg
        fp = _pkg._host_cpu_fingerprint()
        fp_file = os.path.join(_ROOT, "native", "build", ".cpufp")
        stale = True
        try:
            with open(fp_file) as f:
                stale = f.read().strip() != fp
        except OSError:
            pass
        if stale or not os.path.exists(_SO):
            subprocess.run(["make", "-s", "-B"],
                           cwd=os.path.join(_ROOT, "native"),
                           check=True, capture_output=True, timeout=120)
            with open(fp_file, "w") as f:
                f.write(fp)
        lib = ctypes.CDLL(_SO)
        lib.be_bytes_to_limbs.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_int]
        lib.limbs_to_be_bytes.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_size_t]
        lib.md_pad_pack_be64.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t]
        lib.md_pad_pack_be64.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def be_bytes_to_limbs(bufs: list[bytes], k: int) -> np.ndarray | None:
    """Native equal-length big-endian bytes -> uint32[k, n] limbs, or None
    when the native library is unavailable."""
    lib = _load()
    if lib is None or not bufs:
        return None
    item_len = len(bufs[0])
    joined = b"".join(bufs)
    if len(joined) != item_len * len(bufs):
        return None   # ragged input -> numpy path
    n = len(bufs)
    out = np.empty((k, n), np.uint32)
    lib.be_bytes_to_limbs(joined, n, item_len,
                          out.ctypes.data_as(ctypes.c_void_p), k)
    return out


def limbs_to_be_bytes(arr: np.ndarray, item_len: int) -> list[bytes] | None:
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, dtype=np.uint32)
    k, n = arr.shape
    out = np.empty(n * item_len, np.uint8)
    lib.limbs_to_be_bytes(arr.ctypes.data_as(ctypes.c_void_p), n, k,
                          out.ctypes.data_as(ctypes.c_void_p), item_len)
    raw = out.tobytes()
    return [raw[i * item_len:(i + 1) * item_len] for i in range(n)]


def md_pad_pack_be64(msgs: list[bytes]) -> np.ndarray | None:
    """Native pad+pack for 64-byte-block big-endian hashes ->
    uint32[nblk, 16, n], or None if unavailable/ragged."""
    lib = _load()
    if lib is None or not msgs:
        return None
    mlen = len(msgs[0])
    if any(len(m) != mlen for m in msgs):
        return None
    n = len(msgs)
    nblk = (mlen + 9 + 63) // 64
    out = np.empty((nblk, 16, n), np.uint32)
    r = lib.md_pad_pack_be64(b"".join(msgs), n, mlen,
                             out.ctypes.data_as(ctypes.c_void_p),
                             out.size)
    if r != nblk:
        return None
    return out
