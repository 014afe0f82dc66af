"""Signature-internals tracing — the VERBOSE_INNER_VALUES analog.

Reference: src/utils/dbg_sig.h dbg_nn_print / dbg_ec_point_print macros,
compiled in via VERBOSE_INNER_VALUES and emitted through ext_printf
(call sites e.g. ecdsa_common.c:373-377). Here tracing is a runtime
switch: set LIBECC_TPU_TRACE=1 (or call enable()) and the sig layer's
host boundaries print every intermediate value, tagged by scheme.

Device values are fetched lazily (canonicalized limb tensors -> ints) so
tracing costs nothing when disabled.
"""

from __future__ import annotations

import os
import sys

_ENABLED: bool | None = None


def enabled() -> bool:
    global _ENABLED
    if _ENABLED is None:
        _ENABLED = os.environ.get("LIBECC_TPU_TRACE", "0") not in (
            "0", "", "false")
    return _ENABLED


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = on


def trace_nn(alg: str, name: str, value, ctx=None):
    """Print a scalar/limb-tensor intermediate (dbg_nn_print analog).
    value: int, list[int], or a device limb tensor (canonicalized)."""
    if not enabled():
        return
    import numpy as np
    if hasattr(value, "shape"):
        from ..nn import core as nn
        arr = np.asarray(value)
        if ctx is not None:
            arr = np.asarray(nn.canonicalize(value, ctx))
        vals = nn.batch_from_limbs(arr) if arr.ndim == 2 else \
            [nn.from_limbs(arr)]
        out = [hex(v) for v in vals[:4]] + (["..."] if len(vals) > 4 else [])
    elif isinstance(value, (list, tuple)):
        out = [hex(int(v)) for v in value[:4]]
    else:
        out = hex(int(value))
    print(f"[{alg}] {name} = {out}", file=sys.stderr)


def trace_point(alg: str, name: str, xs, ys, n_show: int = 2):
    """Print affine point batches (dbg_ec_point_print analog)."""
    if not enabled():
        return
    pairs = [(hex(int(x)), hex(int(y)))
             for x, y in list(zip(xs, ys))[:n_show]]
    print(f"[{alg}] {name} = {pairs}", file=sys.stderr)


def trace_buf(alg: str, name: str, buf: bytes):
    if not enabled():
        return
    print(f"[{alg}] {name} = {bytes(buf).hex()}", file=sys.stderr)
