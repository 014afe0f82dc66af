"""X25519 / X448 (RFC 7748) batched ECDH.

Reference: src/ecdh/x25519_448.c — which routes through the short-
Weierstrass core; here the native batched x-only ladder
(curves/montgomery.py) does the work. Like the reference (documented
divergence from RFC 7748, x25519_448.h:28-32), an all-zero shared secret
is reported as a failure lane (small-order / twist inputs).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..fp import field as fp
from ..curves import montgomery as mg


def _decode_scalar_25519(k: bytes) -> int:
    a = bytearray(k)
    a[0] &= 248
    a[31] &= 127
    a[31] |= 64
    return int.from_bytes(bytes(a), "little")


def _decode_scalar_448(k: bytes) -> int:
    a = bytearray(k)
    a[0] &= 252
    a[55] |= 128
    return int.from_bytes(bytes(a), "little")


def _x_core(curve_name, decode_scalar, u_mask_bits, keys, us):
    c = mg.get_montgomery_curve(curve_name)
    ctx = c.fp_ctx
    n = len(keys)
    ks = [decode_scalar(k) for k in keys]
    u_ints = [int.from_bytes(u, "little") & ((1 << u_mask_bits) - 1)
              for u in us]
    # u is NOT reduced mod p by RFC (values >= p accepted, reduced here)
    k_limbs = jnp.asarray(nn.batch_to_limbs(ks, nn.num_limbs(c.scalar_bits_n)))
    u_limbs = jnp.asarray(nn.batch_to_limbs(
        [u % ctx.p_int for u in u_ints], ctx.k))

    key = (curve_name, "xdh")
    if key not in _JITS:
        def core(k, u_plain):
            um = nn.to_mont(u_plain, ctx)
            x2, z2 = mg.ladder_u(c, k, um)
            res = fp.mul(x2, fp.inv(z2, ctx), ctx)   # z2==0 -> 0
            return nn.canonicalize_from_mont(res, ctx), \
                fp.is_zero_mask(z2, ctx)
        _JITS[key] = jax.jit(core)
    res, zmask = _JITS[key](k_limbs, u_limbs)
    vals = nn.batch_from_limbs(np.asarray(res))
    nb = (ctx.bits + 7) // 8
    out = [v.to_bytes(nb, "little") for v in vals]
    ok = ~np.asarray(zmask) & np.array([v != 0 for v in vals])
    return out, ok


_JITS: dict = {}


def x25519_batch(keys: list[bytes], us: list[bytes]):
    """Batched X25519: 32-byte scalars x 32-byte u-coords -> (out, ok).
    ok lanes mirror the reference's zero-output rejection."""
    return _x_core("CURVE25519", _decode_scalar_25519, 255, keys, us)


def x448_batch(keys: list[bytes], us: list[bytes]):
    """Batched X448: 56-byte scalars x 56-byte u-coords -> (out, ok)."""
    return _x_core("CURVE448", _decode_scalar_448, 448, keys, us)


def x25519(k: bytes, u: bytes) -> bytes:
    out, _ = x25519_batch([k], [u])
    return out[0]


def x448(k: bytes, u: bytes) -> bytes:
    out, _ = x448_batch([k], [u])
    return out[0]
