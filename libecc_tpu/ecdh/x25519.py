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


def _x_core(curve_name, decode_scalar, u_mask_bits, keys, us,
            strict=True):
    c = mg.get_montgomery_curve(curve_name)
    ctx = c.fp_ctx
    n = len(keys)
    ks = [decode_scalar(k) for k in keys]
    u_ints = [int.from_bytes(u, "little") & ((1 << u_mask_bits) - 1)
              for u in us]
    # strict (reference) mode: NON-CANONICAL u >= p is rejected, matching
    # the documented RFC 7748 divergence (x25519_448.h:28-32 /
    # x25519_448.c aff_pt_montgomery import path, which refuses u >= p)
    canon_ok = np.array([u < ctx.p_int for u in u_ints]) \
        if strict else np.ones(n, bool)
    k_limbs = jnp.asarray(nn.batch_to_limbs(ks, nn.num_limbs(c.scalar_bits_n)))
    u_limbs = jnp.asarray(nn.batch_to_limbs(
        [u % ctx.p_int for u in u_ints], ctx.k))

    key = (curve_name, "xdh")
    if key not in _JITS:
        def core(k, u_plain):
            um = nn.to_mont(u_plain, ctx)
            # twist check (strict mode): u is on the CURVE iff
            # v^2 = u^3 + A u^2 + u is a square; the reference imports the
            # peer point through aff_pt_montgomery, which fails for
            # on-twist u (x25519_448.h:28-32). Batched Legendre symbol.
            A = ctx.const(c.A, like=um)
            rhs = fp.mul(fp.add(fp.mul(fp.add(um, A, ctx), um, ctx),
                                ctx.one(like=um), ctx), um, ctx)
            on_curve = fp.legendre_qr_mask(rhs, ctx)
            x2, z2 = mg.ladder_u(c, k, um)
            res = fp.mul(x2, fp.inv(z2, ctx), ctx)   # z2==0 -> 0
            return nn.canonicalize_from_mont(res, ctx), \
                fp.is_zero_mask(z2, ctx), on_curve
        _JITS[key] = jax.jit(core)
    res, zmask, on_curve = _JITS[key](k_limbs, u_limbs)
    vals = nn.batch_from_limbs(np.asarray(res))
    nb = (ctx.bits + 7) // 8
    out = [v.to_bytes(nb, "little") for v in vals]
    ok = ~np.asarray(zmask) & np.array([v != 0 for v in vals])
    if strict:
        ok = ok & np.asarray(on_curve) & canon_ok
    return out, ok


_JITS: dict = {}


def x25519_batch(keys: list[bytes], us: list[bytes], strict=True):
    """Batched X25519: 32-byte scalars x 32-byte u-coords -> (out, ok).
    strict=True (default) mirrors the reference's documented RFC 7748
    divergence (x25519_448.h:28-32): small-order inputs (zero output),
    on-TWIST u and non-canonical u >= p are all rejected lanes.
    strict=False is plain RFC 7748 (only zero output rejected)."""
    return _x_core("CURVE25519", _decode_scalar_25519, 255, keys, us,
                   strict=strict)


def x448_batch(keys: list[bytes], us: list[bytes], strict=True):
    """Batched X448: 56-byte scalars x 56-byte u-coords -> (out, ok)."""
    return _x_core("CURVE448", _decode_scalar_448, 448, keys, us,
                   strict=strict)


def x25519(k: bytes, u: bytes) -> bytes:
    out, _ = x25519_batch([k], [u])
    return out[0]


def x448(k: bytes, u: bytes) -> bytes:
    out, _ = x448_batch([k], [u])
    return out[0]
