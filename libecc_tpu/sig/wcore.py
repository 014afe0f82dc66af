"""Shared batched device cores for the short-Weierstrass signature family.

Every scheme in the reference's registry (src/sig/sig_algs_internal.h
ec_sig_maps[]) decomposes into the same two hot device kernels plus
cheap mod-q scalar arithmetic:

  * sign:   W = k*G      — fixed-schedule Montgomery ladder (secret k)
  * verify: W = u*G + v*Y — Straus/Shamir interleaving (public u, v)

The per-scheme differences (digest truncation flavor, the (r, s)
equations, hash-of-point commitments) are thin host+device glue in the
scheme modules (ecgdsa.py, eckcdsa.py, ...). This module also owns the
jit caches so each (curve, kernel) pair traces once per process
(the analog of the reference's per-curve static specialization).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..curves.shortw import ShortWCurve, PrjPoint, to_affine_plain
from ..curves import scalar_mul
from . import common

_JITS: dict = {}


def cached_jit(key, make_fn):
    if key not in _JITS:
        _JITS[key] = jax.jit(make_fn())
    return _JITS[key]


def kg_affine(curve: ShortWCurve, k):
    """Batched W = k*G -> (x, y, inf) PLAIN-domain canonical limbs.
    Constant-schedule ladder (reference: prj_pt_mul_blind semantics —
    our lane-batched ladder is constant-schedule by construction)."""
    def make():
        def f(k):
            W = scalar_mul.fixed_base_mul(curve, k)
            return to_affine_plain(curve, W)
        return f
    return cached_jit((curve.name, "kg_affine"), make)(k)


def straus_affine(curve: ShortWCurve, u, v, pub: PrjPoint):
    """Batched W = u*G + v*Y -> (x, y, inf) plain canonical limbs.
    Public-scalar throughput path (replaces the reference's hardened
    double ladder in verify, ecdsa_common.c:788-800)."""
    def make():
        def f(u, v, px, py, pz):
            W = scalar_mul.fixed_base_double_mul_public(
                curve, u, v, PrjPoint(px, py, pz))
            return to_affine_plain(curve, W)
        return f
    return cached_jit((curve.name, "straus_affine"), make)(
        u, v, pub.x, pub.y, pub.z)


# ---------------------------------------------------------------------------
# Host-side digest-to-scalar conversions: the reference's per-scheme
# truncation flavors, applied on host ints (cheap, per batch setup).
# ---------------------------------------------------------------------------

def trunc_msb_mod_q(digest: bytes, q: int) -> int:
    """Keep leftmost min(qbits, hbits) bits, then mod q
    (ECDSA/ECGDSA flavor; ecdsa_common.c:398-413)."""
    v = int.from_bytes(digest, "big")
    hbits = 8 * len(digest)
    if hbits > q.bit_length():
        v >>= hbits - q.bit_length()
    return v % q


def rightmost_bytes(digest: bytes, q: int) -> bytes:
    """Keep the rightmost BYTECEIL(qbits) bytes (ECKCDSA flavor;
    eckcdsa.c buf_lshift)."""
    r_len = min(len(digest), (q.bit_length() + 7) // 8)
    return digest[len(digest) - r_len:]


def int_be_mod_q(digest: bytes, q: int) -> int:
    """OS2I(digest) mod q (ECSDSA/ECFSDSA/SM2 flavor)."""
    return int.from_bytes(digest, "big") % q


def int_le_mod_q(digest: bytes, q: int) -> int:
    """LE2I(digest) mod q (BIGN flavor; bign_common.c _reverse_endianness)."""
    return int.from_bytes(digest, "little") % q


# ---------------------------------------------------------------------------
# Host <-> device scalar packing
# ---------------------------------------------------------------------------

def scalars_dev(q_ctx, ints) -> jnp.ndarray:
    return jnp.asarray(nn.batch_to_limbs([v % q_ctx.p_int for v in ints],
                                         q_ctx.k))


def scalars_host(arr) -> list[int]:
    return nn.batch_from_limbs(np.asarray(arr))


def nonces_for(curve: ShortWCurve, n: int, nonces=None):
    """Nonce batch: caller-injected ints (KATs) or host RNG
    (reference: the rand callback threading, sig_algs.c:63)."""
    if nonces is not None:
        return scalars_dev(curve.q_ctx, nonces), list(nonces)
    k = common.random_scalars_mod_q(curve.q_ctx, n)
    return jnp.asarray(k), nn.batch_from_limbs(k)


def affine_ints(curve: ShortWCurve, x, y, inf):
    """Device plain-canonical coords -> host ints + inf flags."""
    xs = scalars_host(x)
    ys = scalars_host(y)
    return xs, ys, np.asarray(inf)


def fe2os(v: int, curve: ShortWCurve) -> bytes:
    """Field element to octet string, p-length (reference: fp_export_to_buf)."""
    return int(v).to_bytes((curve.fp_ctx.bits + 7) // 8, "big")


def q2os(v: int, curve: ShortWCurve) -> bytes:
    return int(v).to_bytes((curve.q.bit_length() + 7) // 8, "big")
