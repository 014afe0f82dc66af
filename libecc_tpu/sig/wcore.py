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
from ..curves.shortw import ShortWCurve, PrjPoint, to_affine_plain, \
    on_curve_mask
from ..curves import scalar_mul
from . import common

_JITS: dict = {}


def cached_jit(key, make_fn):
    # the compute-path switches are read at TRACE time, so they must be
    # part of the cache key or a runtime flip (e.g. bench.py's megamul
    # fallback, tests toggling LIBECC_TPU_PALLAS) would reuse stale traces
    from ..config import use_megamul, use_pallas
    key = (key, use_pallas(), use_megamul())
    if key not in _JITS:
        _JITS[key] = jax.jit(make_fn())
    return _JITS[key]


def kg_affine(curve: ShortWCurve, k):
    """Batched W = k*G -> (x, y, inf) PLAIN-domain canonical limbs.
    Constant-schedule ladder (reference: prj_pt_mul_blind semantics —
    our lane-batched ladder is constant-schedule by construction).
    FIA hardening: the post-scalar-mult on-curve check (prj_pt.c:1776)
    folds into the inf mask — a faulted W rejects the lane."""
    def make():
        def f(k):
            W = scalar_mul.fixed_base_mul(curve, k)
            ok = on_curve_mask(curve, W)
            x, y, inf = to_affine_plain(curve, W)
            return x, y, inf | (~ok)
        return f
    return cached_jit((curve.name, "kg_affine"), make)(k)


def kg_affine_blind(curve: ShortWCurve, k_wide, lam_mont):
    """Blinded W = k*G: the scalar arrives pre-blinded as k + b*q (double
    length — the reference's prj_pt_mul_blind, prj_pt.c:1782) and the
    accumulator representative is randomized by lam (projective blinding,
    prj_pt.c:1266). Returns the same VALUES as kg_affine."""
    nbits = 2 * curve.q.bit_length() + 1

    def make():
        def f(kw, lam):
            W = scalar_mul.fixed_base_mul(curve, kw, nbits=nbits, lam=lam)
            return to_affine_plain(curve, W)
        return f
    return cached_jit((curve.name, "kg_affine_blind"), make)(k_wide,
                                                             lam_mont)


def blind_inputs(curve: ShortWCurve, nonce_ints, rng=None):
    """Host-side blinding material for a batch: b in ]0,q[ per lane
    (scalar + finalize mask), lam in ]0,p[ per lane (projective mask),
    and the widened blinded scalars k + b*q as limb tensors.
    RNG boundary: os.urandom (reference: nn_get_random_mod)."""
    import os as _os
    rng = rng or _os.urandom
    q = curve.q
    p = curve.fp_ctx.p_int
    nb = (q.bit_length() + 128) // 8
    bs, lams, k_wide = [], [], []
    for kv in nonce_ints:
        b = 0
        while b == 0:
            b = int.from_bytes(rng(nb), "big") % q
        lam = 0
        while lam == 0:
            lam = int.from_bytes(rng(nb), "big") % p
        bs.append(b)
        lams.append(lam)
        k_wide.append(kv + b * q)
    kw_limbs = (2 * q.bit_length() + 1 + nn.LIMB_BITS - 1) // nn.LIMB_BITS
    import jax.numpy as _jnp
    kw = _jnp.asarray(nn.batch_to_limbs(k_wide, kw_limbs))
    b_dev = _jnp.asarray(nn.batch_to_limbs(bs, curve.q_ctx.k))
    lam_mont = _jnp.asarray(nn.batch_to_limbs(
        [v * curve.fp_ctx.R % p for v in lams], curve.fp_ctx.k))
    return kw, b_dev, lam_mont


def kg_affine_for(curve: ShortWCurve, k_dev, nonce_ints, blinding: bool):
    """W = k*G for a scheme sign path, optionally with the reference's
    USE_SIG_BLINDING countermeasures (common.mk:191-193 applies them
    library-wide; per-scheme pattern e.g. ecdsa_common.c:466-531):

      * scalar blinding: ladder over k + b*q (prj_pt.c:1782);
      * projective blinding: lam-randomized representatives
        (prj_pt.c:1266);
      * finalize masking material: returns (b, b^-1) device scalars so
        the scheme's s-equation runs entirely in the b-masked domain
        (secrets k and x are never combined unmasked) — each scheme
        multiplies its k/e/r terms by b and unmasks once with b^-1.

    Returns (x, y, inf, bpair) with bpair = None when blinding is off,
    else (b_dev, binv_dev). Output VALUES are identical either way."""
    if not blinding:
        x, y, inf = kg_affine(curve, k_dev)
        return x, y, inf, None
    kw, b_dev, lam = blind_inputs(curve, nonce_ints)
    x, y, inf = kg_affine_blind(curve, kw, lam)
    binv = common.q_inv(b_dev, curve.q_ctx)
    return x, y, inf, (b_dev, binv)


def straus_affine(curve: ShortWCurve, u, v, pub: PrjPoint):
    """Batched W = u*G + v*Y -> (x, y, inf) plain canonical limbs.
    Public-scalar throughput path (replaces the reference's hardened
    double ladder in verify, ecdsa_common.c:788-800).
    FIA hardening (prj_pt.c:1767,1776): the public point Y is checked
    on-curve BEFORE the scalar mult and the result W AFTER; a failure of
    either folds into the inf mask, so every scheme's verify rejects the
    lane — one fused batched check, ~10 field muls vs ~2*256 point ops."""
    def make():
        def f(u, v, px, py, pz):
            Y = PrjPoint(px, py, pz)
            pre = on_curve_mask(curve, Y)
            W = scalar_mul.fixed_base_double_mul_public(curve, u, v, Y)
            post = on_curve_mask(curve, W)
            x, y, inf = to_affine_plain(curve, W)
            return x, y, inf | (~pre) | (~post)
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
