"""Cryptofuzz-style raw signature APIs: caller supplies the DIGEST and the
NONCE directly (no hashing, no RNG) — the surface differential fuzzers
drive.

Reference: USE_CRYPTOFUZZ raw entry points — fuzzing_ecdsa.c:41
(ecdsa_sign_raw / :277 ecdsa_verify_raw), fuzzing_ecgdsa.c,
fuzzing_ecrdsa.c. The reference exposes exactly these three schemes; so
do we. The batched forms take lists of digests/nonces and return
(sigs, ok) / accept masks, sharing the scheme modules' device cores, so
a fuzzer exercises the same compiled code paths as production signing.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn import core as nn
from . import wcore, common
from . import ecdsa as _ecdsa
from .keys import KeyBatch


def _digest_e_msb(digests, q_ctx, q):
    """ECDSA/ECGDSA truncation of raw digests (leftmost q-bits)."""
    return [wcore.trunc_msb_mod_q(d, q) for d in digests]


def ecdsa_sign_raw(keys: KeyBatch, digests: list[bytes],
                   nonces: list[int]):
    """Raw ECDSA (fuzzing_ecdsa.c:41): input IS the digest; k supplied."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    e = wcore.scalars_dev(q_ctx, _digest_e_msb(digests, q_ctx, q))
    k = common.scalars_from_ints(q_ctx, nonces)
    r, s, ok = wcore.cached_jit(
        (curve.name, "sign"),
        lambda: lambda d, e, k: _ecdsa.sign_core(curve, d, e, k)
    )(keys.priv, jnp.asarray(e), jnp.asarray(k))
    nb = (q.bit_length() + 7) // 8
    rs, ss = wcore.scalars_host(r), wcore.scalars_host(s)
    return [a.to_bytes(nb, "big") + b.to_bytes(nb, "big")
            for a, b in zip(rs, ss)], np.asarray(ok)


def ecdsa_verify_raw(keys: KeyBatch, digests: list[bytes],
                     sigs: list[bytes]):
    """Raw ECDSA verify (fuzzing_ecdsa.c:277)."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    from ..curves.shortw import PrjPoint
    nb = (q.bit_length() + 7) // 8
    e = wcore.scalars_dev(q_ctx, _digest_e_msb(digests, q_ctx, q))
    rs, ss, pre_ok = [], [], []
    for sg in sigs:
        ok = len(sg) == 2 * nb
        rs.append(int.from_bytes(sg[:nb], "big") if ok else 0)
        ss.append(int.from_bytes(sg[nb:], "big") if ok else 0)
        pre_ok.append(ok)
    r = jnp.asarray(nn.batch_to_limbs(
        [v % (1 << (q_ctx.k * nn.LIMB_BITS)) for v in rs], q_ctx.k))
    s = jnp.asarray(nn.batch_to_limbs(
        [v % (1 << (q_ctx.k * nn.LIMB_BITS)) for v in ss], q_ctx.k))
    acc = wcore.cached_jit(
        (curve.name, "verify"),
        lambda: lambda px, py, pz, e, r, s: _ecdsa.verify_core(
            curve, PrjPoint(px, py, pz), e, r, s)
    )(keys.pub.x, keys.pub.y, keys.pub.z, jnp.asarray(e), r, s)
    return np.asarray(acc) & np.array(pre_ok)


def ecgdsa_sign_raw(keys: KeyBatch, digests: list[bytes],
                    nonces: list[int]):
    """Raw ECGDSA (fuzzing_ecgdsa.c): s = x*(k*r + e), e = -trunc(digest).
    NOTE: ECGDSA keys use init_pub=ecgdsa.init_pub (Y = x^-1 G)."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    n = len(digests)
    k_dev, _ = wcore.nonces_for(curve, n, nonces)
    wx, _, inf = wcore.kg_affine(curve, k_dev)
    r = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    e = wcore.scalars_dev(
        q_ctx, [(-wcore.trunc_msb_mod_q(d, q)) % q for d in digests])
    kr = common.q_mul(k_dev, r, q_ctx)
    s = common.q_mul(keys.priv,
                     common.q_add(kr, jnp.asarray(e), q_ctx), q_ctx)
    ok = (~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s)) & (~inf)
    nb = (q.bit_length() + 7) // 8
    rs, ss = wcore.scalars_host(r), wcore.scalars_host(s)
    return [a.to_bytes(nb, "big") + b.to_bytes(nb, "big")
            for a, b in zip(rs, ss)], np.asarray(ok)


def ecgdsa_verify_raw(keys: KeyBatch, digests: list[bytes],
                      sigs: list[bytes]):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    nb = (q.bit_length() + 7) // 8
    us, vs, rs, pre_ok = [], [], [], []
    for d, sg in zip(digests, sigs):
        ok = len(sg) == 2 * nb
        r = int.from_bytes(sg[:nb], "big") if ok else 0
        s = int.from_bytes(sg[nb:], "big") if ok else 0
        ok = ok and 0 < r < q and 0 < s < q
        e = wcore.trunc_msb_mod_q(d, q)
        rinv = pow(r, -1, q) if ok else 1
        us.append(rinv * e % q)
        vs.append(rinv * s % q)
        rs.append(r)
        pre_ok.append(ok)
    u = wcore.scalars_dev(q_ctx, us)
    v = wcore.scalars_dev(q_ctx, vs)
    wx, _, inf = wcore.straus_affine(curve, u, v, keys.pub)
    rprime = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    r_dev = wcore.scalars_dev(q_ctx, rs)
    acc = np.asarray(nn.eq_mask(rprime, jnp.asarray(r_dev)) & (~inf))
    return acc & np.array(pre_ok)


def ecrdsa_sign_raw(keys: KeyBatch, digests: list[bytes],
                    nonces: list[int]):
    """Raw ECRDSA (fuzzing_ecrdsa.c): e = LE2I(digest) mod q (1 if 0);
    s = r*x + k*e."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    n = len(digests)
    k_dev, _ = wcore.nonces_for(curve, n, nonces)
    wx, _, inf = wcore.kg_affine(curve, k_dev)
    r = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    es = [int.from_bytes(d, "little") % q or 1 for d in digests]
    e = wcore.scalars_dev(q_ctx, es)
    rx = common.q_mul(r, keys.priv, q_ctx)
    ke = common.q_mul(k_dev, jnp.asarray(e), q_ctx)
    s = common.q_add(rx, ke, q_ctx)
    ok = (~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s)) & (~inf)
    nb = (q.bit_length() + 7) // 8
    rs, ss = wcore.scalars_host(r), wcore.scalars_host(s)
    return [a.to_bytes(nb, "big") + b.to_bytes(nb, "big")
            for a, b in zip(rs, ss)], np.asarray(ok)


def ecrdsa_verify_raw(keys: KeyBatch, digests: list[bytes],
                      sigs: list[bytes]):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    nb = (q.bit_length() + 7) // 8
    us, vs, rs, pre_ok = [], [], [], []
    for d, sg in zip(digests, sigs):
        ok = len(sg) == 2 * nb
        r = int.from_bytes(sg[:nb], "big") if ok else 0
        s = int.from_bytes(sg[nb:], "big") if ok else 0
        ok = ok and 0 < r < q and 0 < s < q
        e = int.from_bytes(d, "little") % q or 1
        einv = pow(e, -1, q)
        us.append(einv * s % q)
        vs.append((-(einv * r)) % q)
        rs.append(r)
        pre_ok.append(ok)
    u = wcore.scalars_dev(q_ctx, us)
    v = wcore.scalars_dev(q_ctx, vs)
    wx, _, inf = wcore.straus_affine(curve, u, v, keys.pub)
    rprime = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    r_dev = wcore.scalars_dev(q_ctx, rs)
    acc = np.asarray(nn.eq_mask(rprime, jnp.asarray(r_dev)) & (~inf))
    return acc & np.array(pre_ok)
