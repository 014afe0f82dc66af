"""EC-GDSA (German ISO 14888-3 variant) — batched TPU implementation.

Reference: src/sig/ecgdsa.c. Public key Y = x^-1 * G (ecgdsa.c:31).

Sign:   e = -(H(m) >>trunc) mod q ; W = kG ; r = W.x mod q ;
        s = x*(k*r + e) mod q ; sig = r || s
Verify: e = H(m) >>trunc mod q ; u = r^-1*e ; v = r^-1*s ;
        W' = uG + vY ; accept iff W'.x mod q == r
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn import core as nn
from ..curves.shortw import ShortWCurve
from ..hash.registry import get_hash
from . import wcore, common
from .keys import KeyBatch, keygen


def siglen(curve: ShortWCurve, hash_name=None) -> int:
    nb = (curve.q.bit_length() + 7) // 8
    return 2 * nb


def init_pub(curve: ShortWCurve, priv):
    """Y = x^-1 G (reference: ecgdsa_init_pub_key)."""
    from .keys import generic_init_pub
    xs = nn.batch_from_limbs(np.asarray(priv))
    xinv = wcore.scalars_dev(curve.q_ctx, [pow(x, -1, curve.q) for x in xs])
    return generic_init_pub(curve, xinv)


def sign_batch(keys: KeyBatch, msgs, hash_name="SHA256", nonces=None,
               adata=None, blinding=False):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    alg = get_hash(hash_name)
    n = len(msgs)
    k_dev, k_ints = wcore.nonces_for(curve, n, nonces)
    wx, _, inf, bpair = wcore.kg_affine_for(curve, k_dev, k_ints, blinding)
    r = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    digs = common.batch_digests(alg, msgs)
    e = wcore.scalars_dev(
        q_ctx, [(-wcore.trunc_msb_mod_q(d, q)) % q for d in digs])
    # s = x*(k*r + e) mod q   (device q-arithmetic)
    if bpair is None:
        kr = common.q_mul(k_dev, r, q_ctx)
        s = common.q_mul(keys.priv, common.q_add(kr, jnp.asarray(e), q_ctx),
                         q_ctx)
    else:
        # masked finalize (reference USE_SIG_BLINDING, ecgdsa.c): every
        # term touching the secrets k and x is multiplied by b, unmasked
        # once at the end: s = b^-1 * x * ((b*k)*r + b*e)
        b, binv = bpair
        kr = common.q_mul(common.q_mul(b, k_dev, q_ctx), r, q_ctx)
        be = common.q_mul(b, jnp.asarray(e), q_ctx)
        s = common.q_mul(binv, common.q_mul(
            keys.priv, common.q_add(kr, be, q_ctx), q_ctx), q_ctx)
    ok = (~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s)) & (~inf)
    nb = (q.bit_length() + 7) // 8
    rs, ss = wcore.scalars_host(r), wcore.scalars_host(s)
    sigs = [r_.to_bytes(nb, "big") + s_.to_bytes(nb, "big")
            for r_, s_ in zip(rs, ss)]
    return sigs, np.asarray(ok)


def verify_batch(keys: KeyBatch, msgs, sigs, hash_name="SHA256", adata=None):
    alg = get_hash(hash_name)
    return verify_digests_batch(keys, common.batch_digests(alg, msgs),
                                sigs, hash_name)


def verify_digests_batch(keys: KeyBatch, digs, sigs, hash_name="SHA256",
                         adata=None):
    """Digest-level verify (streaming finalize path)."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    nb = (q.bit_length() + 7) // 8
    us, vs, pre_ok = [], [], []
    for dg, sg in zip(digs, sigs):
        ok = len(sg) == 2 * nb
        r = int.from_bytes(sg[:nb], "big") if ok else 0
        s = int.from_bytes(sg[nb:], "big") if ok else 0
        ok = ok and 0 < r < q and 0 < s < q
        e = wcore.trunc_msb_mod_q(dg, q)
        rinv = pow(r, -1, q) if ok else 1
        us.append(rinv * e % q)
        vs.append(rinv * s % q)
        pre_ok.append(ok)
    u = wcore.scalars_dev(q_ctx, us)
    v = wcore.scalars_dev(q_ctx, vs)
    wx, _, inf = wcore.straus_affine(curve, u, v, keys.pub)
    rprime = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    r_dev = wcore.scalars_dev(
        q_ctx, [int.from_bytes(sg[:nb], "big") if len(sg) == 2 * nb else 0
                for sg in sigs])
    acc = np.asarray(nn.eq_mask(rprime, jnp.asarray(r_dev)) & (~inf))
    return acc & np.array(pre_ok)
