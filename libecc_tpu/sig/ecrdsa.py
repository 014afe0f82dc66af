"""EC-RDSA (Russian GOST R 34.10-2012) — batched TPU implementation.

Reference: src/sig/ecrdsa.c (default non-ISO14888-3 mode: the digest is
byte-reversed before integer import, ecrdsa.c:307; the ISO 14888-3 mode —
the reference's USE_ISO14888_3_ECRDSA compile toggle, common.mk:262-265 —
imports the digest big-endian as printed). Public key Y = xG.

Sign:   e = LE2I(H(m)) mod q ; if e == 0 then e = 1 ;
        W = kG ; r = W.x mod q ; s = (r*x + k*e) mod q ; sig = r || s
Verify: e as above ; h_inv = e^-1 ; u = h_inv*s ; v = -(h_inv*r) ;
        W' = uG + vY ; accept iff W'.x mod q == r

The mode is a per-call kwarg (iso14888) defaulting to the runtime switch
LIBECC_TPU_ECRDSA_ISO14888 (config.py) — both build variants of the
reference are one framework here.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..nn import core as nn
from ..curves.shortw import ShortWCurve
from ..hash.registry import get_hash
from . import wcore, common
from .keys import KeyBatch


def siglen(curve: ShortWCurve, hash_name=None) -> int:
    return 2 * ((curve.q.bit_length() + 7) // 8)


def _iso_default() -> bool:
    return os.environ.get("LIBECC_TPU_ECRDSA_ISO14888", "0") not in (
        "0", "false", "")


def _e_of_digest(dg: bytes, q: int, iso14888=None) -> int:
    if iso14888 is None:
        iso14888 = _iso_default()
    e = int.from_bytes(dg, "big" if iso14888 else "little") % q
    return e if e != 0 else 1


def sign_batch(keys: KeyBatch, msgs, hash_name="STREEBOG256", nonces=None,
               adata=None, iso14888=None, blinding=False):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    alg = get_hash(hash_name)
    n = len(msgs)
    k_dev, k_ints = wcore.nonces_for(curve, n, nonces)
    wx, _, inf, bpair = wcore.kg_affine_for(curve, k_dev, k_ints, blinding)
    r = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    e = wcore.scalars_dev(q_ctx, [_e_of_digest(d, q, iso14888) for d in
                                  common.batch_digests(alg, msgs)])
    # s = r*x + k*e mod q (device)
    if bpair is None:
        rx = common.q_mul(r, keys.priv, q_ctx)
        ke = common.q_mul(k_dev, jnp.asarray(e), q_ctx)
        s = common.q_add(rx, ke, q_ctx)
    else:
        # masked finalize (ecrdsa.c USE_SIG_BLINDING):
        # s = b^-1 * ((b*r)*x + k*(b*e))
        b, binv = bpair
        rx = common.q_mul(common.q_mul(b, r, q_ctx), keys.priv, q_ctx)
        ke = common.q_mul(k_dev, common.q_mul(b, jnp.asarray(e), q_ctx),
                          q_ctx)
        s = common.q_mul(binv, common.q_add(rx, ke, q_ctx), q_ctx)
    ok = (~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s)) & (~inf)
    nb = (q.bit_length() + 7) // 8
    rs, ss = wcore.scalars_host(r), wcore.scalars_host(s)
    sigs = [r_.to_bytes(nb, "big") + s_.to_bytes(nb, "big")
            for r_, s_ in zip(rs, ss)]
    return sigs, np.asarray(ok)


def verify_batch(keys: KeyBatch, msgs, sigs, hash_name="STREEBOG256",
                 adata=None, iso14888=None):
    alg = get_hash(hash_name)
    return verify_digests_batch(keys, common.batch_digests(alg, msgs),
                                sigs, hash_name, iso14888=iso14888)


def verify_digests_batch(keys: KeyBatch, digs, sigs,
                         hash_name="STREEBOG256", adata=None,
                         iso14888=None):
    """Digest-level verify (streaming finalize path)."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    nb = (q.bit_length() + 7) // 8
    us, vs, rs, pre_ok = [], [], [], []
    for dg, sg in zip(digs, sigs):
        ok = len(sg) == 2 * nb
        r = int.from_bytes(sg[:nb], "big") if ok else 0
        s = int.from_bytes(sg[nb:], "big") if ok else 0
        ok = ok and 0 < r < q and 0 < s < q
        e = _e_of_digest(dg, q, iso14888)
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
