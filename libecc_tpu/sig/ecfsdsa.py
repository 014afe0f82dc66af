"""EC-FSDSA ("full Schnorr", ISO 14888-3) — batched TPU implementation.

Reference: src/sig/ecfsdsa.c. Public key Y = xG. This is one of the three
schemes with batch verification in the reference (ecfsdsa.c:842); here
batch verify IS the native mode.

Sign:   W = kG ; r = FE2OS(Wx) || FE2OS(Wy)  (2*p_len bytes, raw);
        e = OS2I(H(r || m)) mod q ; s = (k + e*x) mod q ; sig = r || s
Verify: parse (Rx, Ry) from r, must be < p ;
        e = -(OS2I(H(r || m))) mod q ; W' = sG + eY ; accept iff W' == R
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn import core as nn
from ..curves.shortw import ShortWCurve
from ..hash.registry import get_hash
from . import wcore, common
from .keys import KeyBatch


def siglen(curve: ShortWCurve, hash_name=None) -> int:
    p_len = (curve.fp_ctx.bits + 7) // 8
    return 2 * p_len + (curve.q.bit_length() + 7) // 8


def sign_batch(keys: KeyBatch, msgs, hash_name="SHA256", nonces=None,
               adata=None, blinding=False):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    alg = get_hash(hash_name)
    n = len(msgs)
    p_len = (curve.fp_ctx.bits + 7) // 8
    k_dev, k_ints = wcore.nonces_for(curve, n, nonces)
    wx, wy, inf, bpair = wcore.kg_affine_for(curve, k_dev, k_ints, blinding)
    wx_i, wy_i = wcore.scalars_host(wx), wcore.scalars_host(wy)
    rs = [int(wx_i[i]).to_bytes(p_len, "big")
          + int(wy_i[i]).to_bytes(p_len, "big") for i in range(n)]
    digs = common.batch_digests(alg, [rs[i] + msgs[i] for i in range(n)])
    e = wcore.scalars_dev(
        q_ctx, [int.from_bytes(d, "big") % q for d in digs])
    if bpair is None:
        s = common.q_add(k_dev, common.q_mul(jnp.asarray(e), keys.priv,
                                             q_ctx), q_ctx)
    else:
        # masked finalize (ecfsdsa.c USE_SIG_BLINDING):
        # s = b^-1 * (b*k + (b*e)*x)
        b, binv = bpair
        bk = common.q_mul(b, k_dev, q_ctx)
        bex = common.q_mul(common.q_mul(b, jnp.asarray(e), q_ctx),
                           keys.priv, q_ctx)
        s = common.q_mul(binv, common.q_add(bk, bex, q_ctx), q_ctx)
    nb = (q.bit_length() + 7) // 8
    ss = wcore.scalars_host(s)
    sigs = [rs[i] + ss[i].to_bytes(nb, "big") for i in range(n)]
    return sigs, ~np.asarray(inf)


def verify_batch(keys: KeyBatch, msgs, sigs, hash_name="SHA256", adata=None):
    curve, q = keys.curve, keys.curve.q
    alg = get_hash(hash_name)
    digs = common.batch_digests(
        alg, [r_prefix(curve, sg, q) + m for m, sg in zip(msgs, sigs)])
    return verify_digests_batch(keys, digs, sigs, hash_name)


def r_prefix(curve, sig: bytes, q: int) -> bytes:
    """The r = (Wx || Wy) bytes hashed ahead of the message (zeros for
    malformed signatures, matching the one-shot path)."""
    p_len = (curve.fp_ctx.bits + 7) // 8
    nb = (q.bit_length() + 7) // 8
    return (sig[:2 * p_len] if len(sig) == 2 * p_len + nb
            else b"\x00" * (2 * p_len))


def verify_digests_batch(keys: KeyBatch, digs, sigs, hash_name="SHA256",
                         adata=None):
    """Digest-level verify: digs are H(r || m) per lane (streaming
    finalize path — r comes from the signature, absorbed at init)."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    p = curve.fp_ctx.p_int
    p_len = (curve.fp_ctx.bits + 7) // 8
    nb = (q.bit_length() + 7) // 8
    us, vs, pre_ok, rx_l, ry_l = [], [], [], [], []
    for i, sg in enumerate(sigs):
        ok = len(sg) == 2 * p_len + nb
        r = sg[:2 * p_len] if ok else b"\x00" * (2 * p_len)
        s = int.from_bytes(sg[2 * p_len:], "big") if ok else 0
        rx = int.from_bytes(r[:p_len], "big")
        ry = int.from_bytes(r[p_len:], "big")
        ok = ok and 0 < s < q and rx < p and ry < p
        e = (-(int.from_bytes(digs[i], "big") % q)) % q
        us.append(s)
        vs.append(e)
        rx_l.append(rx % p)
        ry_l.append(ry % p)
        pre_ok.append(ok)
    u = wcore.scalars_dev(q_ctx, us)
    v = wcore.scalars_dev(q_ctx, vs)
    wx, wy, inf = wcore.straus_affine(curve, u, v, keys.pub)
    wx_i, wy_i = wcore.scalars_host(wx), wcore.scalars_host(wy)
    inf = np.asarray(inf)
    out = [pre_ok[i] and not inf[i]
           and wx_i[i] == rx_l[i] and wy_i[i] == ry_l[i]
           for i in range(len(sigs))]
    return np.array(out)
