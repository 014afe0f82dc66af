"""SM2 (Chinese GB/T 32918.2) — batched TPU implementation.

Reference: src/sig/sm2.c. Public key Y = xG. The adata is the signer's
identity (defaults to the standard "1234567812345678"), bound into the
ZA digest (sm2.c:136 sm2_compute_Z).

Sign:   ZA = H(ENTL || ID || a || b || Gx || Gy || Yx || Yy) ;
        e = OS2I(H(ZA || m)) ; W = kG ; r = (e + W.x) mod q ;
        s = (1 + x)^-1 * (k - r*x) mod q ; sig = r || s
Verify: t = (r + s) mod q, reject 0 ; W' = sG + tY ;
        accept iff (e + W'.x) mod q == r
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn import core as nn
from ..curves.shortw import ShortWCurve
from ..hash.registry import get_hash
from . import wcore, common
from .keys import KeyBatch

DEFAULT_ID = b"1234567812345678"


def siglen(curve: ShortWCurve, hash_name=None) -> int:
    return 2 * ((curve.q.bit_length() + 7) // 8)


def compute_za(curve: ShortWCurve, alg, yx: int, yy: int,
               ident: bytes) -> bytes:
    """ZA identity digest (reference: sm2_compute_Z, sm2.c:136)."""
    p_len = (curve.fp_ctx.bits + 7) // 8
    entl = (8 * len(ident)).to_bytes(2, "big")
    st = alg.new()
    st.update(entl + ident)
    st.update(int(curve.a).to_bytes(p_len, "big"))
    st.update(int(curve.b).to_bytes(p_len, "big"))
    st.update(int(curve.gx).to_bytes(p_len, "big"))
    st.update(int(curve.gy).to_bytes(p_len, "big"))
    st.update(int(yx).to_bytes(p_len, "big"))
    st.update(int(yy).to_bytes(p_len, "big"))
    return st.digest()


def _e_vals(keys: KeyBatch, msgs, alg, ident):
    xs, ys, _ = keys.pub_affine_ints()
    bufs = [compute_za(keys.curve, alg, xs[i], ys[i], ident) + m
            for i, m in enumerate(msgs)]
    return [int.from_bytes(d, "big") % keys.curve.q
            for d in common.batch_digests(alg, bufs)]


def sign_batch(keys: KeyBatch, msgs, hash_name="SM3", nonces=None,
               adata=DEFAULT_ID, blinding=False):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    alg = get_hash(hash_name)
    ident = adata if adata is not None else DEFAULT_ID
    n = len(msgs)
    es = _e_vals(keys, msgs, alg, ident)
    k_dev, k_ints = wcore.nonces_for(curve, n, nonces)
    wx, _, inf, bpair = wcore.kg_affine_for(curve, k_dev, k_ints, blinding)
    e = wcore.scalars_dev(q_ctx, es)
    wx_q = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    r = common.q_add(jnp.asarray(e), wx_q, q_ctx)
    # s = (1+x)^-1 (k - r x) mod q  (device)
    one = wcore.scalars_dev(q_ctx, [1] * n)
    if bpair is None:
        xp1_inv = common.q_inv(common.q_add(keys.priv, jnp.asarray(one),
                                            q_ctx), q_ctx)
        rx = common.q_mul(r, keys.priv, q_ctx)
        s = common.q_mul(xp1_inv, common.q_sub(k_dev, rx, q_ctx), q_ctx)
    else:
        # masked finalize (sm2.c USE_SIG_BLINDING): the inversion runs on
        # b*(1+x) (never on the bare secret), and the numerator is fully
        # b-masked: s = (b*(1+x))^-1 * (b*k - (b*r)*x)
        b, _binv = bpair
        bxp1_inv = common.q_inv(common.q_mul(b, common.q_add(
            keys.priv, jnp.asarray(one), q_ctx), q_ctx), q_ctx)
        bk = common.q_mul(b, k_dev, q_ctx)
        brx = common.q_mul(common.q_mul(b, r, q_ctx), keys.priv, q_ctx)
        s = common.q_mul(bxp1_inv, common.q_sub(bk, brx, q_ctx), q_ctx)
    ok = (~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s)) & (~inf)
    nb = (q.bit_length() + 7) // 8
    rs, ss = wcore.scalars_host(r), wcore.scalars_host(s)
    sigs = [r_.to_bytes(nb, "big") + s_.to_bytes(nb, "big")
            for r_, s_ in zip(rs, ss)]
    return sigs, np.asarray(ok)


def verify_batch(keys: KeyBatch, msgs, sigs, hash_name="SM3",
                 adata=DEFAULT_ID):
    alg = get_hash(hash_name)
    ident = adata if adata is not None else DEFAULT_ID
    return _verify_with_es(keys, _e_vals(keys, msgs, alg, ident), sigs)


def verify_digests_batch(keys: KeyBatch, digs, sigs, hash_name="SM3",
                         adata=DEFAULT_ID):
    """Digest-level verify: digs are H(ZA || m) per lane (streaming
    finalize path — ZA is absorbed at init, the message streams)."""
    q = keys.curve.q
    return _verify_with_es(
        keys, [int.from_bytes(d, "big") % q for d in digs], sigs)


def _verify_with_es(keys: KeyBatch, es, sigs):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    nb = (q.bit_length() + 7) // 8
    ss, ts, rs, pre_ok = [], [], [], []
    for sg in sigs:
        ok = len(sg) == 2 * nb
        r = int.from_bytes(sg[:nb], "big") if ok else 0
        s = int.from_bytes(sg[nb:], "big") if ok else 0
        t = (r + s) % q
        ok = ok and 0 < r < q and 0 < s < q and t != 0
        ss.append(s)
        ts.append(t)
        rs.append(r)
        pre_ok.append(ok)
    u = wcore.scalars_dev(q_ctx, ss)   # on G
    v = wcore.scalars_dev(q_ctx, ts)   # on Y
    wx, _, inf = wcore.straus_affine(curve, u, v, keys.pub)
    wx_q = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    e = wcore.scalars_dev(q_ctx, es)
    rprime = common.q_add(jnp.asarray(e), wx_q, q_ctx)
    r_dev = wcore.scalars_dev(q_ctx, rs)
    acc = np.asarray(nn.eq_mask(rprime, jnp.asarray(r_dev)) & (~inf))
    return acc & np.array(pre_ok)
