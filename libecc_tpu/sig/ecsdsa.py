"""EC-SDSA and EC-OSDSA (Schnorr, ISO 14888-3) — batched TPU implementation.

Reference: src/sig/ecsdsa_common.c (+ ecsdsa.c / ecosdsa.c thin wrappers).
Public key Y = xG. 'Optimized' (ECOSDSA) hashes only Wx; normal hashes
Wx || Wy (ecsdsa_common.c:99-100).

Sign:   W = kG ; r = H(FE2OS(Wx) [|| FE2OS(Wy)] || m)  (full digest);
        e = OS2I(r) mod q ; s = (k + e*x) mod q ; sig = r || s
Verify: e = -(OS2I(r)) mod q ; W' = sG + eY ;
        r' = H(W'x [|| W'y] || m) ; accept iff r' == r
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn import core as nn
from ..curves.shortw import ShortWCurve
from ..hash.registry import get_hash
from . import wcore, common
from .keys import KeyBatch


def siglen(curve: ShortWCurve, hash_name="SHA256") -> int:
    return get_hash(hash_name).digest_size + (curve.q.bit_length() + 7) // 8


def _commit_buf(curve, wx: int, wy: int, m: bytes, optimized: bool) -> bytes:
    p_len = (curve.fp_ctx.bits + 7) // 8
    buf = int(wx).to_bytes(p_len, "big")
    if not optimized:
        buf += int(wy).to_bytes(p_len, "big")
    return buf + m


def _commits(curve, alg, wx_i, wy_i, msgs, optimized) -> list:
    """H(Wx [|| Wy] || m) per lane — batched on device when possible."""
    bufs = [_commit_buf(curve, wx_i[i], wy_i[i], msgs[i], optimized)
            for i in range(len(msgs))]
    return common.batch_digests(alg, bufs)


def _sign(keys: KeyBatch, msgs, hash_name, nonces, optimized,
          blinding=False):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    alg = get_hash(hash_name)
    n = len(msgs)
    k_dev, k_ints = wcore.nonces_for(curve, n, nonces)
    wx, wy, inf, bpair = wcore.kg_affine_for(curve, k_dev, k_ints, blinding)
    wx_i, wy_i = wcore.scalars_host(wx), wcore.scalars_host(wy)
    rs = _commits(curve, alg, wx_i, wy_i, msgs, optimized)
    e = wcore.scalars_dev(q_ctx, [int.from_bytes(r, "big") % q for r in rs])
    # s = k + e*x mod q (device)
    if bpair is None:
        s = common.q_add(k_dev, common.q_mul(jnp.asarray(e), keys.priv,
                                             q_ctx), q_ctx)
    else:
        # masked finalize (ecsdsa_common.c USE_SIG_BLINDING pattern):
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


def _verify(keys: KeyBatch, msgs, sigs, hash_name, optimized):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    alg = get_hash(hash_name)
    hsize = alg.digest_size
    nb = (q.bit_length() + 7) // 8
    us, vs, pre_ok, r_bufs = [], [], [], []
    for m, sg in zip(msgs, sigs):
        ok = len(sg) == hsize + nb
        r = sg[:hsize] if ok else b"\x00" * hsize
        s = int.from_bytes(sg[hsize:], "big") if ok else 0
        ok = ok and 0 < s < q
        e = (-(int.from_bytes(r, "big") % q)) % q
        ok = ok and int.from_bytes(r, "big") % q != 0
        us.append(s)
        vs.append(e)
        r_bufs.append(r)
        pre_ok.append(ok)
    u = wcore.scalars_dev(q_ctx, us)    # on G
    v = wcore.scalars_dev(q_ctx, vs)    # on Y
    wx, wy, inf = wcore.straus_affine(curve, u, v, keys.pub)
    wx_i, wy_i = wcore.scalars_host(wx), wcore.scalars_host(wy)
    inf = np.asarray(inf)
    rps = _commits(curve, alg, wx_i, wy_i, msgs, optimized)
    out = []
    for i in range(len(msgs)):
        out.append(pre_ok[i] and not inf[i] and rps[i] == r_bufs[i])
    return np.array(out)


def sign_batch(keys, msgs, hash_name="SHA256", nonces=None, adata=None,
               blinding=False):
    return _sign(keys, msgs, hash_name, nonces, optimized=False,
                 blinding=blinding)


def verify_batch(keys, msgs, sigs, hash_name="SHA256", adata=None):
    return _verify(keys, msgs, sigs, hash_name, optimized=False)


def sign_batch_osdsa(keys, msgs, hash_name="SHA256", nonces=None,
                     adata=None, blinding=False):
    return _sign(keys, msgs, hash_name, nonces, optimized=True,
                 blinding=blinding)


def verify_batch_osdsa(keys, msgs, sigs, hash_name="SHA256", adata=None):
    return _verify(keys, msgs, sigs, hash_name, optimized=True)
