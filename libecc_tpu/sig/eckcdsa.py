"""EC-KCDSA (Korean, ISO 14888-3) — batched TPU implementation.

Reference: src/sig/eckcdsa.c. Public key Y = x^-1 * G (eckcdsa.c:34).

Sign:   z = FE2OS(Yx)||FE2OS(Yy) truncated/padded to hash block size;
        h = H(z || m) -> rightmost r_len bytes;
        W = kG ; r = H(FE2OS(Wx)) -> rightmost r_len bytes;
        e = OS2I(r XOR h) mod q ; s = x*(k - e) mod q ; sig = r || s
Verify: e as above from (r, h) ; W' = sY + eG ;
        r' = H(FE2OS(W'x)) -> rightmost ; accept iff r' == r
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
    hsize = get_hash(hash_name).digest_size
    nb = (curve.q.bit_length() + 7) // 8
    return min(hsize, nb) + nb


def init_pub(curve: ShortWCurve, priv):
    from .keys import generic_init_pub
    xs = nn.batch_from_limbs(np.asarray(priv))
    xinv = wcore.scalars_dev(curve.q_ctx, [pow(x, -1, curve.q) for x in xs])
    return generic_init_pub(curve, xinv)


def _z_cert(kb: KeyBatch, i: int, block_size: int) -> bytes:
    """Certificate data z: Yx||Yy truncated/zero-padded to hash block size
    (eckcdsa.c sign_init)."""
    xs, ys, _ = kb.pub_affine_ints()
    p_len = (kb.curve.fp_ctx.bits + 7) // 8
    buf = int(xs[i]).to_bytes(p_len, "big") + int(ys[i]).to_bytes(p_len, "big")
    if len(buf) < block_size:
        buf = buf + b"\x00" * (block_size - len(buf))
    return buf[:block_size]


def _r_len(curve, alg):
    return min(alg.digest_size, (curve.q.bit_length() + 7) // 8)


def sign_batch(keys: KeyBatch, msgs, hash_name="SHA256", nonces=None,
               adata=None, blinding=False):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    alg = get_hash(hash_name)
    n = len(msgs)
    rl = _r_len(curve, alg)
    p_len = (curve.fp_ctx.bits + 7) // 8
    xs_pub, ys_pub, _ = keys.pub_affine_ints()
    # h = rightmost bytes of H(z || m), batched on device when possible
    bufs = []
    for i, m in enumerate(msgs):
        z = (int(xs_pub[i]).to_bytes(p_len, "big")
             + int(ys_pub[i]).to_bytes(p_len, "big"))
        z = (z + b"\x00" * alg.block_size)[: alg.block_size]
        bufs.append(z + m)
    hs = [d[len(d) - rl:] if len(d) > rl else d
          for d in common.batch_digests(alg, bufs)]
    k_dev, k_ints = wcore.nonces_for(curve, n, nonces)
    wx, _, inf, bpair = wcore.kg_affine_for(curve, k_dev, k_ints, blinding)
    wx_ints = wcore.scalars_host(wx)
    wx_digs = common.batch_digests(
        alg, [int(wx_ints[i]).to_bytes(p_len, "big") for i in range(n)])
    rs, es = [], []
    for i in range(n):
        d = wx_digs[i]
        r = d[len(d) - rl:] if len(d) > rl else d
        rs.append(r)
        es.append(int.from_bytes(bytes(a ^ b for a, b in zip(r, hs[i])),
                                 "big") % q)
    e = wcore.scalars_dev(q_ctx, es)
    # s = x*(k - e) mod q  (device)
    if bpair is None:
        s = common.q_mul(keys.priv, common.q_sub(k_dev, jnp.asarray(e),
                                                 q_ctx), q_ctx)
    else:
        # masked finalize (eckcdsa.c USE_SIG_BLINDING):
        # s = b^-1 * x * (b*k - b*e)
        b, binv = bpair
        bk = common.q_mul(b, k_dev, q_ctx)
        be = common.q_mul(b, jnp.asarray(e), q_ctx)
        s = common.q_mul(binv, common.q_mul(
            keys.priv, common.q_sub(bk, be, q_ctx), q_ctx), q_ctx)
    ok = (~nn.is_zero_mask(s)) & (~inf)
    nb = (q.bit_length() + 7) // 8
    ss = wcore.scalars_host(s)
    sigs = [rs[i] + ss[i].to_bytes(nb, "big") for i in range(n)]
    return sigs, np.asarray(ok)


def z_blocks(keys: KeyBatch, alg) -> list[bytes]:
    """Per-lane certificate data z = (Wx || Wy) zero-padded/truncated to
    one hash block (the prefix of every ECKCDSA message hash)."""
    p_len = (keys.curve.fp_ctx.bits + 7) // 8
    xs_pub, ys_pub, _ = keys.pub_affine_ints()
    out = []
    for i in range(keys.n):
        z = (int(xs_pub[i]).to_bytes(p_len, "big")
             + int(ys_pub[i]).to_bytes(p_len, "big"))
        out.append((z + b"\x00" * alg.block_size)[: alg.block_size])
    return out


def verify_batch(keys: KeyBatch, msgs, sigs, hash_name="SHA256", adata=None):
    alg = get_hash(hash_name)
    zs = z_blocks(keys, alg)
    digs = common.batch_digests(alg, [zs[i] + m
                                      for i, m in enumerate(msgs)])
    return verify_digests_batch(keys, digs, sigs, hash_name)


def verify_digests_batch(keys: KeyBatch, digs, sigs, hash_name="SHA256",
                         adata=None):
    """Digest-level verify: digs are H(z || m) per lane (streaming
    finalize path — z is absorbed at init, the message streams)."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    alg = get_hash(hash_name)
    rl = _r_len(curve, alg)
    nb = (q.bit_length() + 7) // 8
    p_len = (curve.fp_ctx.bits + 7) // 8
    es, ss, pre_ok, r_bufs = [], [], [], []
    for i, sg in enumerate(sigs):
        ok = len(sg) == rl + nb
        r = sg[:rl] if ok else b"\x00" * rl
        s = int.from_bytes(sg[rl:], "big") if ok else 0
        ok = ok and 0 < s < q
        d = digs[i]
        h = d[len(d) - rl:] if len(d) > rl else d
        es.append(int.from_bytes(bytes(a ^ b for a, b in zip(r, h)),
                                 "big") % q)
        ss.append(s)
        r_bufs.append(r)
        pre_ok.append(ok)
    # W' = sY + eG  -> straus with u=e (on G), v=s (on Y)
    u = wcore.scalars_dev(q_ctx, es)
    v = wcore.scalars_dev(q_ctx, ss)
    wx, _, inf = wcore.straus_affine(curve, u, v, keys.pub)
    wx_ints = wcore.scalars_host(wx)
    inf = np.asarray(inf)
    wx_digs = common.batch_digests(
        alg, [int(wx_ints[i]).to_bytes(p_len, "big")
              for i in range(len(sigs))])
    out = []
    for i in range(len(sigs)):
        d = wx_digs[i]
        rp = d[len(d) - rl:] if len(d) > rl else d
        out.append(pre_ok[i] and not inf[i] and rp == r_bufs[i])
    return np.array(out)
