"""BIP0340 (Schnorr / Taproot, x-only) — batched TPU implementation.

Reference: src/sig/bip0340.c. SHA-256 + SECP256K1 per the BIP; the
reference keeps the generic (curve, hash) parametrization and so do we.
Public key Y = xG (full point kept; x-only semantics via even-y
normalization at sign/verify time).

Sign:  d' = d if Y.y even else q-d ;
       t = d' XOR H_tag("BIP0340/aux", aux) ;
       k0 = OS2I(H_tag("BIP0340/nonce", t || Yx || m)) mod q, reject 0 ;
       R = k0*G ; k = k0 if R.y even else q-k0 ;
       e = OS2I(H_tag("BIP0340/challenge", Rx || Yx || m)) mod q ;
       sig = FE2OS(Rx) || I2OS((k + e*d') mod q)
Verify: W = sG - e*Y_even ; accept iff W != inf, W.y even, W.x == r.
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
    return p_len + (curve.q.bit_length() + 7) // 8


def tagged_hash(alg, tag: bytes, *chunks: bytes) -> bytes:
    """BIP-340 tagged hash: H(H(tag) || H(tag) || data)."""
    th = alg.hash(tag)
    st = alg.new()
    st.update(th + th)
    for c in chunks:
        st.update(c)
    return st.digest()


def import_xonly_pub(curve: ShortWCurve, xonly: list[bytes]) -> KeyBatch:
    """Import 32-byte x-only public keys (BIP-340 lift_x: y = even sqrt of
    x^3 + ax + b; reject x >= p or non-residue — the Wycheproof bad-pubkey
    class). Reference: bip0340.c verify entry point."""
    from .keys import pubkey_batch_from_affine_ints
    p = curve.fp_ctx.p_int
    p_len = (curve.fp_ctx.bits + 7) // 8
    xs, ys = [], []
    for b in xonly:
        if len(b) != p_len:
            raise ValueError("x-only pubkey must be field-element sized")
        x = int.from_bytes(b, "big")
        if x >= p:
            raise ValueError("x-only pubkey out of field range")
        rhs = (pow(x, 3, p) + curve.a * x + curve.b) % p
        y = pow(rhs, (p + 1) // 4, p) if p % 4 == 3 else _sqrt_ts(rhs, p)
        if y * y % p != rhs:
            raise ValueError("x-only pubkey not on curve (lift_x failed)")
        ys.append(y if y % 2 == 0 else p - y)
        xs.append(x)
    return pubkey_batch_from_affine_ints(curve, "BIP0340", xs, ys)


def _sqrt_ts(n: int, p: int) -> int:
    """Host Tonelli-Shanks for p % 4 != 3 (rare curve case)."""
    if n == 0:
        return 0
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(n, q, p), pow(n, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
            if i == m:
                return 0
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


def sign_batch(keys: KeyBatch, msgs, hash_name="SHA256", nonces=None,
               aux=None, adata=None, blinding=False):
    """nonces: optional list[int] directly forcing k0 (KAT injection of the
    final nonce); aux: optional list[bytes] of 32-byte auxiliary random
    (the reference's rand callback output, bip0340.c:94).
    blinding=True runs k*G with the blinded ladder (scalar k+b*q +
    projective randomization) and the s-finalize in the b-masked domain
    (bip0340.c USE_SIG_BLINDING) — output bytes are identical."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    alg = get_hash(hash_name)
    n = len(msgs)
    p_len = (curve.fp_ctx.bits + 7) // 8
    q_len = (q.bit_length() + 7) // 8
    xs_pub, ys_pub, _ = keys.pub_affine_ints()
    privs = keys.priv_ints()
    dps, k0s = [], []
    for i in range(n):
        d = privs[i]
        dp = d if ys_pub[i] % 2 == 0 else (q - d) % q
        dps.append(dp)
        if nonces is not None:
            k0s.append(nonces[i] % q)
            continue
        a = aux[i] if aux is not None else __import__("os").urandom(q_len)
        ah = tagged_hash(alg, b"BIP0340/aux", a)
        dp_b = dp.to_bytes(q_len, "big")
        if q_len > alg.digest_size:
            t = bytes(x ^ y for x, y in zip(dp_b, ah)) + dp_b[alg.digest_size:]
        else:
            t = bytes(x ^ y for x, y in zip(dp_b, ah[:q_len]))
        k0 = int.from_bytes(
            tagged_hash(alg, b"BIP0340/nonce",
                        t, xs_pub[i].to_bytes(p_len, "big"), msgs[i]),
            "big") % q
        k0s.append(k0)
    k_dev, _ = wcore.nonces_for(curve, n, k0s)
    bs = None
    if blinding:
        kw, b_dev, lam = wcore.blind_inputs(curve, k0s)
        rx, ry, inf = wcore.kg_affine_blind(curve, kw, lam)
        bs = [v % q for v in wcore.scalars_host(b_dev)]
    else:
        rx, ry, inf = wcore.kg_affine(curve, k_dev)
    rx_i, ry_i = wcore.scalars_host(rx), wcore.scalars_host(ry)
    ks, es = [], []
    for i in range(n):
        k = k0s[i] if ry_i[i] % 2 == 0 else (q - k0s[i]) % q
        e = int.from_bytes(
            tagged_hash(alg, b"BIP0340/challenge",
                        rx_i[i].to_bytes(p_len, "big"),
                        xs_pub[i].to_bytes(p_len, "big"), msgs[i]),
            "big") % q
        ks.append(k)
        es.append(e)
    sigs = []
    ok = []
    for i in range(n):
        if bs is None:
            s = (ks[i] + es[i] * dps[i]) % q
        else:
            # masked finalize: s = b^-1 * (b*k + (b*e)*d) mod q
            b = bs[i]
            s = (pow(b, -1, q)
                 * (b * ks[i] + (b * es[i] % q) * dps[i])) % q
        sigs.append(rx_i[i].to_bytes(p_len, "big") + s.to_bytes(q_len, "big"))
        ok.append(k0s[i] != 0)
    return sigs, np.array(ok) & (~np.asarray(inf))


def challenge_prefix(curve, alg, sig: bytes, pub_x: int) -> bytes:
    """The tagged-hash input bytes ahead of the message:
    H(tag) || H(tag) || Rx || Px (streaming verify absorbs this at init,
    then the message streams through the same hash state)."""
    p_len = (curve.fp_ctx.bits + 7) // 8
    q_len = (curve.q.bit_length() + 7) // 8
    r = (int.from_bytes(sig[:p_len], "big")
         if len(sig) == p_len + q_len else 0)
    th = alg.hash(b"BIP0340/challenge")
    return (th + th + r.to_bytes(p_len, "big")
            + int(pub_x).to_bytes(p_len, "big"))


def verify_batch(keys: KeyBatch, msgs, sigs, hash_name="SHA256", adata=None):
    curve, q = keys.curve, keys.curve.q
    alg = get_hash(hash_name)
    xs_pub, _, _ = keys.pub_affine_ints()
    digs = common.batch_digests(
        alg, [challenge_prefix(curve, alg, sigs[i], xs_pub[i]) + m
              for i, m in enumerate(msgs)])
    return verify_digests_batch(keys, digs, sigs, hash_name)


def verify_digests_batch(keys: KeyBatch, digs, sigs, hash_name="SHA256",
                         adata=None):
    """Digest-level verify: digs are the BIP-340 challenge digests
    H(tag)||H(tag)||Rx||Px||m per lane (streaming finalize path)."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    p = curve.fp_ctx.p_int
    p_len = (curve.fp_ctx.bits + 7) // 8
    q_len = (q.bit_length() + 7) // 8
    xs_pub, ys_pub, _ = keys.pub_affine_ints()
    # even-y normalized public key batch
    from .keys import pubkey_batch_from_affine_ints
    ys_even = [y if y % 2 == 0 else (p - y) % p for y in ys_pub]
    pub_even = pubkey_batch_from_affine_ints(curve, "BIP0340",
                                             list(xs_pub), ys_even)
    us, vs, rs, pre_ok = [], [], [], []
    for i, sg in enumerate(sigs):
        ok = len(sg) == p_len + q_len
        r = int.from_bytes(sg[:p_len], "big") if ok else 0
        s = int.from_bytes(sg[p_len:], "big") if ok else 0
        ok = ok and r < p and 0 < s < q
        e = int.from_bytes(digs[i], "big") % q
        us.append(s)
        vs.append((-e) % q)
        rs.append(r)
        pre_ok.append(ok)
    u = wcore.scalars_dev(q_ctx, us)
    v = wcore.scalars_dev(q_ctx, vs)
    wx, wy, inf = wcore.straus_affine(curve, u, v, pub_even.pub)
    wx_i, wy_i = wcore.scalars_host(wx), wcore.scalars_host(wy)
    inf = np.asarray(inf)
    out = [pre_ok[i] and not inf[i] and wy_i[i] % 2 == 0
           and wx_i[i] == rs[i] for i in range(len(sigs))]
    return np.array(out)
