"""BIGN and DBIGN (Belarusian STB 34.101.45) — batched TPU implementation.

Reference: src/sig/bign_common.c (+ bign.c / dbign.c). Public key Y = xG.
adata carries (oid, t): [oid_len u16 | t_len u16 | oid | t]
(bign_common.c:97-149). All scalar strings are little-endian per STB.

Sign:  h = H(m) ; W = kG ; l = BYTECEIL(q_bits)/2 ;
       s0 = BELT_HASH(oid || LE(Wx)||LE(Wy) first 2l bytes || h)[:l] ;
       s1 = (k - LE2I(h) - (LE2I(s0) + 2^(8l))*x) mod q ;
       sig = s0 || LE(s1)
Verify: u = (LE2I(h) + LE2I(s1)) mod q ; v = (LE2I(s0) + 2^(8l)) mod q ;
       W' = uG + vY, reject infinity ; recompute s0' ; accept iff s0' == s0
DBIGN: deterministic nonce via the belt-block chain of STB 34.101.45
       annex (__bign_determinitic_nonce, bign_common.c).
"""

from __future__ import annotations

import struct

import numpy as np
import jax.numpy as jnp

from ..nn import core as nn
from ..curves.shortw import ShortWCurve
from ..hash.registry import get_hash
from ..hash.belt_bash import belt_encrypt
from . import wcore, common
from .keys import KeyBatch

# standard adata: belt-hash OID (1.2.112.0.2.0.34.101.31.81 DER), empty t
DEFAULT_ADATA = bytes([0x00, 0x0B, 0x00, 0x00,
                       0x06, 0x09, 0x2A, 0x70, 0x00, 0x02, 0x00, 0x22,
                       0x65, 0x1F, 0x51])


def parse_adata(adata: bytes):
    """adata -> (oid, t) (reference: bign_get_oid/t_from_adata)."""
    if adata is None:
        adata = DEFAULT_ADATA
    if len(adata) < 4:
        raise ValueError("bign adata too short")
    oid_len = int.from_bytes(adata[0:2], "big")
    t_len = int.from_bytes(adata[2:4], "big")
    if 4 + oid_len + t_len > len(adata):
        raise ValueError("bign adata lengths inconsistent")
    return adata[4:4 + oid_len], adata[4 + oid_len:4 + oid_len + t_len]


def siglen(curve: ShortWCurve, hash_name=None) -> int:
    nb = (curve.q.bit_length() + 7) // 8
    return nb // 2 + nb


def _le(v: int, n: int) -> bytes:
    return int(v).to_bytes(n, "little")


def _s0_of(curve, oid: bytes, wx: int, wy: int, h: bytes, l: int) -> bytes:
    belt = get_hash("BELT_HASH")
    p_len = (curve.fp_ctx.bits + 7) // 8
    w_le = _le(wx, p_len) + _le(wy, p_len)
    st = belt.new()
    st.update(oid)
    st.update(w_le[: 2 * l])
    st.update(h)
    return st.digest()[:l]


def deterministic_nonce(q: int, x: int, adata: bytes, h: bytes) -> int:
    """STB 34.101.45 deterministic nonce chain over the belt block cipher
    (reference: __bign_determinitic_nonce)."""
    oid, t = parse_adata(adata)
    q_len = (q.bit_length() + 7) // 8
    l = q_len // 2
    belt = get_hash("BELT_HASH")
    st = belt.new()
    st.update(oid)
    st.update(_le(x, q_len)[: 2 * l])
    st.update(t)
    theta = st.digest()
    n = max(2, len(h) // 16)
    r = bytearray(16 * n)
    r[: len(h)] = h
    i = 1
    while True:
        s = bytes(16)
        for j in range(n - 1):
            s = bytes(a ^ b for a, b in zip(s, r[16 * j: 16 * j + 16]))
        # shift blocks left by one
        r[: 16 * (n - 2)] = r[16: 16 * (n - 1)]
        enc = belt_encrypt(s, theta)
        i_block = struct.pack("<I", i & 0xFFFFFFFF) + bytes(12)
        last = bytes(r[16 * (n - 1): 16 * n])
        r[16 * (n - 2): 16 * (n - 1)] = bytes(
            a ^ b ^ c for a, b, c in zip(enc, last, i_block))
        r[16 * (n - 1): 16 * n] = s
        if q_len < 16 * n:
            cand = bytes(r[:q_len])
            if q.bit_length() % 8:
                cand = cand[:-1] + bytes(
                    [cand[-1] & ((1 << (q.bit_length() % 8)) - 1)])
        else:
            cand = bytes(r[: 16 * n])
        k = int.from_bytes(cand, "little")
        if i >= 2 * n and 0 < k < q:
            return k
        i += 1


def sign_batch(keys: KeyBatch, msgs, hash_name="BELT_HASH", nonces=None,
               adata=DEFAULT_ADATA, deterministic=False, blinding=False):
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    alg = get_hash(hash_name)
    oid, _t = parse_adata(adata)
    n = len(msgs)
    q_len = (q.bit_length() + 7) // 8
    l = q_len // 2
    hs = common.batch_digests(alg, msgs)
    if nonces is None and deterministic:
        privs = keys.priv_ints()
        nonces = [deterministic_nonce(q, privs[i], adata, hs[i])
                  for i in range(n)]
    k_dev, k_ints = wcore.nonces_for(curve, n, nonces)
    wx, wy, inf, bpair = wcore.kg_affine_for(curve, k_dev, k_ints, blinding)
    wx_i, wy_i = wcore.scalars_host(wx), wcore.scalars_host(wy)
    s0s, corr = [], []
    two_l = pow(2, 8 * l, q)
    for i in range(n):
        s0 = _s0_of(curve, oid, wx_i[i], wy_i[i], hs[i], l)
        s0s.append(s0)
        h_bar = int.from_bytes(hs[i], "little") % q
        s0_bar = int.from_bytes(s0, "little") % q
        # s1 = k - h_bar - (s0_bar + 2^(8l)) x  -> correction pair
        corr.append((h_bar, (s0_bar + two_l) % q))
    hb = wcore.scalars_dev(q_ctx, [c[0] for c in corr])
    sb = wcore.scalars_dev(q_ctx, [c[1] for c in corr])
    if bpair is None:
        s1 = common.q_sub(
            common.q_sub(k_dev,
                         common.q_mul(jnp.asarray(sb), keys.priv, q_ctx),
                         q_ctx),
            jnp.asarray(hb), q_ctx)
    else:
        # masked finalize (bign_common.c USE_SIG_BLINDING):
        # s1 = b^-1 * (b*k - (b*(s0_bar+2^8l))*x - b*h_bar)
        b, binv = bpair
        bk = common.q_mul(b, k_dev, q_ctx)
        bsx = common.q_mul(common.q_mul(b, jnp.asarray(sb), q_ctx),
                           keys.priv, q_ctx)
        bh = common.q_mul(b, jnp.asarray(hb), q_ctx)
        s1 = common.q_mul(
            binv, common.q_sub(common.q_sub(bk, bsx, q_ctx), bh, q_ctx),
            q_ctx)
    s1_i = wcore.scalars_host(s1)
    sigs = [s0s[i] + _le(s1_i[i], q_len) for i in range(n)]
    return sigs, ~np.asarray(inf)


def verify_batch(keys: KeyBatch, msgs, sigs, hash_name="BELT_HASH",
                 adata=DEFAULT_ADATA):
    alg = get_hash(hash_name)
    return verify_digests_batch(keys, common.batch_digests(alg, msgs),
                                sigs, hash_name, adata)


def verify_digests_batch(keys: KeyBatch, digs, sigs,
                         hash_name="BELT_HASH", adata=DEFAULT_ADATA):
    """Digest-level verify (streaming finalize path)."""
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    oid, _t = parse_adata(adata)
    q_len = (q.bit_length() + 7) // 8
    l = q_len // 2
    two_l = pow(2, 8 * l, q)
    us, vs, pre_ok, s0_l, hs = [], [], [], [], []
    for h, sg in zip(digs, sigs):
        ok = len(sg) == l + q_len
        s0 = sg[:l] if ok else b"\x00" * l
        s1 = int.from_bytes(sg[l:], "little") if ok else 0
        ok = ok and s1 < q
        h_bar = int.from_bytes(h, "little") % q
        us.append((h_bar + s1) % q)
        vs.append((int.from_bytes(s0, "little") % q + two_l) % q)
        s0_l.append(s0)
        hs.append(h)
        pre_ok.append(ok)
    u = wcore.scalars_dev(q_ctx, us)
    v = wcore.scalars_dev(q_ctx, vs)
    wx, wy, inf = wcore.straus_affine(curve, u, v, keys.pub)
    wx_i, wy_i = wcore.scalars_host(wx), wcore.scalars_host(wy)
    inf = np.asarray(inf)
    out = []
    for i in range(len(sigs)):
        s0p = _s0_of(curve, oid, wx_i[i], wy_i[i], hs[i], l)
        out.append(pre_ok[i] and not inf[i] and s0p == s0_l[i])
    return np.array(out)


def sign_batch_dbign(keys, msgs, hash_name="BELT_HASH", nonces=None,
                     adata=DEFAULT_ADATA, blinding=False):
    return sign_batch(keys, msgs, hash_name, nonces, adata,
                      deterministic=(nonces is None), blinding=blinding)


def verify_batch_dbign(keys, msgs, sigs, hash_name="BELT_HASH",
                       adata=DEFAULT_ADATA):
    return verify_batch(keys, msgs, sigs, hash_name, adata)
