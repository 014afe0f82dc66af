"""ECDSA + deterministic ECDSA (RFC 6979) — batched TPU implementation.

Reference: src/sig/ecdsa_common.c (sign finalize :318-586, verify finalize
:702-840, RFC 6979 nonce :48-170), ecdsa.c, decdsa.c. Differences by
design (SURVEY §7): signing is a single batched fixed-schedule ladder over
the whole lane batch; verification uses the public-input Straus double-
scalar path; all per-op error returns become lane masks.

Sign:   r = (kG).x mod q ; s = k^-1 (e + r d) mod q
Verify: W = (e s^-1) G + (r s^-1) Y ; accept iff W.x mod q == r
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..curves.shortw import ShortWCurve, PrjPoint, to_affine_plain
from ..curves import scalar_mul
from ..hash.registry import get_hash
from ..hash.hmac import Hmac
from . import common


# ---------------------------------------------------------------------------
# Batched device cores (jit these; fixed shapes)
# ---------------------------------------------------------------------------

def sign_core(curve: ShortWCurve, d, e, k):
    """Batched ECDSA sign. d, e, k: canonical uint32[Kq, N].
    Returns (r, s, ok_mask) with r, s canonical limbs.

    The nonce k comes from the caller (random, RFC 6979, or KAT-injected —
    the reference threads the same way via the rand callback,
    ec_self_tests_core.h:34)."""
    q_ctx = curve.q_ctx
    W = scalar_mul.fixed_base_mul(curve, k)          # fixed schedule comb
    wx, _, inf = to_affine_plain(curve, W)
    r = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    kinv = common.q_inv(k, q_ctx)
    rd = common.q_mul(r, d, q_ctx)
    s = common.q_mul(kinv, common.q_add(e, rd, q_ctx), q_ctx)
    ok = (~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s)) & (~inf)
    return r, s, ok


def sign_core_blind(curve: ShortWCurve, d, e, k, k_wide, b, lam):
    """Blinded batched ECDSA sign — identical OUTPUT bytes to sign_core,
    with the reference's three USE_SIG_BLINDING countermeasures
    (ecdsa_common.c:466-531, prj_pt.c:1266,:1782):
      * scalar blinding: the ladder runs over k + b*q (k_wide);
      * projective blinding: accumulator representative scaled by lam;
      * masked finalize: s = (b*k)^-1 * (d*(b*r) + b*e) — the secret k
        and the product r*d are never manipulated unmasked."""
    from . import wcore as _w
    q_ctx = curve.q_ctx
    wx, _, inf = _w.kg_affine_blind(curve, k_wide, lam)
    r = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    r_b = common.q_mul(r, b, q_ctx)
    e_b = common.q_mul(e, b, q_ctx)
    k_b = common.q_mul(k, b, q_ctx)
    kinv = common.q_inv(k_b, q_ctx)
    s = common.q_mul(kinv, common.q_add(common.q_mul(d, r_b, q_ctx),
                                        e_b, q_ctx), q_ctx)
    ok = (~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s)) & (~inf)
    return r, s, ok


def verify_core(curve: ShortWCurve, pub: PrjPoint, e, r, s):
    """Batched ECDSA verify. e, r, s canonical uint32[Kq, N]; pub: points.
    Returns accept mask. Public-input path: comb(uG) + windowed(vY) (no CT
    needed — verification inputs are public; reference uses the hardened
    ladder even here, a large throughput headroom we exploit).

    The final x(W) mod q == r test runs PROJECTIVELY when ceil(p/q) <= 2:
    accept iff W.X == c*W.Z for a candidate c in {r, r+q} (mod p) — this
    removes the batched Fermat inversion (~380 field ops) that an affine
    conversion would cost. Candidates beyond r+q can't occur since any
    x < p with x = r (mod q) is r + m*q, m < ceil(p/q)."""
    from ..fp import field as fp
    q_ctx = curve.q_ctx
    p_ctx = curve.fp_ctx
    q_arr = jnp.asarray(nn.to_limbs(curve.q, q_ctx.k)).reshape(
        (q_ctx.k,) + (1,) * (r.ndim - 1))
    in_range = (~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s)) \
        & nn.lt_mask(r, q_arr) & nn.lt_mask(s, q_arr)
    sinv = common.q_inv(s, q_ctx)
    u = common.q_mul(e, sinv, q_ctx)
    v = common.q_mul(r, sinv, q_ctx)
    # FIA pre/post on-curve checks (prj_pt.c:1767,1776): hostile or
    # faulted points force rejection via the accept mask
    from ..curves.shortw import on_curve_mask
    fia_ok = on_curve_mask(curve, pub)
    W = scalar_mul.fixed_base_double_mul_public(curve, u, v, pub)
    fia_ok = fia_ok & on_curve_mask(curve, W)
    in_range = in_range & fia_ok
    p_int, q_int = p_ctx.p_int, curve.q
    n_cand = (p_int - 1) // q_int + 1
    if n_cand <= 2:
        inf = fp.is_zero_mask(W.z, p_ctx)
        # r as a field element (k_p limbs, Montgomery domain)
        kp = p_ctx.k
        r_p = r[:kp] if r.shape[0] >= kp else jnp.concatenate(
            [r, jnp.zeros((kp - r.shape[0],) + r.shape[1:], r.dtype)])
        rm = nn.to_mont(r_p, p_ctx)          # r as Montgomery-domain fp
        hit = fp.eq_mask(W.x, fp.mul(rm, W.z, p_ctx), p_ctx)
        if q_int > p_int:
            # r in [p, q) reduces mod p inside rm — such r can never
            # equal x(W) < p, so mask those lanes out explicitly
            p_arr = jnp.asarray(nn.to_limbs(p_int, q_ctx.k)).reshape(
                (q_ctx.k,) + (1,) * (r.ndim - 1))
            hit = hit & nn.lt_mask(r, p_arr)
        else:
            # second candidate x = r + q (only when the integer r+q < p)
            qm = p_ctx.const(q_int, like=r_p)
            rq = fp.add(rm, qm, p_ctx)
            p_minus_q = jnp.asarray(
                nn.to_limbs(p_int - q_int, q_ctx.k)).reshape(
                (q_ctx.k,) + (1,) * (r.ndim - 1))
            rq_ok = nn.lt_mask(r, p_minus_q)
            hit = hit | (fp.eq_mask(W.x, fp.mul(rq, W.z, p_ctx), p_ctx)
                         & rq_ok)
        return in_range & (~inf) & hit
    wx, _, inf = to_affine_plain(curve, W)
    wx_mod_q = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    return in_range & (~inf) & nn.eq_mask(wx_mod_q, r)


# ---------------------------------------------------------------------------
# RFC 6979 deterministic nonce (host, per message — HMAC chains are
# sequential by construction). Reference: __ecdsa_rfc6979_nonce
# (ecdsa_common.c:48-170).
# ---------------------------------------------------------------------------

def _bits2int(b: bytes, qbits: int) -> int:
    v = int.from_bytes(b, "big")
    blen = len(b) * 8
    if blen > qbits:
        v >>= blen - qbits
    return v


def _int2octets(x: int, q: int) -> bytes:
    rlen = (q.bit_length() + 7) // 8
    return x.to_bytes(rlen, "big")


def rfc6979_nonce(h1: bytes, q: int, x: int, hash_name) -> int:
    """Deterministic k for message digest h1, order q, private key x."""
    qbits = q.bit_length()
    hsize = get_hash(hash_name).digest_size
    V = b"\x01" * hsize
    K = b"\x00" * hsize
    bh = _bits2int(h1, qbits) % q
    seed = _int2octets(x, q) + _int2octets(bh, q)
    hm = Hmac(K, hash_name); hm.update(V + b"\x00" + seed); K = hm.digest()
    hm = Hmac(K, hash_name); hm.update(V); V = hm.digest()
    hm = Hmac(K, hash_name); hm.update(V + b"\x01" + seed); K = hm.digest()
    hm = Hmac(K, hash_name); hm.update(V); V = hm.digest()
    while True:
        T = b""
        while len(T) * 8 < qbits:
            hm = Hmac(K, hash_name); hm.update(V); V = hm.digest()
            T += V
        k = _bits2int(T, qbits)
        if 0 < k < q:
            return k
        hm = Hmac(K, hash_name); hm.update(V + b"\x00"); K = hm.digest()
        hm = Hmac(K, hash_name); hm.update(V); V = hm.digest()


# ---------------------------------------------------------------------------
# User-facing batched API (host msgs -> device batch -> host sigs)
# ---------------------------------------------------------------------------

def _jit_sign(curve):
    return jax.jit(lambda d, e, k: sign_core(curve, d, e, k))


def _jit_verify(curve):
    return jax.jit(lambda px, py, pz, e, r, s: verify_core(
        curve, PrjPoint(px, py, pz), e, r, s))


_SIGN_CACHE: dict = {}
_VERIFY_CACHE: dict = {}


def sign_batch(keys, msgs: list[bytes], hash_name="SHA256",
               nonces=None, deterministic=False, adata=None,
               blinding=False):
    """Sign N messages with N keys. Returns (sigs list[bytes r||s], ok).
    nonces: optional fixed list[int] (KAT injection).
    blinding=True enables the reference's USE_SIG_BLINDING
    countermeasures (scalar m+b*q, projective randomization, masked
    finalize) — output bytes are identical either way."""
    curve, q_ctx = keys.curve, keys.curve.q_ctx
    alg = get_hash(hash_name)
    if deterministic and nonces is None:
        # RFC 6979 needs the raw digests on host anyway
        digs = common.batch_digests(alg, msgs)
        words = common.digests_to_words(digs)
        e = common.e_from_digest_bits(jnp.asarray(words),
                                      alg.digest_size * 8, q_ctx)
    else:
        digs = None
        e = common.e_from_msgs(alg, msgs, q_ctx)
    if nonces is None:
        if deterministic:
            nonces = [rfc6979_nonce(h1, curve.q, x, hash_name)
                      for h1, x in zip(digs, keys.priv_ints())]
        else:
            import os as _os
            nb = (curve.q.bit_length() + 128) // 8
            nonces = []
            while len(nonces) < keys.n:
                blob = _os.urandom(nb * (keys.n - len(nonces)))
                for i in range(0, len(blob), nb):
                    v = int.from_bytes(blob[i:i + nb], "big") % curve.q
                    if v:
                        nonces.append(v)
    k = common.scalars_from_ints(q_ctx, nonces)
    if blinding:
        from . import wcore as _w
        kw, b_dev, lam = _w.blind_inputs(curve, nonces)
        key = (curve.name, "sign_blind")
        if key not in _SIGN_CACHE:
            _SIGN_CACHE[key] = jax.jit(
                lambda d, e, k, kw, b, lam: sign_core_blind(
                    curve, d, e, k, kw, b, lam))
        r, s, ok = _SIGN_CACHE[key](keys.priv, e, jnp.asarray(k), kw,
                                    b_dev, lam)
    else:
        key = (curve.name, "sign")
        if key not in _SIGN_CACHE:
            _SIGN_CACHE[key] = _jit_sign(curve)
        r, s, ok = _SIGN_CACHE[key](keys.priv, e, jnp.asarray(k))
    nb = (curve.q.bit_length() + 7) // 8
    r_b = nn.limbs_to_bytes_be_np(np.asarray(r), nb)
    s_b = nn.limbs_to_bytes_be_np(np.asarray(s), nb)
    from ..utils import dbg
    if dbg.enabled():
        dbg.trace_nn("ECDSA", "e", e, q_ctx)
        dbg.trace_nn("ECDSA", "r", nn.batch_from_limbs(np.asarray(r)))
        dbg.trace_nn("ECDSA", "s", nn.batch_from_limbs(np.asarray(s)))
    sigs = [r_b[i] + s_b[i] for i in range(len(r_b))]
    return sigs, np.asarray(ok)


def sign_batches(keys, batches, hash_name="SHA256", depth: int = 3,
                 deterministic=False, blinding=False):
    """Pipelined signing over a stream of message batches (the sign-side
    analog of verify_batches): yields (sigs, ok) per batch while keeping
    up to `depth` device dispatches in flight. Nonce generation and
    signature byte marshalling stay on host (the RNG/export boundary);
    the k*G comb + finalize arithmetic overlaps across batches."""
    from collections import deque
    pending: deque = deque()

    def finish(item):
        r, s, ok, nb_ = item
        r_b = nn.limbs_to_bytes_be_np(np.asarray(r), nb_)
        s_b = nn.limbs_to_bytes_be_np(np.asarray(s), nb_)
        return ([r_b[i] + s_b[i] for i in range(len(r_b))],
                np.asarray(ok))

    curve, q_ctx = keys.curve, keys.curve.q_ctx
    nb = (curve.q.bit_length() + 7) // 8
    for msgs in batches:
        alg = get_hash(hash_name)
        if deterministic:
            digs = common.batch_digests(alg, msgs)
            e = common.e_from_digest_bits(
                jnp.asarray(common.digests_to_words(digs)),
                alg.digest_size * 8, q_ctx)
            nonces = [rfc6979_nonce(h1, curve.q, x, hash_name)
                      for h1, x in zip(digs, keys.priv_ints())]
        else:
            e = common.e_from_msgs(alg, msgs, q_ctx)
            import os as _os
            nbts = (curve.q.bit_length() + 128) // 8
            nonces = []
            while len(nonces) < len(msgs):
                blob = _os.urandom(nbts * (len(msgs) - len(nonces)))
                for i in range(0, len(blob), nbts):
                    v = int.from_bytes(blob[i:i + nbts], "big") % curve.q
                    if v:
                        nonces.append(v)
        k = jnp.asarray(common.scalars_from_ints(q_ctx, nonces))
        if blinding:
            from . import wcore as _w
            kw, b_dev, lam = _w.blind_inputs(curve, nonces)
            key = (curve.name, "sign_blind")
            if key not in _SIGN_CACHE:
                _SIGN_CACHE[key] = jax.jit(
                    lambda d, e, k, kw, b, lam: sign_core_blind(
                        curve, d, e, k, kw, b, lam))
            r, s, ok = _SIGN_CACHE[key](keys.priv, e, k, kw, b_dev, lam)
        else:
            key = (curve.name, "sign")
            if key not in _SIGN_CACHE:
                _SIGN_CACHE[key] = _jit_sign(curve)
            r, s, ok = _SIGN_CACHE[key](keys.priv, e, k)
        pending.append((r, s, ok, nb))
        while len(pending) >= depth:
            yield finish(pending.popleft())
    while pending:
        yield finish(pending.popleft())


def public_key_from_sig_batch(curve, msgs: list[bytes], sigs: list[bytes],
                              hash_name="SHA256"):
    """Batched ECDSA public-key recovery from (message, signature).

    Reference: __ecdsa_public_key_from_sig (ecdsa_common.c:867-1010).
    For each lane: x = r + m*q for the smallest m (m <= 10, x < p) where
    x^3 + ax + b is a quadratic residue; R = (x, ±y); the two candidate
    keys are Q_j = r^-1 (s R_j - e G) = uG + v R_j with u = -e r^-1,
    v = s r^-1 — computed on the batched Straus kernel (the same device
    program as verify).

    Returns (pub1, pub2, ok): two candidate KeyBatches (lanes invalid
    where ok is False carry the generator as a placeholder) and the
    validity mask. The true public key is pub1 or pub2 per lane (for
    cofactor-1 curves, with overwhelming probability)."""
    from . import wcore
    from .keys import pubkey_batch_from_affine_ints
    from ..curves import maps as cmaps
    q_ctx = curve.q_ctx
    q = curve.q
    p = curve.fp_ctx.p_int
    alg = get_hash(hash_name)
    nb = (q.bit_length() + 7) // 8
    n = len(sigs)
    xs, y1s, y2s, us, vs, ok = [], [], [], [], [], []
    for m, sg in zip(msgs, sigs):
        good = len(sg) == 2 * nb
        r = int.from_bytes(sg[:nb], "big") if good else 0
        s = int.from_bytes(sg[nb:], "big") if good else 0
        good = good and 0 < r < q and 0 < s < q
        x = y = None
        if good:
            cand = r
            for _ in range(11):            # order_multiplier <= 10
                if cand >= p:
                    break
                rhs = (pow(cand, 3, p) + curve.a * cand + curve.b) % p
                y = cmaps._sqrt_p(rhs, p)
                if y is not None:
                    x = cand
                    break
                cand += q
            good = x is not None
        if good:
            e = wcore.trunc_msb_mod_q(alg.hash(m), q)
            rinv = pow(r, -1, q)
            us.append((-e * rinv) % q)
            vs.append(s * rinv % q)
            xs.append(x)
            y1s.append(y)
            y2s.append((p - y) % p)
        else:
            us.append(0)
            vs.append(1)
            xs.append(curve.gx)
            y1s.append(curve.gy)
            y2s.append((p - curve.gy) % p)
        ok.append(good)
    u = wcore.scalars_dev(q_ctx, us)
    v = wcore.scalars_dev(q_ctx, vs)
    outs = []
    for ys in (y1s, y2s):
        R = curve.point_from_affine_ints(xs, ys)
        wx, wy, inf = wcore.straus_affine(curve, u, v, R)
        qx = wcore.scalars_host(wx)
        qy = wcore.scalars_host(wy)
        inf = np.asarray(inf)
        # invalid/infinity lanes -> generator placeholder
        qx = [curve.gx if (inf[i] or not ok[i]) else qx[i]
              for i in range(n)]
        qy = [curve.gy if (inf[i] or not ok[i]) else qy[i]
              for i in range(n)]
        outs.append(pubkey_batch_from_affine_ints(curve, "ECDSA", qx, qy))
        ok = [ok[i] and not inf[i] for i in range(n)]
    return outs[0], outs[1], np.array(ok)


def verify_batch(keys, msgs: list[bytes], sigs: list[bytes],
                 hash_name="SHA256", adata=None):
    """Verify N signatures (r||s raw format). Returns accept mask."""
    alg = get_hash(hash_name)
    e = common.e_from_msgs(alg, msgs, keys.curve.q_ctx)
    return _verify_with_e(keys, e, sigs)


def verify_digests_batch(keys, digs: list[bytes], sigs: list[bytes],
                         hash_name="SHA256", adata=None):
    """Digest-level verify — the streaming VerifyContext finalize path
    (reference: ec_verify_finalize consumes the hash context,
    sig_algs.c:294+). Bit-identical to verify_batch on H(m)=digs."""
    alg = get_hash(hash_name)
    e = common.e_from_digest_bits(
        jnp.asarray(common.digests_to_words(digs)),
        alg.digest_size * 8, keys.curve.q_ctx)
    return _verify_with_e(keys, e, sigs)


def _verify_with_e(keys, e, sigs):
    return np.asarray(_verify_dispatch(keys, e, sigs))


def _verify_dispatch(keys, e, sigs):
    """Parse+pack signatures and dispatch the device program WITHOUT
    blocking on the result — returns the (async) accept-mask device
    array. The pipelined APIs below keep several of these in flight so
    host marshalling of batch i+1 overlaps device compute of batch i."""
    curve, q_ctx = keys.curve, keys.curve.q_ctx
    nb = (curve.q.bit_length() + 7) // 8
    for sg in sigs:
        if len(sg) != 2 * nb:
            raise ValueError("bad signature length")
    # vectorized bytes -> limbs (native C++ when built): nb*8 <= k*15
    # always holds (k has +2 headroom limbs), so no masking is needed
    r = jnp.asarray(nn.bytes_be_to_limbs_np([sg[:nb] for sg in sigs],
                                            q_ctx.k))
    s = jnp.asarray(nn.bytes_be_to_limbs_np([sg[nb:] for sg in sigs],
                                            q_ctx.k))
    key = (curve.name, "verify")
    if key not in _VERIFY_CACHE:
        _VERIFY_CACHE[key] = _jit_verify(curve)
    return _VERIFY_CACHE[key](keys.pub.x, keys.pub.y, keys.pub.z, e, r, s)


def _fused_applicable(alg, msgs, sigs, nb):
    """The whole-pipeline bytes-in jit applies when the hash is a
    64-byte-block big-endian MD algorithm with a device kernel
    (SHA-224/256, SM3), the batch is uniform-length, and every
    signature is well-formed."""
    from ..hash.sha2 import pack_blocks_sha256
    if alg.device_fn is None or alg.pack_fn is not pack_blocks_sha256:
        return False
    if not msgs or len(msgs) < 64:
        return False
    mlen = len(msgs[0])
    if mlen + 9 > 64 * 4:        # cap traced variants at 4 blocks
        return False
    return (all(len(m) == mlen for m in msgs)
            and all(len(s) == 2 * nb for s in sigs))


def _jit_verify_fused(curve, alg, mlen):
    from ..hash.sha2 import blocks_from_bytes_dev
    q_ctx = curve.q_ctx
    nb = (curve.q.bit_length() + 7) // 8

    def f(px, py, pz, msg_u8, sig_u8):
        blocks = blocks_from_bytes_dev(msg_u8, mlen)
        words = alg.device_fn(blocks)
        e = common.e_from_digest_bits(words, alg.digest_size * 8, q_ctx)
        r = nn.be_rows_to_limbs_dev(sig_u8[:, :nb], q_ctx.k)
        s = nn.be_rows_to_limbs_dev(sig_u8[:, nb:], q_ctx.k)
        return verify_core(curve, PrjPoint(px, py, pz), e, r, s)
    return jax.jit(f)


def verify_batch_async(keys, msgs: list[bytes], sigs: list[bytes],
                       hash_name="SHA256", adata=None):
    """Non-blocking verify_batch: performs all host marshalling and
    dispatches the device program, returning the accept mask as a jax
    async array (np.asarray(result) blocks). Building block of the
    streaming/pipelined server path.

    Uniform batches take the FUSED bytes-in pipeline: raw message and
    signature bytes are shipped as u8 arrays and hashed / limb-unpacked
    ON DEVICE (hash/sha2.py blocks_from_bytes_dev +
    nn.be_rows_to_limbs_dev) — ~2.4x less host->device traffic and no
    host packing loops; bit-identical accept masks (differential-tested
    against the generic path)."""
    curve, q_ctx = keys.curve, keys.curve.q_ctx
    alg = get_hash(hash_name)
    nb = (curve.q.bit_length() + 7) // 8
    if _fused_applicable(alg, msgs, sigs, nb):
        mlen = len(msgs[0])
        n = len(msgs)
        msg_u8 = jnp.asarray(np.frombuffer(
            b"".join(msgs), np.uint8).reshape(n, mlen))
        sig_u8 = jnp.asarray(np.frombuffer(
            b"".join(sigs), np.uint8).reshape(n, 2 * nb))
        key = (curve.name, "verify_fused", alg.name, mlen)
        if key not in _VERIFY_CACHE:
            _VERIFY_CACHE[key] = _jit_verify_fused(curve, alg, mlen)
        return _VERIFY_CACHE[key](keys.pub.x, keys.pub.y, keys.pub.z,
                                  msg_u8, sig_u8)
    e = common.e_from_msgs(alg, msgs, keys.curve.q_ctx)
    return _verify_dispatch(keys, e, sigs)


def verify_batches(keys, batches, hash_name="SHA256", depth: int = 3):
    """Pipelined end-to-end verification over a stream of batches.

    batches: iterable of (msgs, sigs) pairs (each a same-length list of
    byte strings). Yields one np.bool accept mask per batch, keeping up
    to `depth` device dispatches in flight so host packing, host->device
    transfer and device compute all overlap — the TPU-serving analog of
    the reference's one-at-a-time ec_verify loop (ec_self_tests_core.c's
    perf protocol runs sequential single verifies; a batch device needs
    a full pipeline to hit its throughput).

    Out-of-order hosts note: results are yielded strictly in input
    order."""
    from collections import deque
    pending: deque = deque()
    for msgs, sigs in batches:
        pending.append(verify_batch_async(keys, msgs, sigs, hash_name))
        while len(pending) >= depth:
            yield np.asarray(pending.popleft())
    while pending:
        yield np.asarray(pending.popleft())
