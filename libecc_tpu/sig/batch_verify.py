"""Batch signature verification — the TPU-native replacement for the
reference's Bos-Coster multi-scalar path (sig_algs.c:1052
ec_verify_bos_coster; registered for ECFSDSA ecfsdsa.c:842, EdDSA
eddsa.c:2580, BIP0340 — schemes whose signature embeds a recoverable
commitment point R).

Semantics match the reference: ONE accept/reject for the whole batch.
Method: random-linear-combination check. With per-signature equation
s_i*G == R_i + e_i*Y_i and random 128-bit z_i:

    (sum_i z_i s_i) * G  ==  sum_i ( z_i*R_i + (z_i e_i)*Y_i )

The left side collapses to a single fixed-base mult; the right side is a
lane-batched joint Straus (shared doublings per lane) followed by a
log2(N) lane-tree point reduction — fully SIMD, unlike Bos-Coster's
sort-and-subtract loop which is sequential by construction (SURVEY §3.3).
Acceptance compares the two points projectively (cross-multiplication, no
inversion). Forging acceptance requires guessing the z_i (2^-128).

Across a device mesh the lane tree reduces shard-locally and GSPMD
inserts the cross-shard combine; see parallel/mesh.py.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..fp import field as fp
from ..curves import scalar_mul
from ..curves.group import pstack, punstack
from ..hash.registry import get_hash
from . import wcore

Z_BITS = 128


def _rand_zs(n: int, rng=None) -> list[int]:
    rng = rng or os.urandom
    return [int.from_bytes(rng(Z_BITS // 8), "big") | 1 for _ in range(n)]


def point_tree_reduce(curve, P):
    """Lane-tree point sum: batch point (coords of shape (K, N)) -> (K, 1).
    log2(N) rounds of one batched add each (the SIMD analog of the
    reference's final accumulation; replaces its sequential loop)."""
    cls = type(P)
    arr = pstack(P)                       # (ncoord, K, N)
    while arr.shape[-1] > 1:
        m = arr.shape[-1]
        if m % 2 == 1:
            pad = pstack(curve.pinf(batch_shape=(1,)))
            arr = jnp.concatenate([arr, pad], axis=-1)
            m += 1
        a = punstack(cls, arr[..., 0::2])
        b = punstack(cls, arr[..., 1::2])
        arr = pstack(curve.padd(a, b))
    return punstack(cls, arr)


_JITS: dict = {}


def _combined_check(curve, zs_dev, e2_dev, Y, R, c_int):
    """Device core: accept iff c*G == sum_i (z_i*R_i + e2_i*Y_i).
    zs/e2: canonical scalar limbs (Kq, N); Y, R: point batches;
    c_int: host scalar for the collapsed fixed-base term. Jitted per
    (curve, batch size, point model)."""
    q_ctx = curve.q_ctx
    cls = type(Y)
    n = zs_dev.shape[-1]

    def core(zs, e2, Ys, Rs, c_dev):
        Yp, Rp = punstack(cls, Ys), punstack(cls, Rs)
        # w=4 separate-table Straus: rides the whole-scalar-mult Pallas
        # mega-kernel on TPU (ops/pallas/megamul.py); same op count as
        # the w=2 joint table but 4x fewer scan/window steps
        rhs_lanes = scalar_mul.straus_double_mul_public_w4(curve, zs, Rp,
                                                           e2, Yp)
        rhs = point_tree_reduce(curve, rhs_lanes)
        lhs = scalar_mul.fixed_base_mul(curve, c_dev, secret=False)
        # projective equality (works for both Weierstrass (X:Y:Z) and
        # Edwards extended (X:Y:Z:T) — compare x/z and y/z)
        ctx = curve.fp_ctx
        ex = fp.eq_mask(fp.mul(lhs.x, rhs.z, ctx),
                        fp.mul(rhs.x, lhs.z, ctx), ctx)
        ey = fp.eq_mask(fp.mul(lhs.y, rhs.z, ctx),
                        fp.mul(rhs.y, lhs.z, ctx), ctx)
        return ex & ey

    from ..config import use_megamul, use_pallas
    key = (curve.name, n, cls.__name__, "combined_check",
           use_pallas(), use_megamul())
    if key not in _JITS:
        _JITS[key] = jax.jit(core)
    c_dev = jnp.asarray(nn.batch_to_limbs([c_int], q_ctx.k))
    return _JITS[key](zs_dev, e2_dev, pstack(Y), pstack(R), c_dev)


def ecfsdsa_verify_batch(keys, msgs, sigs, hash_name="SHA256", rng=None):
    """Reference: ecfsdsa.c:842 _ecfsdsa_verify_batch. Returns one bool."""
    curve, q = keys.curve, keys.curve.q
    p = curve.fp_ctx.p_int
    alg = get_hash(hash_name)
    p_len = (curve.fp_ctx.bits + 7) // 8
    nb = (q.bit_length() + 7) // 8
    n = len(sigs)
    zs = _rand_zs(n, rng)
    rx, ry, e2, c = [], [], [], 0
    for i, (m, sg) in enumerate(zip(msgs, sigs)):
        if len(sg) != 2 * p_len + nb:
            return False
        r = sg[:2 * p_len]
        s = int.from_bytes(sg[2 * p_len:], "big")
        x_i = int.from_bytes(r[:p_len], "big")
        y_i = int.from_bytes(r[p_len:], "big")
        if not (0 < s < q and x_i < p and y_i < p):
            return False
        e = int.from_bytes(alg.hash(r + m), "big") % q
        rx.append(x_i)
        ry.append(y_i)
        e2.append(zs[i] * e % q)
        c = (c + zs[i] * s) % q
    R = curve.point_from_affine_ints(rx, ry)
    zs_dev = wcore.scalars_dev(curve.q_ctx, zs)
    e2_dev = wcore.scalars_dev(curve.q_ctx, e2)
    acc = _combined_check(curve, zs_dev, e2_dev, keys.pub, R, c)
    return bool(np.asarray(acc).all())


def bip0340_verify_batch(keys, msgs, sigs, hash_name="SHA256", rng=None):
    """Reference: bip0340.c:1027 _bip0340_verify_batch. Returns one bool."""
    from .bip0340 import tagged_hash
    from ..curves.shortw import y_from_x
    curve, q = keys.curve, keys.curve.q
    p = curve.fp_ctx.p_int
    alg = get_hash(hash_name)
    p_len = (curve.fp_ctx.bits + 7) // 8
    q_len = (q.bit_length() + 7) // 8
    n = len(sigs)
    xs_pub, ys_pub, _ = keys.pub_affine_ints()
    zs = _rand_zs(n, rng)
    rxs, ss, e2, c = [], [], [], 0
    for i, (m, sg) in enumerate(zip(msgs, sigs)):
        if len(sg) != p_len + q_len:
            return False
        r = int.from_bytes(sg[:p_len], "big")
        s = int.from_bytes(sg[p_len:], "big")
        if not (r < p and 0 < s < q):
            return False
        e = int.from_bytes(
            tagged_hash(alg, b"BIP0340/challenge", r.to_bytes(p_len, "big"),
                        xs_pub[i].to_bytes(p_len, "big"), m), "big") % q
        rxs.append(r)
        e2.append(zs[i] * e % q)
        c = (c + zs[i] * s) % q
    # lift_x: recover even-y R_i on device (batched sqrt)
    rx_dev = curve.fp_ctx.from_ints(rxs)
    ry, exists = y_from_x(curve, rx_dev)
    if not bool(np.asarray(exists).all()):
        return False
    ry_plain = nn.canonicalize_from_mont(ry, curve.fp_ctx)
    ry_ints = nn.batch_from_limbs(np.asarray(ry_plain))
    ry_even = [y if y % 2 == 0 else p - y for y in ry_ints]
    R = curve.point_from_affine_ints(rxs, ry_even)
    ys_even = [y if y % 2 == 0 else p - y for y in ys_pub]
    from .keys import pubkey_batch_from_affine_ints
    pub_even = pubkey_batch_from_affine_ints(curve, "BIP0340",
                                             list(xs_pub), ys_even)
    zs_dev = wcore.scalars_dev(curve.q_ctx, zs)
    e2_dev = wcore.scalars_dev(curve.q_ctx, e2)
    acc = _combined_check(curve, zs_dev, e2_dev, pub_even.pub, R, c)
    return bool(np.asarray(acc).all())


def eddsa_verify_batch(variant, pub_keys, msgs, sigs, context: bytes = b"",
                       rng=None):
    """Reference: eddsa.c:2580 _eddsa_verify_batch. Returns one bool."""
    from . import eddsa as ed_mod
    from ..curves import edwards as edc
    v = ed_mod.get_variant(variant)
    c_curve = edc.get_edwards_curve(v.curve_name)
    q = c_curve.q
    pre = ed_mod._dom(v, context)
    msgs_ph = [ed_mod._prehash(v, m) for m in msgs]
    n = len(sigs)
    el = v.enc_len
    ymask = (1 << v.sign_bit) - 1
    zs = _rand_zs(n, rng)
    ay, asign, ry, rsign, e2, c = [], [], [], [], [], 0
    for i in range(n):
        sig = sigs[i]
        if len(sig) != 2 * el or len(pub_keys[i]) != el:
            return False
        encR, encS = sig[:el], sig[el:]
        a_int = int.from_bytes(pub_keys[i], "little")
        r_int = int.from_bytes(encR, "little")
        s_int = int.from_bytes(encS, "little")
        if s_int >= q:
            return False
        if (a_int & ~(ymask | (1 << v.sign_bit))) or \
           (r_int & ~(ymask | (1 << v.sign_bit))):
            return False
        k = ed_mod._le_mod_q(
            ed_mod._xof(v, pre, encR, pub_keys[i], msgs_ph[i]), q)
        ay.append(a_int & ymask)
        asign.append((a_int >> v.sign_bit) & 1)
        ry.append(r_int & ymask)
        rsign.append((r_int >> v.sign_bit) & 1)
        e2.append(zs[i] * k % q)
        c = (c + zs[i] * s_int) % q
    kk = c_curve.fp_ctx.k
    A, a_ok = ed_mod.decode_core(
        c_curve, jnp.asarray(nn.batch_to_limbs(ay, kk)),
        jnp.asarray(np.array(asign, np.uint32)))
    R, r_ok = ed_mod.decode_core(
        c_curve, jnp.asarray(nn.batch_to_limbs(ry, kk)),
        jnp.asarray(np.array(rsign, np.uint32)))
    if not bool(np.asarray(a_ok & r_ok).all()):
        return False
    zs_dev = wcore.scalars_dev(c_curve.q_ctx, zs)
    e2_dev = wcore.scalars_dev(c_curve.q_ctx, e2)
    acc = _combined_check(c_curve, zs_dev, e2_dev, A, R, c)
    return bool(np.asarray(acc).all())


def unsupported_verify_batch(*a, **kw):
    """Schemes without a recoverable R register this (reference:
    sig_algs_internal.h:294-531 unsupported_verify_batch)."""
    raise NotImplementedError(
        "batch verification requires a signature scheme with a recoverable "
        "commitment point (ECFSDSA, EdDSA, BIP0340)")
