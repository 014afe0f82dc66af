"""Shared signature-layer plumbing: hashing to scalars, nonce generation,
batched message handling.

Reference analog: the common helpers inside src/sig/sig_algs.c and
ecdsa_common.c (hash truncation :398-413, nonce generation :435).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..fp.field import FpCtx
from ..hash.registry import get_hash


def hash_msgs_host(hash_name, msgs: list[bytes]) -> np.ndarray:
    """Host-hash a list of messages -> big-endian words uint32[W, N]."""
    alg = get_hash(hash_name)
    return digests_to_words(batch_digests(alg, msgs))


_DIGEST_JITS: dict = {}


def batch_digests(alg, msgs: list[bytes]) -> list[bytes]:
    """Hash a message batch, on DEVICE when the algorithm has a batched
    kernel (one fused dispatch instead of N sequential host hashes — this
    is what makes the ECRDSA/BIGN/SM2 pipelines device-resident now that
    all 20 hashes have kernels). Batches whose messages pad to MIXED
    block counts are bucketed by block count and dispatched per bucket
    (each bucket lane-padded to a power of two to bound the number of
    traced shapes); tiny buckets fall back to host hashing."""
    n = len(msgs)
    if alg.device_fn is None or alg.pack_fn is None or n < 8:
        return [alg.hash(m) for m in msgs]
    try:
        blocks = alg.pack_fn(msgs)
    except ValueError:          # mixed block counts -> bucket per count
        return _batch_digests_bucketed(alg, msgs)
    return _dispatch_digests(alg, blocks, n)


def _dispatch_digests(alg, blocks, n: int) -> list[bytes]:
    key = alg.name
    if key not in _DIGEST_JITS:
        _DIGEST_JITS[key] = jax.jit(alg.device_fn)
    out = np.asarray(_DIGEST_JITS[key](jnp.asarray(blocks)))
    raw = out.T.astype(">u4").tobytes()
    stride = out.shape[0] * 4
    return [raw[j * stride: j * stride + alg.digest_size]
            for j in range(n)]


_NBLK_CACHE: dict = {}


def _nblk_of(alg, length: int) -> int:
    """Padded block count for a message of `length` bytes (derived from
    the algorithm's own packer so every padding rule stays in one
    place)."""
    key = (alg.name, length)
    if key not in _NBLK_CACHE:
        _NBLK_CACHE[key] = int(alg.pack_fn([b"\x00" * length]).shape[0])
    return _NBLK_CACHE[key]


def _batch_digests_bucketed(alg, msgs: list[bytes]) -> list[bytes]:
    from collections import defaultdict
    groups = defaultdict(list)
    for i, m in enumerate(msgs):
        groups[_nblk_of(alg, len(m))].append(i)
    out: list = [None] * len(msgs)
    for idxs in groups.values():
        if len(idxs) < 8:
            for i in idxs:
                out[i] = alg.hash(msgs[i])
            continue
        sub = [msgs[i] for i in idxs]
        lanes = 1 << (len(sub) - 1).bit_length()   # pow2 lane padding
        sub = sub + [sub[-1]] * (lanes - len(sub))
        digs = _dispatch_digests(alg, alg.pack_fn(sub), len(sub))
        for j, i in enumerate(idxs):
            out[i] = digs[j]
    return out


def digests_to_words(digs: list[bytes]) -> np.ndarray:
    """Raw digests -> big-endian uint32 words [W, N] (zero-pad to word)."""
    dlen = len(digs[0])
    pad = (-dlen) % 4
    w = (dlen + pad) // 4
    if pad == 0:
        arr = np.frombuffer(b"".join(digs), dtype=">u4")
        return np.ascontiguousarray(
            arr.reshape(len(digs), w).T).astype(np.uint32)
    out = np.zeros((w, len(digs)), np.uint32)
    for j, d in enumerate(digs):
        d = d + b"\x00" * pad
        out[:, j] = np.frombuffer(d, dtype=">u4")
    return out


def e_from_msgs(alg, msgs: list[bytes], q_ctx):
    """Message batch -> ECDSA-style scalar e, FUSED on device (hash kernel
    + MSB truncation + mod-q reduce in one dispatch) when the algorithm
    has a batched kernel and the batch packs to a uniform block count.
    Unlike batch_digests + digests_to_words, the digests never round-trip
    through host bytes — this is the e2e hot path for sign/verify_batch.
    Host-hash fallback otherwise; both paths are bit-identical."""
    n = len(msgs)
    if alg.device_fn is not None and alg.pack_fn is not None and n >= 8:
        try:
            blocks = alg.pack_fn(msgs)
        except ValueError:          # non-uniform block counts -> host
            blocks = None
        if blocks is not None:
            key = (alg.name, q_ctx.p_int, q_ctx.k, "msgs->e")
            if key not in _DIGEST_JITS:
                bits = alg.digest_size * 8
                dev = alg.device_fn
                _DIGEST_JITS[key] = jax.jit(
                    lambda blk: e_from_digest_bits(dev(blk), bits, q_ctx))
            return _DIGEST_JITS[key](jnp.asarray(blocks))
    words = digests_to_words(batch_digests(alg, msgs))
    return e_from_digest_bits(jnp.asarray(words), alg.digest_size * 8,
                              q_ctx)


def e_from_digest_bits(words, digest_bits: int, q_ctx: FpCtx,
                       q_bits: int | None = None):
    """ECDSA-style hash truncation: keep the leftmost min(q_bits, digest_bits)
    bits of the digest, then reduce mod q (one conditional subtract — always
    sufficient since the truncated value < 2^q_bits < 2q).

    Reference: ecdsa_common.c:398-413. Device op; returns canonical limbs.
    """
    if q_bits is None:
        q_bits = q_ctx.bits
    if digest_bits > q_bits:
        # widen so the digest's HIGH bits survive the radix conversion,
        # shift down to the leftmost q_bits, then narrow to scalar width
        k_wide = max(q_ctx.k,
                     (digest_bits + nn.LIMB_BITS - 1) // nn.LIMB_BITS)
        e = nn.be_words_to_limbs(words, words.shape[0] * 32, k_wide)
        e = nn.rshift(e, digest_bits - q_bits)
        e = e[:q_ctx.k]
    else:
        e = nn.be_words_to_limbs(words, words.shape[0] * 32, q_ctx.k)
    return nn.mod_reduce_once(e, q_ctx)


def random_scalars_mod_q(q_ctx: FpCtx, n: int, rng=None) -> np.ndarray:
    """Host RNG -> n scalars in [1, q-1], as canonical limbs uint32[Kq, n].

    Oversamples by 128 bits then reduces (the reference's nn_get_random_mod,
    src/nn/nn_rand.c:92). `rng(nbytes)->bytes` defaults to os.urandom — the
    platform RNG boundary (reference: external_deps/rand.c:76).
    """
    rng = rng or os.urandom
    nbytes = (q_ctx.bits + 128) // 8
    vals = []
    for _ in range(n):
        v = 0
        while v == 0:
            v = int.from_bytes(rng(nbytes), "big") % q_ctx.p_int
        vals.append(v)
    return nn.batch_to_limbs(vals, q_ctx.k)


def scalars_from_ints(q_ctx: FpCtx, vals) -> np.ndarray:
    return nn.batch_to_limbs([v % q_ctx.p_int for v in vals], q_ctx.k)


def x_coord_mod_q(x_canonical, p_ctx: FpCtx, q_ctx: FpCtx):
    """Canonical field x-coordinate -> x mod q (device).
    General path: Montgomery-based wide reduction (handles any p/q ratio,
    including cofactor > 1 curves). Reference: nn_mod in ecdsa_common.c:487.
    """
    # x < p < R_p; re-express in q_ctx width then reduce
    kq = q_ctx.k
    kx = x_canonical.shape[0]
    if kx < 2 * kq:
        padw = 2 * kq - kx
        x_canonical = jnp.concatenate(
            [x_canonical,
             jnp.zeros((padw,) + x_canonical.shape[1:], jnp.uint32)], 0)
    else:
        x_canonical = x_canonical[: 2 * kq]
    return nn.reduce_wide(x_canonical, q_ctx)


# -- mod-q arithmetic on canonical scalars (relaxed internally) --------------

def q_mul(a, b, q_ctx: FpCtx):
    """a*b mod q on canonical (plain-domain) scalars -> canonical."""
    am = nn.to_mont(a, q_ctx)
    r = nn.mont_mul_relaxed(am, b, q_ctx)        # a*R * b / R = a*b
    return nn.canonicalize(r, q_ctx)


def q_inv(a, q_ctx: FpCtx):
    """a^-1 mod q on canonical scalars; 0 -> 0 (callers mask separately).
    Reference: nn_modinv_fermat (nn_modinv.c:504).

    Batches of >= 16 lanes use Montgomery's batch-inversion trick as a
    lane tree: ONE Fermat ladder on the lane-product plus ~2*log2(N)
    batched multiplies, instead of a full ~2*|q|-multiply ladder over the
    whole batch. The schedule is data-independent (zero lanes are swapped
    for 1 before the tree and masked after), so the secret-input callers
    (ECDSA k^-1) keep the constant-schedule discipline."""
    if a.ndim == 2 and a.shape[-1] >= 16:
        return _q_inv_batched(a, q_ctx)
    return _q_inv_fermat(a, q_ctx)


def _q_inv_fermat(a, q_ctx: FpCtx):
    am = nn.to_mont(a, q_ctx)
    y = _mont_pow_relaxed(am, q_ctx.p_int - 2, q_ctx)
    return nn.canonicalize(nn.mont_mul_relaxed(
        y, _ones_like(y, q_ctx), q_ctx), q_ctx)


def _q_inv_batched(a, q_ctx: FpCtx):
    n = a.shape[-1]
    # guard lanes whose VALUE is ≡ 0 (mod q) — not just literally-zero
    # limbs: callers feed unreduced scalars (e.g. a hostile signature
    # with s = q), and one such lane would zero the whole product tree,
    # corrupting EVERY other lane's inverse (batch-poisoning; found by
    # the Wycheproof s=q class). Swapped for 1 pre-tree, masked to the
    # Fermat convention (0 -> 0) post-tree.
    am = nn.to_mont(a, q_ctx)
    zmask = nn.is_zero_mask(nn.canonicalize(am, q_ctx))
    one_m = jnp.broadcast_to(
        jnp.asarray(nn.to_limbs(q_ctx.r_int, q_ctx.k)).reshape(q_ctx.k, 1),
        a.shape)
    am = jnp.where(zmask[None, :], one_m, am)
    # pad lanes to a power of two with Montgomery ones
    n2 = 1 << (n - 1).bit_length()
    if n2 != n:
        am = jnp.concatenate([am, one_m[:, : n2 - n]], axis=-1)
    # up-sweep: pairwise lane products
    levels = []
    cur = am
    while cur.shape[-1] > 1:
        even, odd = cur[..., 0::2], cur[..., 1::2]
        levels.append((even, odd))
        cur = nn.mont_mul_relaxed(even, odd, q_ctx)
    # invert the single total product (Fermat, width 1)
    inv = _mont_pow_relaxed(cur, q_ctx.p_int - 2, q_ctx)
    # down-sweep: child inverse = parent inverse * sibling
    for even, odd in reversed(levels):
        ie = nn.mont_mul_relaxed(inv, odd, q_ctx)
        io = nn.mont_mul_relaxed(inv, even, q_ctx)
        inv = jnp.stack([ie, io], axis=-1).reshape(ie.shape[:-1]
                                                   + (2 * ie.shape[-1],))
    inv = inv[..., :n]
    out = nn.canonicalize(nn.mont_mul_relaxed(
        inv, _ones_like(inv, q_ctx), q_ctx), q_ctx)
    return jnp.where(zmask[None, :], jnp.zeros_like(out), out)


def _ones_like(a, ctx):
    one = jnp.asarray(nn.to_limbs(1, ctx.k))
    return jnp.broadcast_to(one.reshape((ctx.k,) + (1,) * (a.ndim - 1)), a.shape)


def _mont_pow_relaxed(a_mont, e: int, ctx: FpCtx):
    """x^e keeping the Montgomery factor: in = xR, out = (x^e)R."""
    assert e >= 1
    nbits = e.bit_length()
    bits = np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                    dtype=np.uint32)

    def body(acc, bit):
        acc = nn.mont_mul_relaxed(acc, acc, ctx)
        acc_m = nn.mont_mul_relaxed(acc, a_mont, ctx)
        return jnp.where(bit.astype(bool), acc_m, acc), None

    acc, _ = jax.lax.scan(body, a_mont, jnp.asarray(bits[1:]))
    return acc


def q_add(a, b, q_ctx: FpCtx):
    return nn.mod_add(a, b, q_ctx)


def q_sub(a, b, q_ctx: FpCtx):
    return nn.mod_sub(a, b, q_ctx)
