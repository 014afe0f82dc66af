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
H(prefix || M)). EdDSASignContext/EdDSAVerifyContext provide BOUNDED
memory anyway: ph variants stream the message through the prehash (the
reference's only streaming mode, sig_algs_internal.h:455,:471); pure
variants use an explicit two-pass protocol (stream M, second_pass(),
stream M again) — a capability superset of the reference, which refuses
streaming for pure EdDSA outright. Pure-EdDSA verification streams in
ONE pass: R and A are known from the signature at init.
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
            if self.scheme.startswith("EDDSA") or self.scheme.lower() in (
                    "ed25519", "ed25519ctx", "ed25519ph", "ed448",
                    "ed448ph"):
                raise TypeError(
                    "EdDSA streams through EdDSASignContext (bounded-"
                    "memory: one pass for ph variants, two-pass protocol "
                    "for pure variants)")
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


def _ph_state(v):
    """Fresh streaming prehash state for a ph variant."""
    if v.hash_name == "SHAKE256":
        from ..hash.sha3 import _Shake256
        return _Shake256(outlen=64)       # Ed448ph: PH(M)=SHAKE256(M,64)
    return get_hash("SHA512").new()


class EdDSASignContext:
    """Bounded-memory streaming EdDSA signing (RFC 8032).

    ph variants (ed25519ph / ed448ph) stream in ONE pass — the message
    only flows through the 64-byte prehash:

        ctx = EdDSASignContext(keys); ctx.update(...); sigs = ctx.finalize()

    Pure variants (ed25519 / ed25519ctx / ed448) derive the nonce from
    H(dom || prefix || M) and the challenge from H(dom || R || A || M),
    so two passes over M are unavoidable without buffering. The two-pass
    protocol keeps memory O(hash state) per lane:

        ctx = EdDSASignContext(keys)
        ctx.update(chunks) ...        # pass 1 (nonce hash)
        ctx.second_pass()             # R = rB on device
        ctx.update(chunks) ...        # pass 2: SAME bytes (challenge hash)
        sigs = ctx.finalize()

    The caller must stream identical message bytes in both passes (chunk
    boundaries may differ); a per-lane length mismatch raises. The
    reference refuses streaming for pure EdDSA (sig_algs_internal.h:455)
    — this protocol is a capability superset with the same wire output
    as the one-shot eddsa.sign_batch.
    """

    def __init__(self, keys, variant: str | None = None,
                 context: bytes = b""):
        from . import eddsa
        self.keys = keys
        self.v = (eddsa.get_variant(variant) if variant
                  else keys.variant_family)
        eddsa.check_context_rules(self.v, context)
        self._pre = eddsa._dom(self.v, context)
        self.n = keys.n
        self._finalized = False
        self._pass = 1
        self._counts = [0] * self.n
        if self.v.phflag:
            self._states = [_ph_state(self.v) for _ in range(self.n)]
        else:
            alg = get_hash(self.v.hash_name)
            self._states = []
            for i in range(self.n):
                st = alg.new()
                st.update(self._pre + keys._prefix[i])
                self._states.append(st)

    def update(self, chunks):
        if self._finalized:
            raise RuntimeError("context already finalized")
        if isinstance(chunks, (bytes, bytearray)):
            chunks = [bytes(chunks)] * self.n
        if len(chunks) != self.n:
            raise ValueError("need one chunk per lane")
        for i, (st, ch) in enumerate(zip(self._states, chunks)):
            st.update(ch)
            self._counts[i] += len(ch)

    def second_pass(self):
        """Pure variants only: finish the nonce hash, compute R = rB on
        device, and re-seed the challenge hash — then stream the same
        message again."""
        if self._finalized or self._pass != 1:
            raise RuntimeError("second_pass: wrong context state")
        if self.v.phflag:
            raise RuntimeError("ph variants stream in one pass")
        from . import eddsa
        keys, v, q = self.keys, self.v, self.keys.curve.q
        rs = [eddsa._le_mod_q(st.digest(), q) for st in self._states]
        self._r_limbs, self._enc_R, _ = eddsa.r_points(keys, v, rs)
        alg = get_hash(v.hash_name)
        self._states = []
        for i in range(self.n):
            st = alg.new()
            st.update(self._pre + self._enc_R[i] + keys.pub_bytes[i])
            self._states.append(st)
        self._pass = 2
        self._pass1_counts, self._counts = self._counts, [0] * self.n

    def finalize(self) -> list[bytes]:
        if self._finalized:
            raise RuntimeError("context already finalized")
        from . import eddsa
        keys, v, q = self.keys, self.v, self.keys.curve.q
        self._finalized = True
        try:
            if v.phflag:
                phs = [st.digest() for st in self._states]
                alg = get_hash(v.hash_name)
                rs = [eddsa._le_mod_q(d, q) for d in common.batch_digests(
                    alg, [self._pre + keys._prefix[i] + phs[i]
                          for i in range(self.n)])]
                r_limbs, enc_R, _ = eddsa.r_points(keys, v, rs)
                ks = [eddsa._le_mod_q(d, q) for d in common.batch_digests(
                    alg, [self._pre + enc_R[i] + keys.pub_bytes[i] + phs[i]
                          for i in range(self.n)])]
                return eddsa.assemble_sigs(keys, v, r_limbs, enc_R, ks)
            if self._pass != 2:
                raise RuntimeError(
                    "pure EdDSA is two-pass: call second_pass(), stream "
                    "the message again, then finalize()")
            if self._counts != self._pass1_counts:
                raise ValueError(
                    "pass-2 message length differs from pass 1")
            ks = [eddsa._le_mod_q(st.digest(), q) for st in self._states]
            return eddsa.assemble_sigs(keys, v, self._r_limbs,
                                       self._enc_R, ks)
        finally:
            for attr in ("_states", "_r_limbs", "_enc_R"):
                if hasattr(self, attr):
                    setattr(self, attr, None)


class EdDSAVerifyContext:
    """Streaming EdDSA verification — ONE pass, bounded memory, for ALL
    variants: R and A are parsed from the signature at init, so the
    challenge hash H(dom || R || A || ...) absorbs its prefix up front
    and the message streams straight through it (ph variants stream
    through the prehash instead)."""

    def __init__(self, pub_keys: list[bytes], sigs: list[bytes],
                 variant: str, context: bytes = b""):
        from . import eddsa
        from ..curves import edwards as edw
        self.v = eddsa.get_variant(variant)
        eddsa.check_context_rules(self.v, context)
        self.c = edw.get_edwards_curve(self.v.curve_name)
        self._pre = eddsa._dom(self.v, context)
        self.n = len(sigs)
        self._parsed = eddsa.parse_verify_inputs(self.c, self.v,
                                                 pub_keys, sigs)
        self._finalized = False
        if self.v.phflag:
            self._states = [_ph_state(self.v) for _ in range(self.n)]
        else:
            alg = get_hash(self.v.hash_name)
            self._states = []
            for i in range(self.n):
                st = alg.new()
                st.update(self._pre + self._parsed["enc_R"][i]
                          + self._parsed["pubs"][i])
                self._states.append(st)

    def update(self, chunks):
        if self._finalized:
            raise RuntimeError("context already finalized")
        if isinstance(chunks, (bytes, bytearray)):
            chunks = [bytes(chunks)] * self.n
        if len(chunks) != self.n:
            raise ValueError("need one chunk per lane")
        for st, ch in zip(self._states, chunks):
            st.update(ch)

    def finalize(self) -> np.ndarray:
        if self._finalized:
            raise RuntimeError("context already finalized")
        from . import eddsa
        self._finalized = True
        try:
            q = self.c.q
            if self.v.phflag:
                phs = [st.digest() for st in self._states]
                alg = get_hash(self.v.hash_name)
                k_l = [eddsa._le_mod_q(d, q)
                       for d in common.batch_digests(
                           alg, [self._pre + self._parsed["enc_R"][i]
                                 + self._parsed["pubs"][i] + phs[i]
                                 for i in range(self.n)])]
            else:
                k_l = [eddsa._le_mod_q(st.digest(), q)
                       for st in self._states]
            return eddsa.verify_with_challenges(self.c, self._parsed, k_l)
        finally:
            self._states = None
            self._parsed = None


class VerifyContext:
    """Batched streaming verification context — true IUF for every
    scheme (reference: ec_verify_init/update/finalize, sig_algs.c:294+).
    The signature is parsed at init; the message then streams through
    the scheme's hash state only (O(hash state) memory per lane);
    finalize completes the digest-level check on device:

      - hash-then-sign (ECDSA/DECDSA/ECGDSA/ECRDSA/BIGN/DBIGN): plain H(m)
      - prefix-seeded: ECKCDSA (z), SM2 (ZA), ECFSDSA (r from the sig),
        BIP0340 (H(tag)||H(tag)||Rx||Px) — prefix absorbed at init
      - commitment-compare (ECSDSA/ECOSDSA): W' = sG - rY is computed at
        init from the signature, H(W'x [||W'y] || m) streams, finalize
        compares the digest against r.

    EdDSA streams through EdDSAVerifyContext."""

    def __init__(self, keys: KeyBatch, scheme: str, sigs, hash_name="SHA256",
                 adata=None):
        self.keys = keys
        self.scheme = scheme.upper()
        self.sigs = list(sigs)
        self.hash_name = hash_name
        self.adata = adata
        self.n = keys.n
        self._finalized = False
        alg = get_hash(hash_name)
        curve, q = keys.curve, keys.curve.q
        seeds = [b""] * self.n
        if self.scheme == "ECKCDSA":
            from . import eckcdsa
            seeds = eckcdsa.z_blocks(keys, alg)
        elif self.scheme == "SM2":
            from .sm2 import compute_za, DEFAULT_ID
            xs, ys, _ = keys.pub_affine_ints()
            ident = adata if adata is not None else DEFAULT_ID
            seeds = [compute_za(curve, alg, xs[i], ys[i], ident)
                     for i in range(self.n)]
        elif self.scheme == "ECFSDSA":
            from . import ecfsdsa
            seeds = [ecfsdsa.r_prefix(curve, sg, q) for sg in self.sigs]
        elif self.scheme == "BIP0340":
            from . import bip0340
            xs, _, _ = keys.pub_affine_ints()
            seeds = [bip0340.challenge_prefix(curve, alg, self.sigs[i],
                                              xs[i])
                     for i in range(self.n)]
        elif self.scheme in ("ECSDSA", "ECOSDSA"):
            # commitment recomputed from the signature at init:
            # W' = sG + (-r mod q)Y
            from .ecsdsa import _commit_buf
            optimized = self.scheme == "ECOSDSA"
            hsize, nb = alg.digest_size, (q.bit_length() + 7) // 8
            us, vs, pre_ok, r_bufs = [], [], [], []
            for sg in self.sigs:
                ok = len(sg) == hsize + nb
                r = sg[:hsize] if ok else b"\x00" * hsize
                s = int.from_bytes(sg[hsize:], "big") if ok else 0
                ok = ok and 0 < s < q and int.from_bytes(r, "big") % q != 0
                us.append(s)
                vs.append((-(int.from_bytes(r, "big") % q)) % q)
                r_bufs.append(r)
                pre_ok.append(ok)
            u = wcore.scalars_dev(curve.q_ctx, us)
            v = wcore.scalars_dev(curve.q_ctx, vs)
            wx, wy, inf = wcore.straus_affine(curve, u, v, keys.pub)
            wx_i, wy_i = wcore.scalars_host(wx), wcore.scalars_host(wy)
            self._r_bufs = r_bufs
            self._pre_ok = pre_ok
            self._inf = np.asarray(inf)
            seeds = [_commit_buf(curve, wx_i[i], wy_i[i], b"", optimized)
                     for i in range(self.n)]
        self._states = []
        for sd in seeds:
            st = alg.new()
            st.update(sd)
            self._states.append(st)

    def update(self, chunks):
        if self._finalized:
            raise RuntimeError("context already finalized")
        if isinstance(chunks, (bytes, bytearray)):
            chunks = [bytes(chunks)] * self.n
        if len(chunks) != self.n:
            raise ValueError("need one chunk per lane")
        for st, ch in zip(self._states, chunks):
            st.update(ch)

    _DIGEST_VERIFY = {
        "ECDSA": "ecdsa", "DECDSA": "ecdsa", "ECGDSA": "ecgdsa",
        "ECRDSA": "ecrdsa", "BIGN": "bign", "DBIGN": "bign",
        "ECKCDSA": "eckcdsa", "SM2": "sm2", "ECFSDSA": "ecfsdsa",
        "BIP0340": "bip0340",
    }

    def finalize(self):
        """-> accept mask. Completes the scheme's digest-level check on
        device. Invalidates the context, matching the sign side."""
        if self._finalized:
            raise RuntimeError("context already finalized")
        self._finalized = True
        try:
            digs = [st.digest() for st in self._states]
            if self.scheme in ("ECSDSA", "ECOSDSA"):
                out = [self._pre_ok[i] and not self._inf[i]
                       and digs[i] == self._r_bufs[i]
                       for i in range(self.n)]
                return np.array(out)
            mod_name = self._DIGEST_VERIFY.get(self.scheme)
            if mod_name is None:
                raise NotImplementedError(self.scheme)
            import importlib
            mod = importlib.import_module(f".{mod_name}", __package__)
            kw = {"adata": self.adata} if self.adata is not None else {}
            return mod.verify_digests_batch(self.keys, digs, self.sigs,
                                            self.hash_name, **kw)
        finally:
            self._states = None
            for attr in ("_r_bufs", "_pre_ok", "_inf"):
                if hasattr(self, attr):
                    setattr(self, attr, None)
