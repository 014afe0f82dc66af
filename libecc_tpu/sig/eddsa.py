"""EdDSA (RFC 8032): Ed25519 / Ed25519ctx / Ed25519ph (+ Ed448 family once
its curve constants land).

Reference: src/sig/eddsa.c (2932 LoC) — which transports everything onto
short-Weierstrass via isogenies; here the curve math is native twisted
Edwards extended coordinates (see curves/edwards.py docstring for why).

Split of labor: the sequential, byte-oriented derivations (SHA-512 of
prefix||M, dom2 framing, little-endian scalar decoding) run on host per
message; all group arithmetic (R = rB ladder, point decompression via
batched sqrt, the SB = R + kA verification equation) runs as batched
device kernels. Verification never inverts: it compares cross-multiplied
projective coordinates.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..fp import field as fp
from ..curves import edwards as ed
from ..curves.edwards import EdwardsCurve, ExtPoint
from ..curves import scalar_mul
from ..hash.registry import get_hash
from . import common


# ---------------------------------------------------------------------------
# Scalar / encoding helpers (host)
# ---------------------------------------------------------------------------

def _clamp25519(h32: bytes) -> int:
    a = bytearray(h32)
    a[0] &= 248
    a[31] &= 127
    a[31] |= 64
    return int.from_bytes(bytes(a), "little")


def _dom2(f: int, context: bytes) -> bytes:
    if f == 0 and not context:
        return b""
    return (b"SigEd25519 no Ed25519 collisions" + bytes([f])
            + bytes([len(context)]) + context)


def _le_mod_q(b: bytes, q: int) -> int:
    return int.from_bytes(b, "little") % q


# ---------------------------------------------------------------------------
# Device cores
# ---------------------------------------------------------------------------

def encode_core(c: EdwardsCurve, P: ExtPoint):
    """Batched point encode: -> (y plain canonical limbs, sign bit of x)."""
    x, y = ed.to_affine_plain(c, P)
    return y, (x[0] & 1)


def decode_core(c: EdwardsCurve, y_limbs, sign):
    """Batched point decode from (y, sign): x = sqrt((y^2-1)/(d y^2 + 1)).
    y_limbs: canonical plain limbs; sign: uint32[batch] in {0,1}.
    Returns (point, ok_mask). Reference: eddsa.c point decode :330-568."""
    ctx = c.fp_ctx
    p_arr = jnp.asarray(nn.to_limbs(ctx.p_int, ctx.k)).reshape(
        (ctx.k,) + (1,) * (y_limbs.ndim - 1))
    y_ok = nn.lt_mask(y_limbs, p_arr)
    ym = nn.to_mont(y_limbs, ctx)
    one = ctx.one(like=ym)
    Kd = ctx.const(c.d, like=ym)
    Ka_inv = ctx.const(pow(c.a, -1, ctx.p_int), like=ym)
    y2 = fp.sqr(ym, ctx)
    # a x^2 = (1 - y^2)/(d y^2 - 1)  =>  x^2 = (y^2-1) / (d y^2 - a)... use
    # standard: x^2 = (y^2 - 1) / (d y^2 - a)  (from a x^2 + y^2 = 1 + d x^2 y^2)
    num = fp.sub(y2, one, ctx)
    den = fp.sub(fp.mul(Kd, y2, ctx), ctx.const(c.a, like=ym), ctx)
    x2 = fp.mul(num, fp.inv(den, ctx), ctx)
    x, has_root = fp.sqrt(x2, ctx)
    x_plain = nn.canonicalize_from_mont(x, ctx)
    x_sign = x_plain[0] & 1
    # if sign mismatch, negate; x == 0 with sign=1 is invalid
    xneg = fp.neg(x, ctx)
    need_neg = (x_sign != sign.astype(jnp.uint32))
    x = fp.select(need_neg, xneg, x)
    x_is_zero = nn.is_zero_mask(x_plain)
    ok = y_ok & has_root & ~(x_is_zero & (sign.astype(jnp.uint32) == 1))
    t = fp.mul(x, ym, ctx)
    z = ctx.one(like=ym)
    return ExtPoint(x, ym, z, t), ok


def sign_mul_core(c: EdwardsCurve, r):
    """R = r*B (fixed-schedule ladder; r derived from secret material).
    nbits covers the full clamped-scalar range (bit p_bits-1 may be set for
    RFC 8032 clamped secrets, which exceed q)."""
    n = r.shape[-1]
    B = c.generator(batch_shape=(n,))
    R = scalar_mul.ladder_mul(c, r, B, nbits=c.fp_ctx.bits)
    return encode_core(c, R)


def s_core(c: EdwardsCurve, r, k, s):
    """S = (r + k*s) mod q, canonical."""
    q_ctx = c.q_ctx
    return common.q_add(r, common.q_mul(k, s, q_ctx), q_ctx)


def verify_core(c: EdwardsCurve, ay, asign, ry, rsign, S, k):
    """Batched verify: SB == R + kA  <=>  SB + k(-A) == R (cross-multiplied
    projective equality — no inversions). Inputs: encoded A and R (y limbs +
    sign), S and k canonical scalars."""
    ctx = c.fp_ctx
    q_ctx = c.q_ctx
    A, a_ok = decode_core(c, ay, asign)
    R, r_ok = decode_core(c, ry, rsign)
    q_arr = jnp.asarray(nn.to_limbs(c.q, q_ctx.k)).reshape(
        (q_ctx.k,) + (1,) * (S.ndim - 1))
    s_ok = nn.lt_mask(S, q_arr)
    negA = ed.point_neg(c, A)
    n = S.shape[-1]
    B = c.generator(batch_shape=(n,))
    W = scalar_mul.straus_double_mul_public(c, S, B, k, negA)
    # W == R projectively: X_W Z_R == X_R Z_W and Y_W Z_R == Y_R Z_W
    xw_zr = fp.mul(W.x, R.z, ctx)
    xr_zw = fp.mul(R.x, W.z, ctx)
    yw_zr = fp.mul(W.y, R.z, ctx)
    yr_zw = fp.mul(R.y, W.z, ctx)
    eqm = fp.eq_mask(xw_zr, xr_zw, ctx) & fp.eq_mask(yw_zr, yr_zw, ctx)
    return a_ok & r_ok & s_ok & eqm


# ---------------------------------------------------------------------------
# Host API: key batches and sign/verify (Ed25519 family)
# ---------------------------------------------------------------------------

class EdDSAKeyBatch:
    """N Ed25519 keys. Secrets are 32-byte seeds (hash-expanded per RFC
    8032 — reference: eddsa key derivation, eddsa.c:570-785)."""

    def __init__(self, curve: EdwardsCurve, seeds: list[bytes],
                 hash_name="SHA512"):
        self.curve = curve
        self.n = len(seeds)
        self.seeds = seeds
        alg = get_hash(hash_name)
        self._s = []
        self._prefix = []
        for sd in seeds:
            if len(sd) != 32:
                raise ValueError("ed25519 seed must be 32 bytes")
            h = alg.hash(sd)
            self._s.append(_clamp25519(h[:32]))
            self._prefix.append(h[32:])
        s_limbs = jnp.asarray(nn.batch_to_limbs(
            [s % curve.q for s in self._s], curve.q_ctx.k))
        # NOTE: A = s*B uses the UNREDUCED clamped s (s may exceed q);
        # ladder over 256 bits of the full value.
        s_full = jnp.asarray(nn.batch_to_limbs(self._s, curve.q_ctx.k))
        B = curve.generator(batch_shape=(self.n,))
        self._jit_pub = _cached_jit(
            (curve.name, "pub"),
            lambda sf: _pub_core(curve, sf))
        ay, asign = self._jit_pub(s_full)
        self.s_mod_q = s_limbs
        self.pub_y = ay
        self.pub_sign = asign
        ys = nn.batch_from_limbs(np.asarray(ay))
        sg = np.asarray(asign)
        self.pub_bytes = [
            (y | (int(sg[i]) << 255)).to_bytes(32, "little")
            for i, y in enumerate(ys)]


def _pub_core(curve, s_full):
    return sign_mul_core(curve, s_full)


_JITS: dict = {}


def _cached_jit(key, fn):
    if key not in _JITS:
        _JITS[key] = jax.jit(fn)
    return _JITS[key]


def sign_batch(keys: EdDSAKeyBatch, msgs: list[bytes], variant="ed25519",
               context: bytes = b"") -> list[bytes]:
    """Batched Ed25519[ctx|ph] signing. Returns 64-byte signatures.
    Reference: eddsa.c sign :1221-1553."""
    c = keys.curve
    q = c.q
    alg = get_hash("SHA512")
    f, pre = _variant_params(variant, context)
    msgs_ph = [alg.hash(m) if variant == "ed25519ph" else m for m in msgs]
    rs = []
    for i, m in enumerate(msgs_ph):
        r = _le_mod_q(alg.hash(pre + keys._prefix[i] + m), q)
        rs.append(r)
    r_limbs = jnp.asarray(nn.batch_to_limbs(rs, c.q_ctx.k))
    jit_r = _cached_jit((c.name, "signR"), lambda r: sign_mul_core(c, r))
    ry, rsign = jit_r(r_limbs)
    ry_ints = nn.batch_from_limbs(np.asarray(ry))
    rsign_np = np.asarray(rsign)
    enc_R = [(y | (int(rsign_np[i]) << 255)).to_bytes(32, "little")
             for i, y in enumerate(ry_ints)]
    ks = []
    for i, m in enumerate(msgs_ph):
        k = _le_mod_q(alg.hash(pre + enc_R[i] + keys.pub_bytes[i] + m), q)
        ks.append(k)
    k_limbs = jnp.asarray(nn.batch_to_limbs(ks, c.q_ctx.k))
    jit_s = _cached_jit((c.name, "signS"),
                        lambda r, k, s: s_core(c, r, k, s))
    S = jit_s(r_limbs, k_limbs, keys.s_mod_q)
    s_ints = nn.batch_from_limbs(np.asarray(S))
    return [enc_R[i] + s_ints[i].to_bytes(32, "little")
            for i in range(keys.n)]


def _variant_params(variant, context):
    v = variant.lower()
    if v == "ed25519":
        if context:
            raise ValueError("plain ed25519 takes no context")
        return 0, b""
    if v == "ed25519ctx":
        if not context:
            raise ValueError("ed25519ctx requires context")
        return 0, _dom2(0, context)
    if v == "ed25519ph":
        return 1, _dom2(1, context)
    raise ValueError(f"unknown variant {variant}")


def verify_batch(curve: EdwardsCurve, pub_keys: list[bytes],
                 msgs: list[bytes], sigs: list[bytes], variant="ed25519",
                 context: bytes = b"") -> np.ndarray:
    """Batched Ed25519[ctx|ph] verification -> accept mask.
    Reference: eddsa.c verify :1912-2277."""
    c = curve
    alg = get_hash("SHA512")
    f, pre = _variant_params(variant, context)
    msgs_ph = [alg.hash(m) if variant == "ed25519ph" else m for m in msgs]
    n = len(sigs)
    ay, asign, ry, rsign, S_l, k_l, pre_ok = [], [], [], [], [], [], []
    for i in range(n):
        sig = sigs[i]
        ok = len(sig) == 64 and len(pub_keys[i]) == 32
        encR, encS = sig[:32], sig[32:]
        a_int = int.from_bytes(pub_keys[i], "little")
        r_int = int.from_bytes(encR, "little")
        s_int = int.from_bytes(encS, "little")
        ay.append((a_int & ((1 << 255) - 1)))
        asign.append(a_int >> 255)
        ry.append(r_int & ((1 << 255) - 1))
        rsign.append(r_int >> 255)
        S_l.append(s_int % (1 << (c.q_ctx.k * nn.LIMB_BITS)))
        k = _le_mod_q(alg.hash(pre + encR + pub_keys[i] + msgs_ph[i]), c.q)
        k_l.append(k)
        pre_ok.append(ok and s_int < (1 << 256))
    kk = c.fp_ctx.k
    args = (
        jnp.asarray(nn.batch_to_limbs(ay, kk)),
        jnp.asarray(np.array(asign, np.uint32)),
        jnp.asarray(nn.batch_to_limbs(ry, kk)),
        jnp.asarray(np.array(rsign, np.uint32)),
        jnp.asarray(nn.batch_to_limbs(S_l, c.q_ctx.k)),
        jnp.asarray(nn.batch_to_limbs(k_l, c.q_ctx.k)),
    )
    jit_v = _cached_jit((c.name, "verify"),
                        lambda *a: verify_core(c, *a))
    acc = np.asarray(jit_v(*args))
    return acc & np.array(pre_ok)
