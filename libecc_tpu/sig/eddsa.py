"""EdDSA (RFC 8032): Ed25519 / Ed25519ctx / Ed25519ph and
Ed448 / Ed448ph — batched TPU implementation.

Reference: src/sig/eddsa.c (2932 LoC) — which transports everything onto
short-Weierstrass via isogenies; here the curve math is native twisted
Edwards extended coordinates (see curves/edwards.py docstring for why).
The edwards448 parameters are the RFC 8032 ones (the reference reaches
the same wire format through a 4-isogeny + scaling, eddsa.c:330-568).

Split of labor: the sequential, byte-oriented derivations (hashing of
prefix||M, dom2/dom4 framing, little-endian scalar decoding) run on host
per message; all group arithmetic (R = rB ladder, point decompression via
batched sqrt, the SB = R + kA verification equation) runs as batched
device kernels. Verification never inverts: it compares cross-multiplied
projective coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..fp import field as fp
from ..curves import edwards as ed
from ..curves.edwards import EdwardsCurve, ExtPoint, register_edwards
from ..curves import scalar_mul
from ..hash.registry import get_hash
from . import common


# ---------------------------------------------------------------------------
# Variant table (reference: the EDDSA25519/25519CTX/25519PH/448/448PH
# registry entries, lib_ecc_types.h:48-55 + eddsa.c dispatch)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Variant:
    name: str
    curve_name: str
    hash_name: str
    enc_len: int          # point/scalar wire length
    sign_bit: int         # bit index of the x-sign bit in the encoding
    seed_len: int
    phflag: int           # 0 = pure, 1 = pre-hashed
    always_dom: bool      # ed448 always frames with dom4
    dom_tag: bytes
    scalar_bits: int      # ladder schedule length for clamped secrets


VARIANTS = {
    "ed25519": Variant("ed25519", "ED25519", "SHA512", 32, 255, 32, 0,
                       False, b"SigEd25519 no Ed25519 collisions", 256),
    "ed25519ctx": Variant("ed25519ctx", "ED25519", "SHA512", 32, 255, 32, 0,
                          False, b"SigEd25519 no Ed25519 collisions", 256),
    "ed25519ph": Variant("ed25519ph", "ED25519", "SHA512", 32, 255, 32, 1,
                         False, b"SigEd25519 no Ed25519 collisions", 256),
    "ed448": Variant("ed448", "ED448", "SHAKE256", 57, 455, 57, 0,
                     True, b"SigEd448", 448),
    "ed448ph": Variant("ed448ph", "ED448", "SHAKE256", 57, 455, 57, 1,
                       True, b"SigEd448", 448),
}


def get_variant(name: str) -> Variant:
    v = VARIANTS.get(name.lower())
    if v is None:
        raise ValueError(f"unknown EdDSA variant {name!r}")
    return v


def _clamp(v: Variant, h: bytes) -> int:
    a = bytearray(h[: v.seed_len])
    if v.enc_len == 32:
        a[0] &= 248
        a[31] &= 127
        a[31] |= 64
    else:
        a[0] &= 252
        a[55] |= 128
        a[56] = 0
    return int.from_bytes(bytes(a), "little")


def _dom(v: Variant, context: bytes) -> bytes:
    """dom2/dom4 framing (RFC 8032 §2; eddsa.c dom computation)."""
    if not v.always_dom and v.phflag == 0 and not context:
        return b""
    return v.dom_tag + bytes([v.phflag]) + bytes([len(context)]) + context


def _xof(v: Variant, *chunks: bytes) -> bytes:
    alg = get_hash(v.hash_name)
    st = alg.new()
    for c in chunks:
        st.update(c)
    return st.digest()   # SHA512: 64 B; SHAKE256: 114 B (= 2*enc_len)


def _prehash(v: Variant, m: bytes) -> bytes:
    if v.phflag == 0:
        return m
    if v.hash_name == "SHAKE256":
        # Ed448ph: PH(M) = SHAKE256(M, 64)
        from ..hash.sha3 import shake256
        return shake256(m, 64)
    return get_hash("SHA512").hash(m)


def _enc_point(v: Variant, y: int, xsign: int) -> bytes:
    return (y | (int(xsign) << v.sign_bit)).to_bytes(v.enc_len, "little")


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
    """Batched point decode from (y, sign): x = sqrt((y^2-1)/(d y^2 - a)).
    y_limbs: canonical plain limbs; sign: uint32[batch] in {0,1}.
    Returns (point, ok_mask). Reference: eddsa.c point decode :330-568."""
    ctx = c.fp_ctx
    p_arr = jnp.asarray(nn.to_limbs(ctx.p_int, ctx.k)).reshape(
        (ctx.k,) + (1,) * (y_limbs.ndim - 1))
    y_ok = nn.lt_mask(y_limbs, p_arr)
    ym = nn.to_mont(y_limbs, ctx)
    one = ctx.one(like=ym)
    Kd = ctx.const(c.d, like=ym)
    y2 = fp.sqr(ym, ctx)
    num = fp.sub(y2, one, ctx)
    den = fp.sub(fp.mul(Kd, y2, ctx), ctx.const(c.a, like=ym), ctx)
    x2 = fp.mul(num, fp.inv(den, ctx), ctx)
    x, has_root = fp.sqrt(x2, ctx)
    x_plain = nn.canonicalize_from_mont(x, ctx)
    x_sign = x_plain[0] & 1
    xneg = fp.neg(x, ctx)
    need_neg = (x_sign != sign.astype(jnp.uint32))
    x = fp.select(need_neg, xneg, x)
    x_is_zero = nn.is_zero_mask(x_plain)
    ok = y_ok & has_root & ~(x_is_zero & (sign.astype(jnp.uint32) == 1))
    t = fp.mul(x, ym, ctx)
    z = ctx.one(like=ym)
    return ExtPoint(x, ym, z, t), ok


def sign_mul_core(c: EdwardsCurve, r, nbits: int):
    """R = r*B (fixed-schedule comb; r derived from secret material)."""
    R = scalar_mul.fixed_base_mul(c, r, nbits=nbits)
    return encode_core(c, R)


def sign_mul_core_blind(c: EdwardsCurve, r_wide, lam, nbits: int):
    """Blinded R = r*B: widened scalar r + b*q (prj_pt.c:1782 analog on
    the Edwards comb) + lam-randomized extended-coordinate representative
    (projective blinding — scaling (X:Y:Z:T) by lam preserves the point).
    Same VALUES as sign_mul_core."""
    R = scalar_mul.fixed_base_mul(c, r_wide, nbits=nbits, lam=lam)
    return encode_core(c, R)


def s_core(c: EdwardsCurve, r, k, s):
    """S = (r + k*s) mod q, canonical."""
    q_ctx = c.q_ctx
    return common.q_add(r, common.q_mul(k, s, q_ctx), q_ctx)


def verify_core(c: EdwardsCurve, ay, asign, ry, rsign, S, k):
    """Batched verify: SB == R + kA  <=>  SB + k(-A) == R (cross-multiplied
    projective equality — no inversions)."""
    ctx = c.fp_ctx
    q_ctx = c.q_ctx
    A, a_ok = decode_core(c, ay, asign)
    R, r_ok = decode_core(c, ry, rsign)
    q_arr = jnp.asarray(nn.to_limbs(c.q, q_ctx.k)).reshape(
        (q_ctx.k,) + (1,) * (S.ndim - 1))
    s_ok = nn.lt_mask(S, q_arr)
    negA = ed.point_neg(c, A)
    W = scalar_mul.fixed_base_double_mul_public(c, S, k, negA)
    xw_zr = fp.mul(W.x, R.z, ctx)
    xr_zw = fp.mul(R.x, W.z, ctx)
    yw_zr = fp.mul(W.y, R.z, ctx)
    yr_zw = fp.mul(R.y, W.z, ctx)
    eqm = fp.eq_mask(xw_zr, xr_zw, ctx) & fp.eq_mask(yw_zr, yr_zw, ctx)
    return a_ok & r_ok & s_ok & eqm


# ---------------------------------------------------------------------------
# Host API: key batches and sign/verify
# ---------------------------------------------------------------------------

_JITS: dict = {}


def _cached_jit(key, fn):
    # compute-path switches are trace-time decisions: key on them so a
    # runtime flip (bench fallback, test toggles) retraces (wcore.cached_jit
    # has the same rule)
    from ..config import use_megamul, use_pallas
    key = (key, use_pallas(), use_megamul())
    if key not in _JITS:
        _JITS[key] = jax.jit(fn)
    return _JITS[key]


class EdDSAKeyBatch:
    """N EdDSA keys. Secrets are seed bytes hash-expanded per RFC 8032
    (reference: eddsa key derivation, eddsa.c:570-785)."""

    def __init__(self, curve_or_variant, seeds: list[bytes],
                 hash_name=None, variant: str | None = None):
        if isinstance(curve_or_variant, str):
            v = get_variant(curve_or_variant)
        elif variant is not None:
            v = get_variant(variant)
        else:
            v = (VARIANTS["ed25519"]
                 if curve_or_variant.name == "ED25519" else VARIANTS["ed448"])
        self.variant_family = v
        curve = ed.get_edwards_curve(v.curve_name)
        self.curve = curve
        self.n = len(seeds)
        self.seeds = seeds
        self._s = []
        self._prefix = []
        for sd in seeds:
            if len(sd) != v.seed_len:
                raise ValueError(
                    f"{v.name} seed must be {v.seed_len} bytes")
            h = _xof(v, sd)
            self._s.append(_clamp(v, h))
            self._prefix.append(h[v.seed_len:])
        s_limbs = jnp.asarray(nn.batch_to_limbs(
            [s % curve.q for s in self._s], curve.q_ctx.k))
        # A = s*B uses the UNREDUCED clamped s (s may exceed q);
        # the ladder runs over the variant's full clamped-scalar range.
        s_full = jnp.asarray(nn.batch_to_limbs(self._s, curve.q_ctx.k))
        self._jit_pub = _cached_jit(
            (curve.name, "pub"),
            lambda sf: sign_mul_core(curve, sf, v.scalar_bits))
        ay, asign = self._jit_pub(s_full)
        self.s_mod_q = s_limbs
        self.pub_y = ay
        self.pub_sign = asign
        ys = nn.batch_from_limbs(np.asarray(ay))
        sg = np.asarray(asign)
        self.pub_bytes = [
            _enc_point(v, y, int(sg[i])) for i, y in enumerate(ys)]


def check_context_rules(v: Variant, context: bytes) -> None:
    if v.name == "ed25519" and context:
        raise ValueError("plain ed25519 takes no context")
    if v.name == "ed25519ctx" and not context:
        raise ValueError("ed25519ctx requires context")


def r_points(keys: EdDSAKeyBatch, v: Variant, rs: list[int],
             blinding=False):
    """R = r*B for per-lane nonce scalars -> (r limbs, encoded R, bpair).
    bpair is (b, b^-1) device scalars when blinding (eddsa.c
    USE_SIG_BLINDING: blinded rB plus the masked S finalize), else
    None."""
    c = keys.curve
    r_limbs = jnp.asarray(nn.batch_to_limbs(rs, c.q_ctx.k))
    if blinding:
        from . import wcore
        kw, b_dev, lam = wcore.blind_inputs(c, rs)
        nbits = 2 * c.q.bit_length() + 1
        jit_r = _cached_jit(
            (c.name, "signR_blind"),
            lambda kw, lam: sign_mul_core_blind(c, kw, lam, nbits))
        ry, rsign = jit_r(kw, lam)
        bpair = (b_dev, common.q_inv(b_dev, c.q_ctx))
    else:
        jit_r = _cached_jit(
            (c.name, "signR"),
            lambda r: sign_mul_core(c, r, c.q_ctx.k * nn.LIMB_BITS))
        ry, rsign = jit_r(r_limbs)
        bpair = None
    ry_ints = nn.batch_from_limbs(np.asarray(ry))
    rsign_np = np.asarray(rsign)
    enc_R = [_enc_point(v, y, int(rsign_np[i])) for i, y in enumerate(ry_ints)]
    return r_limbs, enc_R, bpair


def assemble_sigs(keys: EdDSAKeyBatch, v: Variant, r_limbs, enc_R,
                  ks: list[int], bpair=None) -> list[bytes]:
    """S = (r + k*s) mod q on device; wire signatures R || S.
    With bpair=(b, b^-1): masked finalize S = b^-1*(b*r + (b*k)*s) —
    identical bytes, secrets never combined unmasked."""
    c = keys.curve
    k_limbs = jnp.asarray(nn.batch_to_limbs(ks, c.q_ctx.k))
    if bpair is None:
        jit_s = _cached_jit((c.name, "signS"),
                            lambda r, k, s: s_core(c, r, k, s))
        S = jit_s(r_limbs, k_limbs, keys.s_mod_q)
    else:
        q_ctx = c.q_ctx

        def s_blind(r, k, s, b, binv):
            br = common.q_mul(b, r, q_ctx)
            bks = common.q_mul(common.q_mul(b, k, q_ctx), s, q_ctx)
            return common.q_mul(binv, common.q_add(br, bks, q_ctx), q_ctx)

        jit_s = _cached_jit((c.name, "signS_blind"), s_blind)
        S = jit_s(r_limbs, k_limbs, keys.s_mod_q, *bpair)
    s_ints = nn.batch_from_limbs(np.asarray(S))
    return [enc_R[i] + s_ints[i].to_bytes(v.enc_len, "little")
            for i in range(keys.n)]


def sign_batch(keys: EdDSAKeyBatch, msgs: list[bytes], variant=None,
               context: bytes = b"", blinding=False) -> list[bytes]:
    """Batched EdDSA signing. Returns 2*enc_len-byte signatures.
    Reference: eddsa.c sign :1221-1553; blinding=True applies the
    USE_SIG_BLINDING countermeasures (blinded rB + masked S)."""
    v = get_variant(variant) if variant else keys.variant_family
    q = keys.curve.q
    check_context_rules(v, context)
    pre = _dom(v, context)
    msgs_ph = [_prehash(v, m) for m in msgs]
    alg = get_hash(v.hash_name)
    rs = [_le_mod_q(d, q) for d in common.batch_digests(
        alg, [pre + keys._prefix[i] + m for i, m in enumerate(msgs_ph)])]
    r_limbs, enc_R, bpair = r_points(keys, v, rs, blinding=blinding)
    ks = [_le_mod_q(d, q) for d in common.batch_digests(
        alg, [pre + enc_R[i] + keys.pub_bytes[i] + m
              for i, m in enumerate(msgs_ph)])]
    return assemble_sigs(keys, v, r_limbs, enc_R, ks, bpair=bpair)


def verify_batch(curve_or_variant, pub_keys: list[bytes],
                 msgs: list[bytes], sigs: list[bytes], variant=None,
                 context: bytes = b"") -> np.ndarray:
    """Batched EdDSA verification -> accept mask.
    Reference: eddsa.c verify :1912-2277."""
    if isinstance(curve_or_variant, str) and variant is None:
        variant = curve_or_variant
        curve_or_variant = None
    if variant is not None:
        v = get_variant(variant)
    elif isinstance(curve_or_variant, EdwardsCurve):
        v = (VARIANTS["ed25519"] if curve_or_variant.name == "ED25519"
             else VARIANTS["ed448"])
    else:
        raise ValueError("pass a variant name or curve")
    c = ed.get_edwards_curve(v.curve_name)
    q = c.q
    check_context_rules(v, context)
    pre = _dom(v, context)
    msgs_ph = [_prehash(v, m) for m in msgs]
    parsed = parse_verify_inputs(c, v, pub_keys, sigs)
    bufs = [pre + parsed["enc_R"][i] + parsed["pubs"][i] + msgs_ph[i]
            for i in range(len(sigs))]
    # challenge hashes in one batch (device kernel when uniform)
    k_l = [_le_mod_q(d, q)
           for d in common.batch_digests(get_hash(v.hash_name), bufs)]
    return verify_with_challenges(c, parsed, k_l)


def parse_verify_inputs(c: EdwardsCurve, v: Variant, pub_keys, sigs):
    """Decode wire signatures + public keys into batched verify inputs
    (signature parsing happens at init in the reference's verify_init,
    eddsa.c:1912+). Returns a dict consumed by verify_with_challenges."""
    n = len(sigs)
    el = v.enc_len
    ymask = (1 << v.sign_bit) - 1
    out = {"ay": [], "asign": [], "ry": [], "rsign": [], "S_l": [],
           "enc_R": [], "pubs": [], "pre_ok": []}
    for i in range(n):
        sig = sigs[i]
        ok = len(sig) == 2 * el and len(pub_keys[i]) == el
        if not ok:
            sig = b"\x00" * (2 * el)
        encR, encS = sig[:el], sig[el:]
        a_int = int.from_bytes(pub_keys[i].ljust(el, b"\x00"), "little")
        r_int = int.from_bytes(encR, "little")
        s_int = int.from_bytes(encS, "little")
        # non-canonical high bits (e.g. ed448 byte 56 ≠ sign only) invalidate
        ok = ok and (a_int & ~(ymask | (1 << v.sign_bit))) == 0 \
            and (r_int & ~(ymask | (1 << v.sign_bit))) == 0
        out["ay"].append(a_int & ymask)
        out["asign"].append((a_int >> v.sign_bit) & 1)
        out["ry"].append(r_int & ymask)
        out["rsign"].append((r_int >> v.sign_bit) & 1)
        out["S_l"].append(s_int % (1 << (c.q_ctx.k * nn.LIMB_BITS)))
        out["enc_R"].append(encR)
        out["pubs"].append(pub_keys[i].ljust(el, b"\x00"))
        out["pre_ok"].append(ok)
    return out


def verify_with_challenges(c: EdwardsCurve, parsed, k_l: list[int]):
    """Run the batched device verify given per-lane challenge scalars
    k = H(dom || R || A || PH(M)) mod q."""
    kk = c.fp_ctx.k
    args = (
        jnp.asarray(nn.batch_to_limbs(parsed["ay"], kk)),
        jnp.asarray(np.array(parsed["asign"], np.uint32)),
        jnp.asarray(nn.batch_to_limbs(parsed["ry"], kk)),
        jnp.asarray(np.array(parsed["rsign"], np.uint32)),
        jnp.asarray(nn.batch_to_limbs(parsed["S_l"], c.q_ctx.k)),
        jnp.asarray(nn.batch_to_limbs(k_l, c.q_ctx.k)),
    )
    jit_v = _cached_jit((c.name, "verify"),
                        lambda *a: verify_core(c, *a))
    acc = np.asarray(jit_v(*args))
    return acc & np.array(parsed["pre_ok"])
