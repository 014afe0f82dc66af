"""EC keys: batched key material + generation + import/export.

Reference: src/sig/ec_key.c / ec_key.h — ec_priv_key{x}, ec_pub_key{y},
ec_key_pair_gen (ec_key.h:188), raw and structured (3-byte header)
import/export (ec_key.h:99-168). TPU-native: a KeyBatch holds N keys as
limb tensors / point batches, so key generation is one batched ladder.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..curves.shortw import ShortWCurve, PrjPoint, to_affine
from ..curves import scalar_mul
from .common import random_scalars_mod_q, scalars_from_ints


@dataclass
class KeyBatch:
    """N keys for one (curve, alg). priv: uint32[Kq, N] canonical scalars
    (None for public-only); pub: PrjPoint batch (device, Montgomery coords).
    """
    curve: ShortWCurve
    alg: str
    n: int
    priv: jnp.ndarray | None = None
    pub: PrjPoint | None = None

    def pub_affine_ints(self):
        x, y, inf = to_affine(self.curve, self.pub)
        return (self.curve.fp_ctx.to_ints(x), self.curve.fp_ctx.to_ints(y),
                np.asarray(inf))

    def priv_ints(self):
        return nn.batch_from_limbs(np.asarray(self.priv))


def generic_init_pub(curve: ShortWCurve, priv) -> PrjPoint:
    """Y = x*G via the constant-schedule fixed-base comb (reference:
    init_pubkey_from_privkey -> prj_pt_mul_blind, ecdsa_common.c:172)."""
    return scalar_mul.fixed_base_mul(curve, priv)


def keygen(curve: ShortWCurve, alg: str, n: int, rng=None,
           priv_ints=None, init_pub=None, blinding=False) -> KeyBatch:
    """Generate N keypairs. priv_ints injects fixed keys (tests/KATs) —
    the analog of the reference's test-vector rand callback injection
    (ec_self_tests_core.h:34). blinding=True computes Y = x*G with
    scalar + projective blinding (the reference always blinds keygen:
    prj_pt_mul_blind in init_pubkey_from_privkey, ecdsa_common.c:172)."""
    if priv_ints is not None:
        priv = scalars_from_ints(curve.q_ctx, priv_ints)
        n = len(priv_ints)
    else:
        priv = random_scalars_mod_q(curve.q_ctx, n, rng)
        priv_ints = nn.batch_from_limbs(np.asarray(priv))
    priv = jnp.asarray(priv)
    if blinding and init_pub is None:
        from . import wcore
        kw, _b, lam = wcore.blind_inputs(curve, priv_ints, rng=rng)
        pub = wcore.cached_jit(
            (curve.name, "keygen_blind"),
            lambda: lambda kw, lam: scalar_mul.fixed_base_mul(
                curve, kw, nbits=2 * curve.q.bit_length() + 1, lam=lam)
        )(kw, lam)
    else:
        fn = init_pub or generic_init_pub
        pub = fn(curve, priv)
    return KeyBatch(curve=curve, alg=alg, n=n, priv=priv, pub=pub)


def order_check_mask(curve: ShortWCurve, pub: PrjPoint):
    """Batched q*P == infinity check (reference: check_prj_pt_order,
    prj_pt.c:1909) — True lanes have order dividing q. One device
    windowed mult over the PUBLIC scalar q (broadcast across lanes)."""
    from ..curves.shortw import is_infinity_mask

    def make():
        qbits = curve.q.bit_length()
        kq = curve.q_ctx.k

        def f(px, py, pz):
            P = PrjPoint(px, py, pz)
            ql = jnp.asarray(nn.to_limbs(curve.q, kq)).reshape(
                (kq,) + (1,) * (px.ndim - 1))
            ql = jnp.broadcast_to(ql, (kq,) + px.shape[1:])
            qP = scalar_mul.windowed_mul_public(curve, ql, P, nbits=qbits)
            return is_infinity_mask(curve, qP)
        return f
    from .wcore import cached_jit
    return np.asarray(cached_jit((curve.name, "order_check"), make)(
        pub.x, pub.y, pub.z))


def pubkey_batch_from_affine_ints(curve: ShortWCurve, alg: str, xs, ys,
                                  validate: bool = True,
                                  check_order: bool | None = None
                                  ) -> KeyBatch:
    """Build a public-key batch; by default validates every point is on
    the curve (reference: on-curve check on point import, aff_pt.c:139 —
    accepting off-curve public keys enables invalid-curve attacks).

    check_order: run the q*P == infinity subgroup check
    (check_prj_pt_order, prj_pt.c:1909). Default (None) enables it
    exactly for h > 1 curves (WEI25519/WEI448 class), where an imported
    point can otherwise carry a small-order component; on h == 1 curves
    on-curve membership already implies order q."""
    if validate:
        p = curve.fp_ctx.p_int
        for i, (x, y) in enumerate(zip(xs, ys)):
            if not (0 <= x < p and 0 <= y < p):
                raise ValueError(f"public key {i}: coordinate out of range")
            if (y * y - (x * x * x + curve.a * x + curve.b)) % p != 0:
                raise ValueError(f"public key {i}: point not on curve")
    pub = curve.point_from_affine_ints(xs, ys)
    if check_order is None:
        check_order = validate and curve.h > 1
    if check_order:
        okm = order_check_mask(curve, pub)
        if not okm.all():
            bad = [i for i, v in enumerate(okm) if not v]
            raise ValueError(
                f"public key(s) {bad}: point not in the order-q subgroup")
    return KeyBatch(curve=curve, alg=alg, n=len(xs), priv=None, pub=pub)


# -- raw serialization (reference: ec_priv_key_export_to_buf etc.) -----------

def export_priv_raw(kb: KeyBatch) -> list[bytes]:
    nb = (kb.curve.q.bit_length() + 7) // 8
    return [int(v).to_bytes(nb, "big") for v in kb.priv_ints()]


def export_pub_raw(kb: KeyBatch) -> list[bytes]:
    """Uncompressed affine: X || Y, each p-size bytes (reference:
    ec_pub_key_export_to_buf -> prj_pt export, prj_pt.c:536)."""
    nb = (kb.curve.fp_ctx.bits + 7) // 8
    xs, ys, inf = kb.pub_affine_ints()
    return [int(x).to_bytes(nb, "big") + int(y).to_bytes(nb, "big")
            for x, y in zip(xs, ys)]


def import_pub_raw(curve: ShortWCurve, alg: str, bufs: list[bytes]) -> KeyBatch:
    nb = (curve.fp_ctx.bits + 7) // 8
    xs, ys = [], []
    for b in bufs:
        if len(b) != 2 * nb:
            raise ValueError("bad public key length")
        xs.append(int.from_bytes(b[:nb], "big"))
        ys.append(int.from_bytes(b[nb:], "big"))
    return pubkey_batch_from_affine_ints(curve, alg, xs, ys)


def export_pub_sec1(kb: KeyBatch, compressed: bool = True) -> list[bytes]:
    """SEC1 export: 0x02/0x03 || X (compressed, y-parity prefix) or
    0x04 || X || Y."""
    nb = (kb.curve.fp_ctx.bits + 7) // 8
    xs, ys, inf = kb.pub_affine_ints()
    out = []
    for x, y in zip(xs, ys):
        if compressed:
            out.append(bytes([0x02 | (int(y) & 1)])
                       + int(x).to_bytes(nb, "big"))
        else:
            out.append(b"\x04" + int(x).to_bytes(nb, "big")
                       + int(y).to_bytes(nb, "big"))
    return out


def import_pub_sec1(curve: ShortWCurve, alg: str,
                    bufs: list[bytes]) -> KeyBatch:
    """SEC1 point import: 0x04 || X || Y uncompressed, or 0x02/0x03 || X
    compressed (y parity in the prefix). The reference decompresses such
    points via aff_pt_y_from_x (aff_pt.c:102; used on the Wycheproof ECDH
    path, libecc_wycheproof.c:498 uncompress_ecc_point). Rejects points
    with no square root (x not on the curve) and, like import_pub_raw,
    validates on-curve + subgroup order (h > 1 curves)."""
    from ..curves.maps import _sqrt_p
    nb = (curve.fp_ctx.bits + 7) // 8
    p = curve.fp_ctx.p_int
    xs, ys = [], []
    for i, b in enumerate(bufs):
        if len(b) == 1 + 2 * nb and b[0] == 0x04:
            xs.append(int.from_bytes(b[1:1 + nb], "big"))
            ys.append(int.from_bytes(b[1 + nb:], "big"))
        elif len(b) == 1 + nb and b[0] in (0x02, 0x03):
            x = int.from_bytes(b[1:], "big")
            if x >= p:
                raise ValueError(f"public key {i}: x out of range")
            rhs = (pow(x, 3, p) + curve.a * x + curve.b) % p
            y = _sqrt_p(rhs, p)
            if y is None:
                raise ValueError(
                    f"public key {i}: x has no point on the curve")
            if y % 2 != (b[0] & 1):
                y = (p - y) % p
            xs.append(x)
            ys.append(y)
        else:
            raise ValueError(f"public key {i}: bad SEC1 encoding")
    return pubkey_batch_from_affine_ints(curve, alg, xs, ys)


def import_priv_raw(curve: ShortWCurve, alg: str, bufs: list[bytes],
                    init_pub=None) -> KeyBatch:
    vals = [int.from_bytes(b, "big") for b in bufs]
    return keygen(curve, alg, len(vals), priv_ints=vals, init_pub=init_pub)
