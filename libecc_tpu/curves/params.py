"""Curve parameter registry.

TPU-native analog of the reference's curve-parameter machinery
(src/curves/curves_list.h ec_maps[], src/curves/ec_params.c import_params,
src/curves/known/*.h). Parameters are plain host integers; every derived
constant (Montgomery r/r2/mpinv, Tonelli-Shanks data, ...) is computed at
context-build time — the runtime equivalent of what the reference's
expand_libecc.py precomputes offline.

`register_curve` validates the generator equation on load, so a typo in the
constants fails immediately (the analog of the reference's compile-time
consistency checks, nn_config.h:171-218).
"""

from __future__ import annotations

from functools import lru_cache

from ..fp.field import FpCtx
from .shortw import ShortWCurve

# name -> dict of raw int params
_CURVES: dict[str, dict] = {}

# aliases (lowercase, no separators) -> canonical name
_ALIASES: dict[str, str] = {}


def _canon(name: str) -> str:
    return name.replace("_", "").replace("-", "").upper()


def register_curve(name: str, p: int, a: int, b: int, gx: int, gy: int,
                   q: int, h: int = 1, aliases: tuple = (), oid: str = ""):
    """Register a short-Weierstrass curve (reference: ec_maps[] entry +
    user-curve path of expand_libecc.py). Validates gy^2 = gx^3+a gx+b."""
    a_, b_ = a % p, b % p
    if (gy * gy - (gx * gx * gx + a_ * gx + b_)) % p != 0:
        raise ValueError(f"curve {name}: generator not on curve")
    if p <= 3 or q <= 1:
        raise ValueError(f"curve {name}: bad p/q")
    _CURVES[_canon(name)] = dict(name=name, p=p, a=a_, b=b_, gx=gx, gy=gy,
                                 q=q, h=h, oid=oid)
    for al in aliases:
        _ALIASES[_canon(al)] = _canon(name)
    get_curve.cache_clear()


@lru_cache(maxsize=None)
def get_curve(name: str) -> ShortWCurve:
    """Name -> live curve object with field contexts (reference:
    import_params, src/curves/ec_params.c:24)."""
    key = _canon(name)
    key = _ALIASES.get(key, key)
    if key not in _CURVES:
        raise KeyError(f"unknown curve {name!r}; known: {sorted(_CURVES)}")
    d = _CURVES[key]
    return ShortWCurve(name=d["name"], fp_ctx=FpCtx(d["p"]), a=d["a"], b=d["b"],
                       gx=d["gx"], gy=d["gy"], q=d["q"], h=d["h"])


def list_curves():
    return sorted(d["name"] for d in _CURVES.values())


# ---------------------------------------------------------------------------
# Built-in curves (reference inventory: src/curves/known/ — 47 headers).
# Constants are public standard data (SEC2, FIPS 186-4, RFC 5639, ...).
# ---------------------------------------------------------------------------

register_curve(
    "SECP256R1",
    p=0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF,
    a=-3,
    b=0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
    gx=0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
    gy=0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
    q=0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551,
    h=1,
    aliases=("P-256", "P256", "prime256v1", "NIST-P256"),
)

register_curve(
    "SECP256K1",
    p=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F,
    a=0,
    b=7,
    gx=0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    gy=0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
    q=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141,
    h=1,
)
