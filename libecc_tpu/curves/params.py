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
                   q: int, h: int = 1, aliases: tuple = (), oid: str = "",
                   **transfer):
    """Register a short-Weierstrass curve (reference: ec_maps[] entry +
    user-curve path of expand_libecc.py). Validates gy^2 = gx^3+a gx+b.
    transfer: optional alpha/gamma_montgomery, alpha_edwards coefficients
    (reference: ec_params_external.h transfer constants)."""
    a_, b_ = a % p, b % p
    if (gy * gy - (gx * gx * gx + a_ * gx + b_)) % p != 0:
        raise ValueError(f"curve {name}: generator not on curve")
    if p <= 3 or q <= 1:
        raise ValueError(f"curve {name}: bad p/q")
    _CURVES[_canon(name)] = dict(name=name, p=p, a=a_, b=b_, gx=gx, gy=gy,
                                 q=q, h=h, oid=oid, **transfer)
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
    c = ShortWCurve(name=d["name"], fp_ctx=FpCtx(d["p"]), a=d["a"], b=d["b"],
                    gx=d["gx"], gy=d["gy"], q=d["q"], h=d["h"])
    # Montgomery/Edwards transfer coefficients (reference:
    # ec_params_external.h alpha/gamma constants; used by the curve-model
    # mapping layer and X25519/EdDSA cross-checks).
    c.oid = d.get("oid", "")
    c.alpha_montgomery = d.get("alpha_montgomery", 0)
    c.gamma_montgomery = d.get("gamma_montgomery", 0)
    c.alpha_edwards = d.get("alpha_edwards", 0)
    return c


def list_curves():
    return sorted(d["name"] for d in _CURVES.values())


def raw_params(name: str) -> dict:
    """Raw integer parameter dict for a registered curve (used by the
    ASN.1 export path and introspection)."""
    key = _ALIASES.get(_canon(name), _canon(name))
    if key not in _CURVES:
        raise KeyError(f"unknown curve {name!r}")
    return dict(_CURVES[key])


def find_by_oid(oid: str) -> str | None:
    """Resolve an RFC3279 named-curve OID to a registered curve name."""
    for d in _CURVES.values():
        if d.get("oid") == oid:
            return d["name"]
    return None


# ---------------------------------------------------------------------------
# Built-in curves: the reference's full known-curve inventory
# (src/curves/known/ — 45 parameter sets), extracted to curves_data.py by
# scripts/extract_curves.py. Constants are public standard data (SEC2,
# FIPS 186-4, RFC 5639, GOST R 34.10, SM2, STB 34.101.45, FRP256V1,
# RFC 7748 short-Weierstrass transports).
# ---------------------------------------------------------------------------

_COMMON_ALIASES = {
    "SECP256R1": ("P-256", "P256", "prime256v1", "NIST-P256"),
    "SECP384R1": ("P-384", "P384", "NIST-P384"),
    "SECP521R1": ("P-521", "P521", "NIST-P521"),
    "SECP224R1": ("P-224", "P224", "NIST-P224"),
    "SECP192R1": ("P-192", "P192", "NIST-P192"),
    "SM2P256V1": ("SM2", "SM2-P256"),
}


def _register_builtin():
    from .known.curves_data import CURVES
    for name, d in CURVES.items():
        register_curve(name, aliases=_COMMON_ALIASES.get(name, ()), **d)


_register_builtin()
