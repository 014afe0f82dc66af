"""Curve-model transport maps: short-Weierstrass <-> Montgomery <-> twisted
Edwards, for curves and points.

Reference: src/curves/aff_pt_montgomery.c:294-495 (curve/point maps M<->W)
and src/curves/aff_pt_edwards.c:308-764 (E<->M, E<->W through M). The
reference routes ALL EdDSA/X25519 math through these maps onto its
Weierstrass core ("isogeny strategy", README_original.md:67-77); our build
computes natively per model, so these maps serve their other reference
roles: curve registration from transfer constants, cross-model consistency
checks, and import/export of points between representations.

Formulas (all in GF(p), h = cofactor shared):
  M{A,B}  -> W{a,b}:  a = (3-A^2)/(3B^2),  b = (2A^3-9A)/(27B^3)
  W{a,b}  -> M{A,B}:  A = 3*alpha/gamma,   B = 1/gamma
                      (gamma^2 = a + 3*alpha^2; alpha/gamma are the
                       precomputed transfer constants,
                       ec_params_external.h / curves_data.py)
  E{a,d}  -> M{A,B}:  A = 2(a+d)/(a-d),    B = 4/((a-d)*alpha_ed^2)
  M{A,B}  -> E{a,d}:  a = (A+2)/(B*alpha_ed^2), d = (A-2)/(B*alpha_ed^2)
  points:
  M(u,v)  -> W(x,y):  (u/B + A/(3B), v/B)
  W(x,y)  -> M(u,v):  (B*x - A/3,  B*y)
  E(x,y)  -> M(u,v):  ((1+y)/(1-y), alpha_ed*(1+y)/((1-y)x));
                      (0,1) -> infinity, (0,-1) -> (0,0)
  M(u,v)  -> E(x,y):  (alpha_ed*u/v, (u-1)/(u+1)); (0,0) -> (0,-1)

These are boundary/import-export operations (not hot paths): host integer
arithmetic, batched over Python lists. Ed448 note: the reference's EdDSA448
additionally applies a 4-isogeny scaling between edwards448 and the
birationally-mapped curve (eddsa.c:330-568); the maps here are the
birational layer only, which is exactly what aff_pt_edwards.c exposes.
"""

from __future__ import annotations

from dataclasses import dataclass

from .shortw import ShortWCurve
from .montgomery import MontgomeryCurve
from .edwards import EdwardsCurve


class MapError(ValueError):
    pass


def _inv(x: int, p: int) -> int:
    x %= p
    if x == 0:
        raise MapError("division by zero in curve map")
    return pow(x, -1, p)


# ---------------------------------------------------------------------------
# Curve-level maps
# ---------------------------------------------------------------------------

def montgomery_to_shortw_params(A: int, B: int, p: int) -> tuple[int, int]:
    """M{A,B} -> W{a,b} (aff_pt_montgomery.c:294)."""
    a = (3 - A * A) * _inv(3 * B * B, p) % p
    b = (2 * A ** 3 - 9 * A) * _inv(27 * B ** 3, p) % p
    return a, b


def shortw_to_montgomery_params(c: ShortWCurve) -> tuple[int, int]:
    """W{a,b} -> M{A,B} via the curve's stored alpha/gamma transfer
    constants (aff_pt_montgomery.c:391). Raises MapError if the curve has
    no Montgomery transfer constants."""
    p = c.fp_ctx.p_int
    alpha, gamma = c.alpha_montgomery, c.gamma_montgomery
    if gamma == 0:
        raise MapError(f"{c.name} has no Montgomery transfer constants")
    # consistency: gamma^2 == a + 3*alpha^2
    if (gamma * gamma - (c.a + 3 * alpha * alpha)) % p != 0:
        raise MapError(f"{c.name}: inconsistent alpha/gamma constants")
    A = 3 * alpha * _inv(gamma, p) % p
    B = _inv(gamma, p)
    return A, B


def edwards_to_montgomery_params(a: int, d: int, alpha_ed: int,
                                 p: int) -> tuple[int, int]:
    """E{a,d} -> M{A,B} (aff_pt_edwards.c:308)."""
    A = 2 * (a + d) * _inv(a - d, p) % p
    B = 4 * _inv((a - d) * alpha_ed * alpha_ed, p) % p
    return A, B


def montgomery_to_edwards_params(A: int, B: int, alpha_ed: int,
                                 p: int) -> tuple[int, int]:
    """M{A,B} -> E{a,d} (aff_pt_edwards.c:393). Mirrors the reference's
    role swap: if the computed d is 1, return (1, a) — swapping (a, d)
    is the x<->y coordinate swap on the curve (the Ed448/WEI448 case;
    aff_pt_edwards.c:425-431). Note the swapped curve's own E->M map
    then yields (-A, -B), which maps to the SAME Weierstrass curve."""
    inv = _inv(B * alpha_ed * alpha_ed, p)
    a, d = (A + 2) * inv % p, (A - 2) * inv % p
    if d == 1:
        a, d = d, a
    return a, d


def edwards_to_shortw_params(a: int, d: int, alpha_ed: int,
                             p: int) -> tuple[int, int]:
    """E -> W through Montgomery (aff_pt_edwards.c:447)."""
    A, B = edwards_to_montgomery_params(a, d, alpha_ed, p)
    return montgomery_to_shortw_params(A, B, p)


def check_montgomery_shortw(m: MontgomeryCurve, w: ShortWCurve) -> bool:
    """curve_montgomery_shortw_check (aff_pt_montgomery.c:357)."""
    p = w.fp_ctx.p_int
    if m.fp_ctx.p_int != p or m.q != w.q:
        return False
    a, b = montgomery_to_shortw_params(m.A, m.B, p)
    return a == w.a % p and b == w.b % p


def check_edwards_shortw(e: EdwardsCurve, w: ShortWCurve) -> bool:
    """curve_edwards_shortw_check (aff_pt_edwards.c:468)."""
    p = w.fp_ctx.p_int
    if e.fp_ctx.p_int != p or e.q != w.q:
        return False
    try:
        a, b = edwards_to_shortw_params(e.a, e.d, w.alpha_edwards, p)
    except MapError:
        return False
    return a == w.a % p and b == w.b % p


# ---------------------------------------------------------------------------
# Point-level maps (affine host ints; None = point at infinity / identity)
# ---------------------------------------------------------------------------

def aff_montgomery_to_shortw(u: int, v: int, A: int, B: int,
                             p: int) -> tuple[int, int]:
    """M(u,v) -> W(x,y) (aff_pt_montgomery.c:445)."""
    binv = _inv(B, p)
    x = (u * binv + A * _inv(3 * B, p)) % p
    y = v * binv % p
    return x, y


def aff_shortw_to_montgomery(x: int, y: int, A: int, B: int,
                             p: int) -> tuple[int, int]:
    """W(x,y) -> M(u,v) (aff_pt_montgomery.c:495)."""
    u = (B * x - A * _inv(3, p)) % p
    v = B * y % p
    return u, v


def aff_edwards_to_montgomery(x: int, y: int, alpha_ed: int,
                              p: int):
    """E(x,y) -> M(u,v) (aff_pt_edwards.c:520). Returns None for the
    identity (0,1); (0,-1) -> (0,0)."""
    x %= p
    y %= p
    if x == 0:
        if y == 1:
            return None                     # maps to infinity
        if y == p - 1:
            return (0, 0)
        raise MapError("invalid Edwards point (x=0, y!=±1)")
    t = (1 + y) * _inv(1 - y, p) % p
    u = t
    v = alpha_ed * t * _inv(x, p) % p
    return u, v


def aff_montgomery_to_edwards(u: int, v: int, alpha_ed: int, p: int):
    """M(u,v) -> E(x,y) (aff_pt_edwards.c:620). (0,0) -> (0,-1)."""
    u %= p
    v %= p
    if u == 0 and v == 0:
        return (0, p - 1)
    x = alpha_ed * u * _inv(v, p) % p
    y = (u - 1) * _inv(u + 1, p) % p
    return x, y


def aff_edwards_to_shortw(x: int, y: int, e: EdwardsCurve,
                          w: ShortWCurve):
    """E(x,y) -> W (aff_pt_edwards.c:705): through Montgomery. None for
    the Edwards identity."""
    p = w.fp_ctx.p_int
    A, B = edwards_to_montgomery_params(e.a, e.d, w.alpha_edwards, p)
    mv = aff_edwards_to_montgomery(x, y, w.alpha_edwards, p)
    if mv is None:
        return None
    return aff_montgomery_to_shortw(mv[0], mv[1], A, B, p)


def aff_shortw_to_edwards(x: int, y: int, e: EdwardsCurve,
                          w: ShortWCurve):
    """W(x,y) -> E (aff_pt_edwards.c:734)."""
    p = w.fp_ctx.p_int
    A, B = edwards_to_montgomery_params(e.a, e.d, w.alpha_edwards, p)
    u, v = aff_shortw_to_montgomery(x, y, A, B, p)
    return aff_montgomery_to_edwards(u, v, w.alpha_edwards, p)


# ---------------------------------------------------------------------------
# Coordinate recovery (aff_pt_montgomery_v_from_u :547,
# aff_pt_edwards_y_from_x :766 / x_from_y :816)
# ---------------------------------------------------------------------------

def _sqrt_p(n: int, p: int):
    """Modular square root (None if non-residue)."""
    n %= p
    if n == 0:
        return 0
    if pow(n, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(n, (p + 1) // 4, p)
    # Tonelli-Shanks
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(n, q, p), pow(n, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


def montgomery_v_from_u(u: int, A: int, B: int, p: int):
    """The two v with B*v^2 = u^3 + A*u^2 + u, or None if u is on the
    twist (aff_pt_montgomery.c:547)."""
    rhs = (u ** 3 + A * u * u + u) * _inv(B, p) % p
    v = _sqrt_p(rhs, p)
    if v is None:
        return None
    return v, (p - v) % p


def edwards_y_from_x(x: int, a: int, d: int, p: int):
    """y^2 = (1 - a*x^2)/(1 - d*x^2) (aff_pt_edwards.c:766)."""
    num = (1 - a * x * x) % p
    den = (1 - d * x * x) % p
    y = _sqrt_p(num * _inv(den, p) % p, p)
    if y is None:
        return None
    return y, (p - y) % p


def edwards_x_from_y(y: int, a: int, d: int, p: int):
    """x^2 = (1 - y^2)/(a - d*y^2) (aff_pt_edwards.c:816)."""
    num = (1 - y * y) % p
    den = (a - d * y * y) % p
    x = _sqrt_p(num * _inv(den, p) % p, p)
    if x is None:
        return None
    return x, (p - x) % p


# ---------------------------------------------------------------------------
# Ed448 4-isogeny (eddsa.c:330-568): RFC 8032's Ed448 curve (a=1,
# d=-39081) is 4-isogenous — not birational — to the "Edwards448" curve
# derived from WEI448's transfer constants. The reference computes on the
# derived curve and crosses the isogeny at point encode/decode time.
# ---------------------------------------------------------------------------

def ed448_isogeny(x: int, y: int, alpha_ed: int, p: int):
    """Ed448 wire point -> derived Edwards448 point (decode direction,
    eddsa.c:515): X = alpha*x*y/(2-x^2-y^2), Y = (x^2+y^2)/(y^2-x^2)."""
    x %= p
    y %= p
    if x == 0:                       # (0, ±1) -> identity (0, 1)
        return (0, 1)
    X = alpha_ed * x * y % p * _inv(2 - x * x - y * y, p) % p
    Y = (x * x + y * y) * _inv(y * y - x * x, p) % p
    return X, Y


def ed448_isogeny_inv(X: int, Y: int, alpha_ed: int, p: int):
    """Derived Edwards448 point -> Ed448 wire point (encode direction,
    eddsa.c:355): x = 4*X*Y/(alpha*(Y^2-X^2)), y = (2-X^2-Y^2)/(X^2+Y^2).
    The dual isogeny: round-tripping multiplies the point by 4."""
    X %= p
    Y %= p
    if X == 0:
        return (0, 1)
    x = 4 * X * Y % p * _inv(alpha_ed * (Y * Y - X * X), p) % p
    y = (2 - X * X - Y * Y) * _inv(X * X + Y * Y, p) % p
    return x, y


# ---------------------------------------------------------------------------
# High-level: native Edwards wire point -> Weierstrass transport point.
# Handles both the birational case (Ed25519/WEI25519) and the 4-isogenous
# case (Ed448/WEI448) exactly as the reference's EdDSA pipeline does.
# ---------------------------------------------------------------------------

def edwards_wire_to_shortw(x: int, y: int, e: EdwardsCurve,
                           w: ShortWCurve):
    """Map a point in the curve's RFC 8032 wire coordinates onto the
    Weierstrass transport curve. None for the identity."""
    p = w.fp_ctx.p_int
    if check_edwards_shortw(e, w):
        return aff_edwards_to_shortw(x, y, e, w)
    # 4-isogenous case: cross onto the derived curve first
    A, B = shortw_to_montgomery_params(w)
    a1, d1 = montgomery_to_edwards_params(A, B, w.alpha_edwards, p)
    X, Y = ed448_isogeny(x, y, w.alpha_edwards, p)
    if X == 0 and Y == 1:
        return None
    A2, B2 = edwards_to_montgomery_params(a1, d1, w.alpha_edwards, p)
    u, v = aff_edwards_to_montgomery(X, Y, w.alpha_edwards, p)
    return aff_montgomery_to_shortw(u, v, A2, B2, p)


def shortw_to_edwards_wire(x: int, y: int, e: EdwardsCurve,
                           w: ShortWCurve):
    """Inverse of edwards_wire_to_shortw. NOTE: for the 4-isogenous case
    the composition edwards_wire_to_shortw(shortw_to_edwards_wire(P))
    multiplies by 4 (dual isogeny), matching the reference's scalar/4
    bookkeeping (eddsa.c:833-837)."""
    p = w.fp_ctx.p_int
    if check_edwards_shortw(e, w):
        return aff_shortw_to_edwards(x, y, e, w)
    A, B = shortw_to_montgomery_params(w)
    a1, d1 = montgomery_to_edwards_params(A, B, w.alpha_edwards, p)
    A2, B2 = edwards_to_montgomery_params(a1, d1, w.alpha_edwards, p)
    u, v = aff_shortw_to_montgomery(x, y, A2, B2, p)
    X, Y = aff_montgomery_to_edwards(u, v, w.alpha_edwards, p)
    return ed448_isogeny_inv(X, Y, w.alpha_edwards, p)
