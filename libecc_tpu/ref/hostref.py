"""Host-side pure-Python reference implementations (test oracle only).

Independent big-int/EC math over Python ints, used by the test-suite as
the differential oracle for the batched TPU kernels — the same role the
reference's arithmetic_tests_generator.py plays (Python ints vs C).
Standard textbook formulas; nothing here runs on device or in any hot
path.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class WCurve:
    """Short-Weierstrass curve y^2 = x^3 + a x + b over GF(p)."""
    p: int
    a: int
    b: int
    gx: int
    gy: int
    q: int       # generator order
    h: int = 1   # cofactor

    def on_curve(self, P):
        if P is None:
            return True
        x, y = P
        return (y * y - (x * x * x + self.a * x + self.b)) % self.p == 0


def ec_add(c: WCurve, P, Q):
    """Affine addition (None = infinity)."""
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    p = c.p
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        lam = (3 * x1 * x1 + c.a) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def ec_mul(c: WCurve, k: int, P):
    """Double-and-add scalar multiplication."""
    R = None
    while k:
        if k & 1:
            R = ec_add(c, R, P)
        P = ec_add(c, P, P)
        k >>= 1
    return R


def ec_neg(c: WCurve, P):
    if P is None:
        return None
    return (P[0], (-P[1]) % c.p)


def ecdsa_sign_ref(c: WCurve, d: int, e: int, k: int):
    """Raw ECDSA with given truncated-hash int e and nonce k. Returns (r,s)."""
    R = ec_mul(c, k, (c.gx, c.gy))
    r = R[0] % c.q
    assert r != 0
    s = pow(k, -1, c.q) * (e + r * d) % c.q
    assert s != 0
    return r, s


def ecdsa_verify_ref(c: WCurve, Y, e: int, r: int, s: int) -> bool:
    if not (0 < r < c.q and 0 < s < c.q):
        return False
    sinv = pow(s, -1, c.q)
    u = e * sinv % c.q
    v = r * sinv % c.q
    W = ec_add(c, ec_mul(c, u, (c.gx, c.gy)), ec_mul(c, v, Y))
    if W is None:
        return False
    return W[0] % c.q == r


# Twisted Edwards: a x^2 + y^2 = 1 + d x^2 y^2
@dataclass(frozen=True)
class EdCurve:
    p: int
    a: int
    d: int
    gx: int
    gy: int
    q: int
    h: int


def ed_add(c: EdCurve, P, Q):
    x1, y1 = P
    x2, y2 = Q
    p = c.p
    den = c.d * x1 * x2 * y1 * y2 % p
    x3 = (x1 * y2 + y1 * x2) * pow(1 + den, -1, p) % p
    y3 = (y1 * y2 - c.a * x1 * x2) * pow(1 - den, -1, p) % p
    return (x3, y3)


def ed_mul(c: EdCurve, k: int, P):
    R = (0, 1)
    while k:
        if k & 1:
            R = ed_add(c, R, P)
        P = ed_add(c, P, P)
        k >>= 1
    return R
