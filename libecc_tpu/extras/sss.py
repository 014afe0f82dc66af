"""Shamir Secret Sharing over the secp256k1 prime field.

Reference: src/examples/sss/sss.c (772 LoC) — (k, n) threshold sharing of
a 32-byte secret over GF(p), p = secp256k1's prime, with per-share HMAC
integrity (session id + HMAC-SHA256 over the raw share).

TPU mapping: share generation evaluates the degree-(k-1) polynomial at
all n share indices as one batched Horner scan over the Fp kernels;
reconstruction computes Lagrange coefficients at 0 (host ints — tiny)
and a batched sum of coeff*share products on device.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..fp.field import FpCtx
from ..fp import field as fp
from ..hash.hmac import Hmac

P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
SECRET_SIZE = 32
SESSION_ID_SIZE = 16

_ctx = FpCtx(P)
_JIT: dict = {}


@dataclass
class Share:
    index: int                 # share abscissa (1-based)
    value: bytes               # 32-byte share value
    session_id: bytes          # 16-byte batch identifier
    hmac: bytes                # integrity tag

    def to_bytes(self) -> bytes:
        return (self.index.to_bytes(2, "big") + self.session_id
                + self.value + self.hmac)

    @classmethod
    def from_bytes(cls, b: bytes) -> "Share":
        if len(b) != 2 + SESSION_ID_SIZE + SECRET_SIZE + 32:
            raise ValueError("bad share length")
        return cls(index=int.from_bytes(b[:2], "big"),
                   session_id=b[2:18], value=b[18:50], hmac=b[50:])


def _horner_jit(k: int, n: int):
    key = (k, n)
    if key not in _JIT:
        def f(coeffs, xs):
            # coeffs: (k, K, 1) Montgomery; xs: (K, n) Montgomery
            acc = jnp.broadcast_to(coeffs[k - 1], xs.shape)
            for j in range(k - 2, -1, -1):
                acc = fp.mul(acc, xs, _ctx)
                acc = fp.add(acc, jnp.broadcast_to(coeffs[j], xs.shape),
                             _ctx)
            return nn.canonicalize_from_mont(acc, _ctx)
        _JIT[key] = jax.jit(f)
    return _JIT[key]


def _hmac_tag(secret_hmac_key: bytes, session_id: bytes, index: int,
              value: bytes) -> bytes:
    h = Hmac(secret_hmac_key, "SHA256")
    h.update(session_id + index.to_bytes(2, "big") + value)
    return h.digest()


def share_secret(secret: bytes, k: int, n: int, rng=None) -> list[Share]:
    """Split a 32-byte secret into n shares, any k of which reconstruct it
    (reference: sss_generate)."""
    if len(secret) != SECRET_SIZE:
        raise ValueError("secret must be 32 bytes")
    if not (1 <= k <= n):
        raise ValueError("need 1 <= k <= n")
    rng = rng or os.urandom
    s_int = int.from_bytes(secret, "big") % P
    coeffs = [s_int] + [int.from_bytes(rng(40), "big") % P
                        for _ in range(k - 1)]
    session_id = rng(SESSION_ID_SIZE)
    hmac_key = secret  # bind integrity to the secret (reference pattern)
    cm = jnp.asarray(np.stack(
        [np.asarray(_ctx.from_ints([c]))
         for c in coeffs], axis=0))          # (k, K, 1)
    xs = _ctx.from_ints(list(range(1, n + 1)))
    vals = _horner_jit(k, n)(cm, xs)
    ints = nn.batch_from_limbs(np.asarray(vals))
    out = []
    for i in range(n):
        v = int(ints[i]).to_bytes(SECRET_SIZE, "big")
        out.append(Share(index=i + 1, value=v, session_id=session_id,
                         hmac=_hmac_tag(hmac_key, session_id, i + 1, v)))
    return out


def reconstruct(shares: list[Share], k: int) -> bytes:
    """Combine k shares -> secret; verifies the per-share HMACs afterwards
    (reference: sss_combine; HMAC checked against the recovered secret)."""
    if len(shares) < k:
        raise ValueError("not enough shares")
    shares = shares[:k]
    sid = shares[0].session_id
    if any(s.session_id != sid for s in shares):
        raise ValueError("shares from different sessions")
    xs = [s.index for s in shares]
    if len(set(xs)) != len(xs):
        raise ValueError("duplicate share indices")
    ys = [int.from_bytes(s.value, "big") for s in shares]
    secret = 0
    for i in range(k):
        num, den = 1, 1
        for j in range(k):
            if i == j:
                continue
            num = num * (-xs[j]) % P
            den = den * (xs[i] - xs[j]) % P
        secret = (secret + ys[i] * num * pow(den, -1, P)) % P
    out = secret.to_bytes(SECRET_SIZE, "big")
    for s in shares:
        if _hmac_tag(out, sid, s.index, s.value) != s.hmac:
            raise ValueError(f"share {s.index} failed integrity check")
    return out
