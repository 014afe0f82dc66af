"""Finite-field (Z_p*) signature schemes over the NN layer: DSA, SDSA
(Schnorr), KCDSA, GOST R 34.10-94.

Reference: src/examples/sig/{dsa,sdsa,kcdsa,gostr34_10_94}/ — the
"examples tier" proving the big-number layer stands alone. The modular
exponentiations (the entire hot path) run as batched device kernels via
extras.rsa.modexp_batch; scalar (mod q) bookkeeping is host-side.

Equations (all with domain (p, q, g), q | p-1, priv x in ]0,q[):
  DSA     y = g^x;      r=(g^k)%q, s=k^-1(z+xr)%q;      FIPS 186-4
  SDSA    y = g^x;      h=H(pi||m), e=h%q, s=(xe+k)%q;  sig = h||s
  KCDSA   y = g^(x^-1); r=H(pi), e=OS2I(r^H(z||m))%q, s=x(k-e)%q
  GOST94  y = g^x;      r=(g^k)%q, s=(xr+kz)%q
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..hash.registry import get_hash
from .rsa import modexp_batch
from .primes import gen_prime, miller_rabin


@dataclass
class FpDomain:
    """DSA-style domain parameters."""
    p: int
    q: int
    g: int

    def __post_init__(self):
        if (self.p - 1) % self.q != 0:
            raise ValueError("q must divide p-1")
        if pow(self.g, self.q, self.p) != 1 or self.g <= 1:
            raise ValueError("g must have order q")

    @property
    def p_len(self):
        return (self.p.bit_length() + 7) // 8

    @property
    def q_len(self):
        return (self.q.bit_length() + 7) // 8


def gen_domain(p_bits: int, q_bits: int, rng=None) -> FpDomain:
    """Generate (p, q, g) with q | p-1 (FIPS 186-4 appendix A style)."""
    rng = rng or os.urandom
    q = gen_prime(q_bits, rng)
    while True:
        cof_bits = p_bits - q_bits
        cof = int.from_bytes(rng((cof_bits + 7) // 8), "big")
        cof |= 1 << (cof_bits - 1)
        cof &= ~1
        p = q * cof + 1
        if p.bit_length() == p_bits and miller_rabin(p, 24, rng,
                                                     device=False):
            break
    while True:
        h = int.from_bytes(rng(p_bits // 8), "big") % (p - 2) + 2
        g = pow(h, (p - 1) // q, p)
        if g > 1:
            return FpDomain(p=p, q=q, g=g)


def keygen(dom: FpDomain, n: int, priv_ints=None, rng=None, inv_pub=False):
    """-> (privs, pubs): y = g^x (or g^(x^-1) for KCDSA) via device modexp."""
    rng = rng or os.urandom
    if priv_ints is None:
        priv_ints = [int.from_bytes(rng(dom.q_len + 8), "big") % (dom.q - 1)
                     + 1 for _ in range(n)]
    exps = ([pow(x, -1, dom.q) for x in priv_ints] if inv_pub
            else list(priv_ints))
    pubs = modexp_batch([dom.g] * n, exps, dom.p, exp_bits=dom.q.bit_length())
    return priv_ints, pubs


def _nonces(dom, n, nonces, rng):
    rng = rng or os.urandom
    if nonces is None:
        nonces = [int.from_bytes(rng(dom.q_len + 8), "big") % (dom.q - 1) + 1
                  for _ in range(n)]
    return nonces


def _z_trunc(digest: bytes, q: int) -> int:
    v = int.from_bytes(digest, "big")
    extra = 8 * len(digest) - q.bit_length()
    if extra > 0:
        v >>= extra
    return v % q


# -- DSA -----------------------------------------------------------------------

def dsa_sign_batch(dom, privs, msgs, hash_name="SHA256", nonces=None,
                   rng=None):
    alg = get_hash(hash_name)
    n = len(msgs)
    ks = _nonces(dom, n, nonces, rng)
    gk = modexp_batch([dom.g] * n, ks, dom.p, exp_bits=dom.q.bit_length())
    sigs = []
    for i in range(n):
        r = gk[i] % dom.q
        z = _z_trunc(alg.hash(msgs[i]), dom.q)
        s = pow(ks[i], -1, dom.q) * (z + privs[i] * r) % dom.q
        assert r and s
        sigs.append(r.to_bytes(dom.q_len, "big")
                    + s.to_bytes(dom.q_len, "big"))
    return sigs


def dsa_verify_batch(dom, pubs, msgs, sigs, hash_name="SHA256"):
    alg = get_hash(hash_name)
    n = len(msgs)
    bases, exps, pre = [], [], []
    for i in range(n):
        sg = sigs[i]
        ok = len(sg) == 2 * dom.q_len
        r = int.from_bytes(sg[:dom.q_len], "big") if ok else 0
        s = int.from_bytes(sg[dom.q_len:], "big") if ok else 0
        ok = ok and 0 < r < dom.q and 0 < s < dom.q
        w = pow(s, -1, dom.q) if ok else 1
        z = _z_trunc(alg.hash(msgs[i]), dom.q)
        bases += [dom.g, pubs[i]]
        exps += [z * w % dom.q, int.from_bytes(sg[:dom.q_len], "big")
                 * w % dom.q if ok else 0]
        pre.append(ok)
    vals = modexp_batch(bases, exps, dom.p, exp_bits=dom.q.bit_length())
    out = []
    for i in range(n):
        r = int.from_bytes(sigs[i][:dom.q_len], "big") if pre[i] else -1
        v = vals[2 * i] * vals[2 * i + 1] % dom.p % dom.q
        out.append(pre[i] and v == r)
    return np.array(out)


# -- SDSA (Schnorr) -------------------------------------------------------------

def sdsa_sign_batch(dom, privs, msgs, hash_name="SHA256", nonces=None,
                    rng=None):
    alg = get_hash(hash_name)
    n = len(msgs)
    ks = _nonces(dom, n, nonces, rng)
    gk = modexp_batch([dom.g] * n, ks, dom.p, exp_bits=dom.q.bit_length())
    sigs = []
    for i in range(n):
        h = alg.hash(gk[i].to_bytes(dom.p_len, "big") + msgs[i])
        e = int.from_bytes(h, "big") % dom.q
        s = (privs[i] * e + ks[i]) % dom.q
        sigs.append(h + s.to_bytes(dom.q_len, "big"))
    return sigs


def sdsa_verify_batch(dom, pubs, msgs, sigs, hash_name="SHA256"):
    alg = get_hash(hash_name)
    hlen = alg.digest_size
    n = len(msgs)
    bases, exps, pre = [], [], []
    for i in range(n):
        sg = sigs[i]
        ok = len(sg) == hlen + dom.q_len
        h = sg[:hlen] if ok else b"\x00" * hlen
        s = int.from_bytes(sg[hlen:], "big") if ok else 0
        ok = ok and 0 < s < dom.q
        e = int.from_bytes(h, "big") % dom.q
        bases += [dom.g, pubs[i]]
        exps += [s, (dom.q - e) % dom.q]
        pre.append(ok)
    vals = modexp_batch(bases, exps, dom.p, exp_bits=dom.q.bit_length())
    out = []
    for i in range(n):
        pi = vals[2 * i] * vals[2 * i + 1] % dom.p
        hp = alg.hash(pi.to_bytes(dom.p_len, "big") + msgs[i])
        out.append(pre[i] and hp == sigs[i][:hlen])
    return np.array(out)


# -- KCDSA ----------------------------------------------------------------------

def _kcdsa_z(dom, pub: int, block_size: int) -> bytes:
    z = pub.to_bytes(dom.p_len, "big")
    return (z + b"\x00" * block_size)[:block_size]


def kcdsa_sign_batch(dom, privs, pubs, msgs, hash_name="SHA256",
                     nonces=None, rng=None):
    alg = get_hash(hash_name)
    rl = min(alg.digest_size, dom.q_len)
    n = len(msgs)
    ks = _nonces(dom, n, nonces, rng)
    gk = modexp_batch([dom.g] * n, ks, dom.p, exp_bits=dom.q.bit_length())
    sigs = []
    for i in range(n):
        r = alg.hash(gk[i].to_bytes(dom.p_len, "big"))
        r = r[len(r) - rl:]
        h = alg.hash(_kcdsa_z(dom, pubs[i], alg.block_size) + msgs[i])
        h = h[len(h) - rl:]
        e = int.from_bytes(bytes(a ^ b for a, b in zip(r, h)), "big") % dom.q
        s = privs[i] * ((ks[i] - e) % dom.q) % dom.q
        sigs.append(r + s.to_bytes(dom.q_len, "big"))
    return sigs


def kcdsa_verify_batch(dom, pubs, msgs, sigs, hash_name="SHA256"):
    alg = get_hash(hash_name)
    rl = min(alg.digest_size, dom.q_len)
    n = len(msgs)
    bases, exps, pre, es = [], [], [], []
    for i in range(n):
        sg = sigs[i]
        ok = len(sg) == rl + dom.q_len
        r = sg[:rl] if ok else b"\x00" * rl
        s = int.from_bytes(sg[rl:], "big") if ok else 0
        ok = ok and 0 < s < dom.q
        h = alg.hash(_kcdsa_z(dom, pubs[i], alg.block_size) + msgs[i])
        h = h[len(h) - rl:]
        e = int.from_bytes(bytes(a ^ b for a, b in zip(r, h)), "big") % dom.q
        bases += [pubs[i], dom.g]
        exps += [s, e]
        pre.append(ok)
        es.append(e)
    vals = modexp_batch(bases, exps, dom.p, exp_bits=dom.q.bit_length())
    out = []
    for i in range(n):
        pi = vals[2 * i] * vals[2 * i + 1] % dom.p
        rp = alg.hash(pi.to_bytes(dom.p_len, "big"))
        rp = rp[len(rp) - rl:]
        out.append(pre[i] and rp == sigs[i][:rl])
    return np.array(out)


# -- GOST R 34.10-94 ------------------------------------------------------------

def gost94_sign_batch(dom, privs, msgs, hash_name="STREEBOG256",
                      nonces=None, rng=None):
    alg = get_hash(hash_name)
    n = len(msgs)
    ks = _nonces(dom, n, nonces, rng)
    gk = modexp_batch([dom.g] * n, ks, dom.p, exp_bits=dom.q.bit_length())
    sigs = []
    for i in range(n):
        r = gk[i] % dom.q
        z = int.from_bytes(alg.hash(msgs[i]), "big") % dom.q or 1
        s = (privs[i] * r + ks[i] * z) % dom.q
        assert r and s
        sigs.append(r.to_bytes(dom.q_len, "big")
                    + s.to_bytes(dom.q_len, "big"))
    return sigs


def gost94_verify_batch(dom, pubs, msgs, sigs, hash_name="STREEBOG256"):
    alg = get_hash(hash_name)
    n = len(msgs)
    bases, exps, pre = [], [], []
    for i in range(n):
        sg = sigs[i]
        ok = len(sg) == 2 * dom.q_len
        r = int.from_bytes(sg[:dom.q_len], "big") if ok else 0
        s = int.from_bytes(sg[dom.q_len:], "big") if ok else 0
        ok = ok and 0 < r < dom.q and 0 < s < dom.q
        z = int.from_bytes(alg.hash(msgs[i]), "big") % dom.q or 1
        v = pow(z, -1, dom.q)
        bases += [dom.g, pubs[i]]
        exps += [s * v % dom.q, (dom.q - r) * v % dom.q]
        pre.append(ok)
    vals = modexp_batch(bases, exps, dom.p, exp_bits=dom.q.bit_length())
    out = []
    for i in range(n):
        r = int.from_bytes(sigs[i][:dom.q_len], "big") if pre[i] else -1
        u = vals[2 * i] * vals[2 * i + 1] % dom.p % dom.q
        out.append(pre[i] and u == r)
    return np.array(out)
