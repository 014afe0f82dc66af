"""Primality tooling: Miller-Rabin, prime generation, Pollard's rho.

Reference: src/examples/basic/miller_rabin.c (223 LoC) and
pollard_rho.c (259 LoC). Miller-Rabin witnesses run as a batched device
modexp (all witnesses in one lane batch); the squaring chase and rho
iteration are host loops over small state.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..nn import core as nn

SMALL_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47,
                53, 59, 61, 67, 71, 73, 79, 83, 89, 97]


def miller_rabin(n: int, rounds: int = 32, rng=None, device: bool = True) -> bool:
    """Probabilistic primality test. With device=True the witness
    exponentiations a^d mod n run as ONE batched device modexp."""
    if n < 2:
        return False
    for sp in SMALL_PRIMES:
        if n % sp == 0:
            return n == sp
    rng = rng or os.urandom
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    nbytes = (n.bit_length() + 7) // 8 + 8
    bases = []
    while len(bases) < rounds:
        a = int.from_bytes(rng(nbytes), "big") % (n - 3) + 2
        bases.append(a)
    if device:
        from .rsa import modexp_batch
        xs = modexp_batch(bases, [d] * rounds, n)
    else:
        xs = [pow(a, d, n) for a in bases]
    for x in xs:
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def gen_prime(bits: int, rng=None) -> int:
    """Random prime of exactly `bits` bits (host sieve + MR)."""
    rng = rng or os.urandom
    while True:
        v = int.from_bytes(rng((bits + 7) // 8), "big")
        v |= (1 << (bits - 1)) | 1
        v &= (1 << bits) - 1
        if all(v % sp for sp in SMALL_PRIMES) and \
                miller_rabin(v, rounds=24, rng=rng, device=False):
            return v


def pollard_rho(n: int, max_iters: int = 1 << 20, rng=None) -> int | None:
    """Pollard's rho factorization (Brent variant). Returns a nontrivial
    factor or None (reference: examples/basic/pollard_rho.c)."""
    import math
    if n % 2 == 0:
        return 2
    rng = rng or os.urandom
    nbytes = (n.bit_length() + 7) // 8 + 4
    for _ in range(8):
        c = int.from_bytes(rng(nbytes), "big") % (n - 2) + 1
        x = y = int.from_bytes(rng(nbytes), "big") % n
        d = 1
        it = 0
        while d == 1 and it < max_iters:
            x = (x * x + c) % n
            y = (y * y + c) % n
            y = (y * y + c) % n
            d = math.gcd(abs(x - y), n)
            it += 1
        if 1 < d < n:
            return d
    return None
