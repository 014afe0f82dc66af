"""Differential tests for the cold-path NN ops (division, gcd/xgcd-inverse,
logical) against Python ints — the same oracle strategy as the reference's
arithmetic_tests_generator.py (SURVEY §4.2: NN_DIVREM / NN_XGCD /
NN_MODINV / NN_MODINV_2EXP / NN_SHIFT / NN_ROTATE / bitwise op streams).
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from libecc_tpu.nn import core as nn
from libecc_tpu.nn import ops

K = 10          # 150-bit operands keep the fixed-bound loops fast
N = 16
BITS = K * nn.LIMB_BITS
rng = random.Random(0xA11CE)


def _batch(vals):
    return jnp.asarray(nn.batch_to_limbs(vals, K))


def _ints(arr):
    return nn.batch_from_limbs(np.asarray(arr))


def test_divrem_mod():
    a = [rng.getrandbits(BITS) for _ in range(N)]
    b = [rng.getrandbits(rng.randrange(8, BITS - 8)) | 1 for _ in range(N)]
    b[0] = 1
    b[1] = a[1]            # equal
    b[2] = a[2] + 1 if a[2] + 1 < (1 << BITS) else a[2] - 1   # b > a
    b[3] = 0               # division by zero lane
    q, r = ops.divrem(_batch(a), _batch(b))
    qi, ri = _ints(q), _ints(r)
    for i in range(N):
        if b[i] == 0:
            assert qi[i] == 0 and ri[i] == a[i]
        else:
            assert qi[i] == a[i] // b[i], i
            assert ri[i] == a[i] % b[i], i


def test_gcd():
    g0 = [rng.getrandbits(40) | 1 for _ in range(N)]
    a = [g0[i] * rng.getrandbits(60) for i in range(N)]
    b = [g0[i] * rng.getrandbits(60) for i in range(N)]
    import math
    g = ops.gcd(_batch(a), _batch(b))
    gi = _ints(g)
    for i in range(N):
        assert gi[i] == math.gcd(a[i], b[i]), i


def test_modinv_general():
    # odd moduli, not necessarily prime (Fermat would fail here)
    m = [(rng.getrandbits(BITS - 4) | 1) for _ in range(N)]
    a = []
    import math
    for i in range(N):
        while True:
            c = rng.randrange(1, m[i])
            if math.gcd(c, m[i]) == 1:
                a.append(c)
                break
    inv, ok = ops.modinv(_batch(a), _batch(m))
    invi = _ints(inv)
    assert bool(np.asarray(ok).all())
    for i in range(N):
        assert invi[i] == pow(a[i], -1, m[i]), i


def test_modinv_not_invertible():
    m = [15] * 4 + [21] * 4
    a = [3, 5, 4, 2, 7, 3, 10, 2]   # 3,5 share factors with 15; 7,3 with 21
    inv, ok = ops.modinv(_batch(a), _batch(m))
    okn = np.asarray(ok)
    import math
    for i in range(8):
        assert okn[i] == (math.gcd(a[i], m[i]) == 1), i


def test_modinv_2exp():
    bits = 64
    a = [rng.getrandbits(BITS - 8) | 1 for _ in range(N)]
    inv, ok = ops.modinv_2exp(_batch(a), bits)
    invi = _ints(inv)
    assert bool(np.asarray(ok).all())
    for i in range(N):
        assert invi[i] == pow(a[i], -1, 1 << bits), i


def test_shifts_rotates_bitwise():
    a = [rng.getrandbits(BITS) for _ in range(N)]
    b = [rng.getrandbits(BITS) for _ in range(N)]
    da, db = _batch(a), _batch(b)
    mask = (1 << BITS) - 1
    for sh in (1, 14, 15, 16, 77):
        assert _ints(ops.lshift(da, sh)) == [(x << sh) & mask for x in a]
        assert _ints(nn.rshift(da, sh)) == [x >> sh for x in a]
    blen = 128
    at = [x & ((1 << blen) - 1) for x in a]
    dat = _batch(at)
    for rot in (1, 15, 31, 127):
        exp = [((x << rot) | (x >> (blen - rot))) & ((1 << blen) - 1)
               for x in at]
        assert _ints(ops.rotate_left(dat, rot, blen)) == exp
        exp = [((x >> rot) | (x << (blen - rot))) & ((1 << blen) - 1)
               for x in at]
        assert _ints(ops.rotate_right(dat, rot, blen)) == exp
    assert _ints(ops.bitwise_xor(da, db)) == [x ^ y for x, y in zip(a, b)]
    assert _ints(ops.bitwise_and(da, db)) == [x & y for x, y in zip(a, b)]
    assert _ints(ops.bitwise_or(da, db)) == [x | y for x, y in zip(a, b)]
    assert _ints(ops.bitwise_not(da)) == [x ^ mask for x in a]


def test_bitlen_clz():
    a = [0, 1, 2, 0x7FFF, 0x8000, rng.getrandbits(100),
         rng.getrandbits(BITS), 1 << (BITS - 1)]
    a += [rng.getrandbits(rng.randrange(1, BITS)) for _ in range(N - len(a))]
    bl = np.asarray(ops.bitlen_lanes(_batch(a)))
    cz = np.asarray(ops.clz_lanes(_batch(a)))
    for i in range(N):
        assert bl[i] == a[i].bit_length(), (i, a[i])
        assert cz[i] == BITS - a[i].bit_length()


def test_q_inv_batched_matches_fermat():
    """Montgomery batch inversion (lane tree, N >= 16) vs per-lane Fermat
    and host pow; includes 0 (-> 0), 1, q-1 and a non-power-of-two N."""
    from libecc_tpu.fp.field import FpCtx
    from libecc_tpu.sig import common
    q = 0xffffffff00000000ffffffffffffffffbce6faada7179e84f3b9cac2fc632551
    ctx = FpCtx(q)
    r = random.Random(0xBEEF)
    vals = [r.randrange(1, q) for _ in range(37)] + [0, 1, q - 1]
    a = jnp.asarray(nn.batch_to_limbs(vals, ctx.k))
    out = nn.batch_from_limbs(np.asarray(common._q_inv_batched(a, ctx)))
    ref = nn.batch_from_limbs(np.asarray(common._q_inv_fermat(a, ctx)))
    for v, o, f in zip(vals, out, ref):
        assert o == f
        assert o == (0 if v == 0 else pow(v, -1, q))
