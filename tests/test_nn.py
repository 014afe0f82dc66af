"""Differential tests of the nn (big-integer) layer against Python ints.

This is the TPU analog of the reference's arithmetic differential harness
(src/arithmetic_tests/arithmetic_tests_generator.py): Python int results
are the oracle for every limb-tensor operation.
"""

import random

import numpy as np
import jax
import pytest

from libecc_tpu.nn import core as nn

P256 = 2**256 - 2**224 + 2**192 + 2**96 - 1
N = 8


@pytest.fixture(scope="module")
def ctx():
    # +2 headroom limbs: the relaxed (carry-free) ops require R/p >= 2^25
    return nn.MontCtx(P256, k=nn.num_limbs(256) + 2)


@pytest.fixture(scope="module")
def data(ctx):
    r = random.Random(1)
    xs = [r.randrange(P256) for _ in range(N - 3)] + [0, 1, P256 - 1]
    ys = [r.randrange(P256) for _ in range(N - 3)] + [P256 - 1, 0, 1]
    return xs, ys, nn.batch_to_limbs(xs, ctx.k), nn.batch_to_limbs(ys, ctx.k)


def test_roundtrip_conversion(ctx):
    xs = [0, 1, P256 - 1, 12345678901234567890]
    a = nn.batch_to_limbs(xs, ctx.k)
    assert nn.batch_from_limbs(a) == xs


def test_add_sub(ctx, data):
    xs, ys, a, b = data
    W = 1 << (nn.LIMB_BITS * ctx.k)
    s, c = jax.jit(nn.add)(a, b)
    got = nn.batch_from_limbs(np.asarray(s))
    for i in range(N):
        assert got[i] == (xs[i] + ys[i]) % W
        assert int(np.asarray(c)[i]) == (xs[i] + ys[i]) // W
    d, br = jax.jit(nn.sub)(a, b)
    got = nn.batch_from_limbs(np.asarray(d))
    for i in range(N):
        assert got[i] == (xs[i] - ys[i]) % W
        assert int(np.asarray(br)[i]) == (1 if xs[i] < ys[i] else 0)


def test_mul(ctx, data):
    xs, ys, a, b = data
    got = nn.batch_from_limbs(np.asarray(jax.jit(nn.mul)(a, b)))
    for i in range(N):
        assert got[i] == xs[i] * ys[i]


def test_mont_mul_exact(ctx, data):
    xs, ys, a, b = data

    @jax.jit
    def f(a, b):
        am, bm = nn.to_mont(a, ctx), nn.to_mont(b, ctx)
        return nn.from_mont(nn.mont_mul(am, bm, ctx), ctx)

    got = nn.batch_from_limbs(np.asarray(f(a, b)))
    for i in range(N):
        assert got[i] == xs[i] * ys[i] % P256


def test_mont_mul_relaxed(ctx, data):
    xs, ys, a, b = data

    @jax.jit
    def f(a, b):
        am, bm = nn.to_mont(a, ctx), nn.to_mont(b, ctx)
        r = nn.mont_mul_relaxed(am, bm, ctx)
        # feed the relaxed result through more relaxed ops before canon
        r2 = nn.mod_add_relaxed(r, r)
        r3 = nn.mod_sub_relaxed(r2, r, ctx)
        return nn.from_mont(nn.canonicalize(r3, ctx), ctx)

    got = nn.batch_from_limbs(np.asarray(f(a, b)))
    for i in range(N):
        assert got[i] == xs[i] * ys[i] % P256


def test_mod_add_sub_neg(ctx, data):
    xs, ys, a, b = data
    cases = [
        (lambda u, v: nn.mod_add(u, v, ctx), lambda x, y: (x + y) % P256),
        (lambda u, v: nn.mod_sub(u, v, ctx), lambda x, y: (x - y) % P256),
        (lambda u, v: nn.mod_neg(u, ctx), lambda x, y: (-x) % P256),
    ]
    for f, g in cases:
        got = nn.batch_from_limbs(np.asarray(jax.jit(f)(a, b)))
        for i in range(N):
            assert got[i] == g(xs[i], ys[i])


def test_relaxed_sub_stress(ctx):
    """Relaxed subtraction with adversarial relaxed limb patterns."""
    r = random.Random(7)
    xs = [r.randrange(P256) for _ in range(N)]
    ys = [r.randrange(P256) for _ in range(N)]
    a = nn.batch_to_limbs(xs, ctx.k)
    b = nn.batch_to_limbs(ys, ctx.k)

    @jax.jit
    def f(a, b):
        # build relaxed reps: (a+a)+(a) has limbs up to 3*(2^15-1)
        ar = nn.mod_add_relaxed(nn.mod_add_relaxed(a, a), a)
        d = nn.mod_sub_relaxed(ar, b, ctx)
        d = nn.mod_sub_relaxed(d, b, ctx)
        return nn.canonicalize(d, ctx)

    got = nn.batch_from_limbs(np.asarray(f(a, b)))
    for i in range(N):
        assert got[i] == (3 * xs[i] - 2 * ys[i]) % P256


def test_fermat_inverse(ctx, data):
    xs, ys, a, b = data

    @jax.jit
    def f(a):
        return nn.from_mont(nn.mont_inv_fermat(nn.to_mont(a, ctx), ctx), ctx)

    got = nn.batch_from_limbs(np.asarray(f(a)))
    for i in range(N):
        if xs[i] != 0:
            assert got[i] == pow(xs[i], -1, P256)


def test_reduce_wide(ctx):
    r = random.Random(3)
    ws = [r.randrange(1 << 512) for _ in range(N)]
    w = nn.batch_to_limbs(ws, 2 * ctx.k)
    got = nn.batch_from_limbs(
        np.asarray(jax.jit(lambda w: nn.reduce_wide(w, ctx))(w)))
    for i in range(N):
        assert got[i] == ws[i] % P256


def test_mod_pow_traced_exponent(ctx, data):
    xs, ys, a, b = data
    got = nn.batch_from_limbs(
        np.asarray(jax.jit(lambda a, e: nn.mod_pow(a, e, ctx))(a, b)))
    for i in range(N):
        assert got[i] == pow(xs[i], ys[i], P256)


def test_masks_and_selects(ctx, data):
    xs, ys, a, b = data
    lt = np.asarray(jax.jit(nn.lt_mask)(a, b))
    eq = np.asarray(jax.jit(nn.eq_mask)(a, b))
    for i in range(N):
        assert bool(lt[i]) == (xs[i] < ys[i])
        assert bool(eq[i]) == (xs[i] == ys[i])
    sel = np.asarray(jax.jit(nn.cnd_select)(jax.numpy.asarray(lt), a, b))
    got = nn.batch_from_limbs(sel)
    for i in range(N):
        assert got[i] == (xs[i] if xs[i] < ys[i] else ys[i])


def test_bits_msb_first(ctx):
    xs = [0b1011001110001111, (1 << 255) | 7]
    a = nn.batch_to_limbs(xs, ctx.k)
    bits = np.asarray(nn.bits_msb_first(a, 256))
    for j, x in enumerate(xs):
        want = [(x >> (255 - i)) & 1 for i in range(256)]
        assert list(bits[:, j]) == want
