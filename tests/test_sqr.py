"""Comba-squaring specialization: value-equal to the generic product,
bit-identical across the XLA / tile-kernel / row-kernel backends."""

import numpy as np
import pytest

import jax.numpy as jnp

from libecc_tpu.curves import params
from libecc_tpu.nn import core as nn


def _rand_batch(ctx, n, seed=0):
    rng = np.random.RandomState(seed)
    vals = [int.from_bytes(rng.bytes((ctx.bits + 7) // 8), "big")
            % ctx.p_int for _ in range(n)]
    return jnp.asarray(nn.batch_to_limbs(
        [v * ctx.R % ctx.p_int for v in vals], ctx.k)), vals


def test_sqr_value_equals_mul():
    ctx = params.get_curve("P-256").fp_ctx
    a, vals = _rand_batch(ctx, 32)
    s = nn.mont_sqr_relaxed(a, ctx)
    m = nn.mont_mul_relaxed(a, a, ctx)
    # representations may differ; canonical values must not
    sc = np.asarray(nn.canonicalize(s, ctx))
    mc = np.asarray(nn.canonicalize(m, ctx))
    np.testing.assert_array_equal(sc, mc)
    # and both equal x^2 * R mod p
    got = nn.batch_from_limbs(sc)
    for g, v in zip(got, vals):
        assert g == v * v * ctx.R % ctx.p_int


def test_sqr_relaxed_input_bounds():
    """Squaring a relaxed SUM (limbs > 2^15) stays exact — the doubled
    off-diagonal products must not overflow u32."""
    ctx = params.get_curve("P-256").fp_ctx
    a, va = _rand_batch(ctx, 16, seed=1)
    b, vb = _rand_batch(ctx, 16, seed=2)
    s = a + b                                    # relaxed add
    out = nn.canonicalize(nn.mont_sqr_relaxed(s, ctx), ctx)
    got = nn.batch_from_limbs(np.asarray(out))
    for g, x, y in zip(got, va, vb):
        v = (x + y) % ctx.p_int
        assert g == v * v * ctx.R % ctx.p_int


def test_sqr_pallas_interpret_bitexact():
    """Tile-kernel squaring (interpreter mode) vs the XLA _sqr_columns
    path: relaxed output limbs must match exactly."""
    import os
    if nn.LIMB_BITS != 15:
        pytest.skip("tile kernels implement the 15-bit sequence only "
                    "(13-bit mode is served by the rows backend)")
    os.environ["LIBECC_TPU_PALLAS_INTERPRET"] = "1"
    try:
        from libecc_tpu.ops.pallas import mont as pmont
        ctx = params.get_curve("P-256").fp_ctx
        n = pmont.BLOCK
        a, _ = _rand_batch(ctx, n, seed=3)
        ref = nn.mont_sqr_relaxed(a, ctx)
        got = pmont.mont_sqr_relaxed(a, ctx)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    finally:
        os.environ.pop("LIBECC_TPU_PALLAS_INTERPRET", None)


@pytest.mark.slow
def test_sqr_rows_interpret_bitexact():
    import os
    os.environ["LIBECC_TPU_PALLAS_INTERPRET"] = "1"
    os.environ["LIBECC_TPU_PALLAS_ROWS"] = "1"
    try:
        from libecc_tpu.ops.pallas import mont as pmont
        pmont._build.cache_clear()
        ctx = params.get_curve("P-256").fp_ctx
        a, _ = _rand_batch(ctx, pmont.BLOCK, seed=4)
        ref = nn.mont_sqr_relaxed(a, ctx)
        got = pmont.mont_sqr_relaxed(a, ctx)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    finally:
        os.environ.pop("LIBECC_TPU_PALLAS_INTERPRET", None)
        os.environ.pop("LIBECC_TPU_PALLAS_ROWS", None)
        pmont._build.cache_clear()
