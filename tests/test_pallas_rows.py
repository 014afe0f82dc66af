"""Differential tests for the row-vectorized Pallas backend (rows.py).

Runs every rows-mode kernel in Pallas INTERPRETER mode on CPU and checks
bit-exact equality against the XLA relaxed-arithmetic path (nn/core.py,
curves/shortw.py, curves/edwards.py) — the same lane-for-lane contract the
tile-list kernels were validated to on hardware. Covers all formula
branches (a=-3, a=0, generic a, Edwards a=-1 and a=1) and both the forced
small-K mode and the automatic large-K mode (Ed448 K=32, BrainpoolP512
K=37 — the curves the rows backend exists for).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

FULL = os.environ.get("LIBECC_TPU_FULL", "0") == "1"

from libecc_tpu.curves import params
from libecc_tpu.curves import shortw, edwards as edw
from libecc_tpu.nn import core as nn
from libecc_tpu.ops.pallas import mont as pmont
from libecc_tpu.ops.pallas import point as ppoint
from libecc_tpu.ops.pallas import edpoint as pedpoint
from libecc_tpu.ref import hostref

N = pmont.BLOCK          # one grid block (8 x 128 lanes)


def _clear_builder_caches():
    pmont._build.cache_clear()
    for m in (ppoint, pedpoint):
        m._build_add.cache_clear()
        m._build_dbl.cache_clear()
        m._build_dbln_add.cache_clear()


@pytest.fixture(autouse=True)
def _rows_interp(monkeypatch):
    """Force rows mode at every K and pallas interpreter execution; the
    XLA reference path stays pallas-free (LIBECC_TPU_PALLAS=0)."""
    monkeypatch.setenv("LIBECC_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("LIBECC_TPU_PALLAS_ROWS", "1")
    monkeypatch.setenv("LIBECC_TPU_PALLAS", "0")
    _clear_builder_caches()
    yield
    _clear_builder_caches()


def _rand_fp(ctx, rng, n=N):
    nb = (ctx.p_int.bit_length() + 15) // 8
    vals = [int.from_bytes(rng.bytes(nb), "big") % ctx.p_int
            for _ in range(n)]
    return jnp.asarray(nn.batch_to_limbs(vals, ctx.k))


@pytest.mark.parametrize("curve_name", ["SECP256R1", "BRAINPOOLP512R1"])
def test_mont_mul_sqr_rows_bitexact(curve_name):
    ctx = params.get_curve(curve_name).fp_ctx
    rng = np.random.RandomState(7)
    a = nn.to_mont(_rand_fp(ctx, rng), ctx)
    b = nn.to_mont(_rand_fp(ctx, rng), ctx)
    # canonical inputs
    ref = nn.mont_mul_relaxed(a, b, ctx)
    got = pmont.mont_mul_relaxed(a, b, ctx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # relaxed inputs (chain a second multiply off the first's output)
    ref2 = nn.mont_mul_relaxed(ref, ref, ctx)
    got2 = pmont.mont_sqr_relaxed(got, ctx)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))


def _w_point_batch(curve, rng, offset=1):
    """Batch of distinct small generator multiples, tiled to N lanes,
    pushed through one XLA double so z != 1."""
    hc = hostref.WCurve(curve.fp_ctx.p_int, curve.a, curve.b,
                        curve.gx, curve.gy, curve.q)
    G = (curve.gx, curve.gy)
    pts = []
    P = G
    for i in range(8):
        pts.append(P)
        P = hostref.ec_add(hc, P, G)
    xs = [pts[(i + offset) % 8][0] for i in range(N)]
    ys = [pts[(i + offset) % 8][1] for i in range(N)]
    P = curve.point_from_affine_ints(xs, ys)
    return shortw.point_dbl(curve, P)       # XLA path (pallas disabled)


@pytest.mark.parametrize("curve_name",
                         ["SECP256R1",        # a = -3 branch, forced rows
                          ] + (["SECP256K1",  # a = 0 branch
                                "BRAINPOOLP512R1",  # generic a, K = 37
                                ] if FULL else []))
def test_w_point_rows_bitexact(curve_name):
    curve = params.get_curve(curve_name)
    rng = np.random.RandomState(11)
    P = _w_point_batch(curve, rng, 0)
    Q = _w_point_batch(curve, rng, 3)
    ref = shortw.point_add(curve, P, Q)
    got = ppoint.point_add(curve, P, Q)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    ref = shortw.point_dbl(curve, P)
    got = ppoint.point_dbl(curve, P)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    if not FULL:
        return          # the fused scan-step kernel is FULL-tier (3
        # formulas in one interpret-mode kernel — minutes of CPU)
    refp = P
    for _ in range(2):
        refp = shortw.point_dbl(curve, refp)
    refp = shortw.point_add(curve, refp, Q)
    gotp = ppoint.point_dbln_add(curve, P, Q, 2)
    for r, g in zip(refp, gotp):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def _ed_point_batch(curve, rng, offset=1):
    hc = hostref.EdCurve(curve.fp_ctx.p_int, curve.a, curve.d,
                         curve.gx, curve.gy, curve.q, 1)
    G = (curve.gx, curve.gy)
    pts = []
    P = G
    for i in range(8):
        pts.append(P)
        P = hostref.ed_add(hc, P, G)
    xs = [pts[(i + offset) % 8][0] for i in range(N)]
    ys = [pts[(i + offset) % 8][1] for i in range(N)]
    P = curve.point_from_affine_ints(xs, ys)
    return edw.point_dbl(curve, P)          # XLA path; z != 1, real t


@pytest.mark.parametrize("curve_name",
                         ["ED25519",             # a = -1 branch
                          ] + (["ED448"] if FULL else []))  # a=1, K=32
def test_ed_point_rows_bitexact(curve_name):
    curve = edw.get_edwards_curve(curve_name)
    rng = np.random.RandomState(13)
    P = _ed_point_batch(curve, rng, 0)
    Q = _ed_point_batch(curve, rng, 5)
    ref = edw.point_add(curve, P, Q)
    got = pedpoint.point_add(curve, P, Q)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    ref = edw.point_dbl(curve, P)
    got = pedpoint.point_dbl(curve, P)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    if not FULL:
        return
    refp = P
    for _ in range(2):
        refp = edw.point_dbl(curve, refp)
    refp = edw.point_add(curve, refp, Q)
    gotp = pedpoint.point_dbln_add(curve, P, Q, 2)
    for r, g in zip(refp, gotp):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
