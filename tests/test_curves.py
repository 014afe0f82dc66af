"""Differential tests of the curve layer vs the host (Python int) oracle.

Covers: complete-formula add/dbl, infinity/edge cases, constant-schedule
ladder, double-add-always, public windowed and Straus multiplication —
the TPU analogs of the reference's prj_pt engines (src/curves/prj_pt.c).
"""

import random

import numpy as np
import jax
import pytest

from libecc_tpu.curves import params, shortw, scalar_mul
from libecc_tpu.nn import core as nn
from libecc_tpu.ref import hostref

# nightly tier (multi-curve sweeps); smoke skips, LIBECC_TPU_FULL=1 runs
# Tier note: whole-file slow marks left every subsystem out of the
# default run (round-4 verdict); now only the expensive cases are
# nightly-tier, and one cheap representative per subsystem stays
# in the default (smoke) tier.

N = 4


@pytest.fixture(scope="module", params=["SECP256R1", "SECP256K1"])
def setup(request):
    c = params.get_curve(request.param)
    rc = hostref.WCurve(p=c.fp_ctx.p_int, a=c.a, b=c.b, gx=c.gx, gy=c.gy, q=c.q)
    r = random.Random(11)
    ks = [r.randrange(1, c.q) for _ in range(N)]
    ls = [r.randrange(1, c.q) for _ in range(N)]
    G = (c.gx, c.gy)
    Ps = [hostref.ec_mul(rc, k, G) for k in ks]
    Qs = [hostref.ec_mul(rc, l, G) for l in ls]
    Pd = c.point_from_affine_ints([p[0] for p in Ps], [p[1] for p in Ps])
    Qd = c.point_from_affine_ints([q[0] for q in Qs], [q[1] for q in Qs])
    return c, rc, ks, ls, Ps, Qs, Pd, Qd


def _affine(c, P):
    x, y, inf = shortw.to_affine(c, P)
    return c.fp_ctx.to_ints(x), c.fp_ctx.to_ints(y), np.asarray(inf)


def test_add_dbl(setup):
    c, rc, ks, ls, Ps, Qs, Pd, Qd = setup
    addf = jax.jit(lambda P, Q: shortw.to_affine(c, shortw.point_add(c, P, Q)))
    x, y, _ = addf(Pd, Qd)
    xs, ys = c.fp_ctx.to_ints(x), c.fp_ctx.to_ints(y)
    for i in range(N):
        assert (xs[i], ys[i]) == hostref.ec_add(rc, Ps[i], Qs[i])

    dblf = jax.jit(lambda P: shortw.to_affine(c, shortw.point_dbl(c, P)))
    x, y, _ = dblf(Pd)
    xs, ys = c.fp_ctx.to_ints(x), c.fp_ctx.to_ints(y)
    for i in range(N):
        assert (xs[i], ys[i]) == hostref.ec_add(rc, Ps[i], Ps[i])


@pytest.mark.slow
def test_complete_formula_edge_cases(setup):
    c, rc, ks, ls, Ps, Qs, Pd, Qd = setup
    # P + (-P) = infinity
    f = jax.jit(lambda P: shortw.to_affine(
        c, shortw.point_add(c, P, shortw.point_neg(c, P))))
    _, _, inf = f(Pd)
    assert bool(np.asarray(inf).all())
    # P + inf = P ; dbl(inf) = inf ; add(P, P) handled by complete add
    Inf = c.infinity(like=Pd)
    addf = jax.jit(lambda P, Q: shortw.to_affine(c, shortw.point_add(c, P, Q)))
    x, _, _ = addf(Pd, Inf)
    assert c.fp_ctx.to_ints(x) == [p[0] for p in Ps]
    _, _, inf = jax.jit(
        lambda P: shortw.to_affine(c, shortw.point_dbl(c, P)))(Inf)
    assert bool(np.asarray(inf).all())
    x, _, _ = addf(Pd, Pd)   # add with P==Q must equal dbl
    for got, (px, py) in zip(c.fp_ctx.to_ints(x), Ps):
        assert got == hostref.ec_add(rc, (px, py), (px, py))[0]


def test_on_curve_mask(setup):
    c, rc, ks, ls, Ps, Qs, Pd, Qd = setup
    ok = np.asarray(jax.jit(lambda P: shortw.on_curve_mask(c, P))(Pd))
    assert ok.all()
    bad = shortw.PrjPoint(Pd.y, Pd.x, Pd.z)  # swap x/y: not on curve
    ok = np.asarray(jax.jit(lambda P: shortw.on_curve_mask(c, P))(bad))
    assert not ok.any()


@pytest.mark.parametrize("engine", ["ladder", "daa", "windowed"])
@pytest.mark.slow
def test_scalar_mult_engines(setup, engine):
    c, rc, ks, ls, Ps, Qs, Pd, Qd = setup
    fn = {"ladder": scalar_mul.ladder_mul,
          "daa": scalar_mul.double_add_always_mul,
          "windowed": scalar_mul.windowed_mul_public}[engine]
    f = jax.jit(lambda m, P: shortw.to_affine(c, fn(c, m, P)))
    m = nn.batch_to_limbs(ks, c.q_ctx.k)
    Gb = c.generator(batch_shape=(N,))
    x, y, _ = f(m, Gb)
    xs, ys = c.fp_ctx.to_ints(x), c.fp_ctx.to_ints(y)
    for i in range(N):
        assert (xs[i], ys[i]) == Ps[i], engine


@pytest.mark.slow
def test_scalar_mult_edge_scalars(setup):
    c, rc, ks, ls, Ps, Qs, Pd, Qd = setup
    ms = [1, 2, c.q - 1, c.q - 2]
    m = nn.batch_to_limbs(ms, c.q_ctx.k)
    Gb = c.generator(batch_shape=(len(ms),))
    f = jax.jit(lambda m, P: shortw.to_affine(c, scalar_mul.ladder_mul(c, m, P)))
    x, y, _ = f(m, Gb)
    xs, ys = c.fp_ctx.to_ints(x), c.fp_ctx.to_ints(y)
    for i, mi in enumerate(ms):
        assert (xs[i], ys[i]) == hostref.ec_mul(rc, mi, (c.gx, c.gy))


@pytest.mark.parametrize("secret", [True, False])
@pytest.mark.slow
def test_fixed_base_comb(setup, secret):
    """Comb k*G (secret select-chain + public gather) vs host oracle,
    including edge scalars 1 and q-1."""
    c, rc, ks, ls, Ps, Qs, Pd, Qd = setup
    ms = ks[:2] + [1, c.q - 1]
    m = nn.batch_to_limbs(ms, c.q_ctx.k)
    f = jax.jit(lambda m: shortw.to_affine(
        c, scalar_mul.fixed_base_mul(c, m, secret=secret)))
    x, y, _ = f(m)
    xs, ys = c.fp_ctx.to_ints(x), c.fp_ctx.to_ints(y)
    for i, mi in enumerate(ms):
        assert (xs[i], ys[i]) == hostref.ec_mul(rc, mi, (c.gx, c.gy))


@pytest.mark.slow
def test_fixed_base_double_mul(setup):
    c, rc, ks, ls, Ps, Qs, Pd, Qd = setup
    f = jax.jit(lambda u, v, Q: shortw.to_affine(
        c, scalar_mul.fixed_base_double_mul_public(c, u, v, Q)))
    u = nn.batch_to_limbs(ks, c.q_ctx.k)
    v = nn.batch_to_limbs(ls, c.q_ctx.k)
    x, y, _ = f(u, v, Qd)
    xs, ys = c.fp_ctx.to_ints(x), c.fp_ctx.to_ints(y)
    for i in range(N):
        want = hostref.ec_add(rc, Ps[i], hostref.ec_mul(rc, ls[i], Qs[i]))
        assert (xs[i], ys[i]) == want


@pytest.mark.slow
def test_straus_double_mul(setup):
    c, rc, ks, ls, Ps, Qs, Pd, Qd = setup
    f = jax.jit(lambda u, P, v, Q: shortw.to_affine(
        c, scalar_mul.straus_double_mul_public(c, u, P, v, Q)))
    u = nn.batch_to_limbs(ks, c.q_ctx.k)
    v = nn.batch_to_limbs(ls, c.q_ctx.k)
    Gb = c.generator(batch_shape=(N,))
    x, y, _ = f(u, Gb, v, Qd)
    xs, ys = c.fp_ctx.to_ints(x), c.fp_ctx.to_ints(y)
    for i in range(N):
        want = hostref.ec_add(rc, Ps[i], hostref.ec_mul(rc, ls[i], Qs[i]))
        assert (xs[i], ys[i]) == want
