"""Differential tests for the whole-scalar-mult Pallas mega-kernel
(ops/pallas/megamul.py).

Contract: bit-identical to the XLA scan formulation (windowed_mul_public
/ straus_double_mul_public_w4 with Pallas disabled) — same table, same
digit schedule, same formula bodies.

Tiering: interpret-mode compiles of the whole multi-formula kernel cost
tens of minutes of CPU per configuration (XLA:CPU state-discharge blowup
— even one window at K=3 trips the slow-compile alarm), so the DEFAULT
tier drives the EXACT kernel body (megamul._build_kern) eagerly through
fake refs on tiny registered curves (p=8191, K=3) with FULL-WIDTH
scalars. That covers everything the mega-kernel adds over the already
TPU-validated formula kernels: the window schedule, the in-kernel
masked-sum table select, accumulator init/read-modify-write, digit
indexing — all K-independent logic. What it cannot cover (pallas_call
BlockSpec plumbing, Mosaic lowering of the fori_loop) is exercised by
the FULL tier's real interpret-mode pallas_call runs and authoritatively
by scripts/validate_megamul.py on TPU hardware.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

FULL = os.environ.get("LIBECC_TPU_FULL", "0") == "1"

from libecc_tpu.curves import params, scalar_mul
from libecc_tpu.curves import edwards as edw
from libecc_tpu.nn import core as nn
from libecc_tpu.ops.pallas import megamul, mont as pmont

N = pmont.BLOCK

# Tiny test curves over p = 8191 (13-bit): K = 3 limbs with full relaxed
# headroom. W-curve: a=-3, b=3, PRIME order 8221, G=(1,1). Edwards:
# a=1 (a square, so the unified formulas are complete), d=14 (a
# non-square), order 4*2027, G=(846,3020) of prime order 2027. Derived
# by exhaustive point count; they exist only for kernel testing.
P_TINY = 8191
params.register_curve("TESTW13", P_TINY, P_TINY - 3, 3, 1, 1, 8221)
edw.register_edwards("TESTED13", P_TINY, 1, 14, 846, 3020, 2027, 4)


@pytest.fixture(autouse=True)
def _xla_reference_mode(monkeypatch):
    """Tables, digit schedule and the XLA reference run with Pallas
    disabled; FULL-tier kernel invocations run in interpreter mode."""
    monkeypatch.setenv("LIBECC_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("LIBECC_TPU_PALLAS", "0")
    megamul._build.cache_clear()
    yield
    megamul._build.cache_clear()


class _FakeRef:
    """VMEM-ref stand-in for eager kernel-body execution: integer
    indexing over axis 0, mutable (the tile backend's access pattern)."""

    def __init__(self, arr):
        self._l = [arr[i] for i in range(arr.shape[0])]

    def __getitem__(self, i):
        return self._l[i]

    def __setitem__(self, i, v):
        self._l[i] = v

    def stacked(self):
        return jnp.stack(self._l)


def _run_kern_fake(curve, w, model, npairs, tables, digs, monkeypatch):
    """Execute the exact kernel body eagerly: fake refs + trace-time
    window loop. Single grid block (n == BLOCK)."""
    k = curve.fp_ctx.k
    nwin = digs[0].shape[0]
    kern, ncoord, tw, rows = megamul._build_kern(
        curve.name, k, w, nwin, model, npairs)
    assert not rows, "fake-ref harness drives the tile backend"
    n = digs[0].shape[-1]
    nrow = n // pmont.LANES
    assert nrow == pmont.SUBLANES, "single-block harness needs n == BLOCK"
    dig_refs = [_FakeRef(d.reshape(nwin, nrow, pmont.LANES)) for d in digs]
    tab_refs = []
    for t in tables:
        for c in range(ncoord):
            tab_refs.append(
                _FakeRef(t[:, c].reshape(tw * k, nrow, pmont.LANES)))
    out_refs = [_FakeRef(jnp.zeros((k, nrow, pmont.LANES), jnp.uint32))
                for _ in range(ncoord)]
    monkeypatch.setattr(
        megamul, "_LOOP",
        lambda lo, hi, body, init: ([body(i, init) for i in range(hi)],
                                    init)[1])
    kern(*dig_refs, *tab_refs, *out_refs)
    return tuple(o.stacked().reshape(k, n) for o in out_refs)


def _scalars(rng, nbits, n=N):
    vals = [rng.randrange(1 << nbits) for _ in range(n)]
    k = max(-(-nbits // nn.LIMB_BITS), 1)
    return jnp.asarray(nn.batch_to_limbs(vals, k))


def _w_points(curve, n=N):
    from libecc_tpu.ref import hostref
    hc = hostref.WCurve(curve.fp_ctx.p_int, curve.a, curve.b,
                        curve.gx, curve.gy, curve.q)
    pts, P = [], (curve.gx, curve.gy)
    for _ in range(8):
        pts.append(P)
        P = hostref.ec_add(hc, P, (curve.gx, curve.gy))
    xs = [pts[i % 8][0] for i in range(n)]
    ys = [pts[i % 8][1] for i in range(n)]
    return curve.point_from_affine_ints(xs, ys)


def _ed_points(curve, n=N):
    from libecc_tpu.ref import hostref
    hc = hostref.EdCurve(curve.fp_ctx.p_int, curve.a, curve.d,
                         curve.gx, curve.gy, curve.q, 1)
    pts, P = [], (curve.gx, curve.gy)
    for _ in range(8):
        pts.append(P)
        P = hostref.ed_add(hc, P, (curve.gx, curve.gy))
    xs = [pts[i % 8][0] for i in range(n)]
    ys = [pts[i % 8][1] for i in range(n)]
    return curve.point_from_affine_ints(xs, ys)


# ---------------------------------------------------------------------------
# Default tier: exact kernel body via fake refs, tiny curves, full-width
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("model", ["w", "ed"])
def test_megamul_kern_bitexact_windowed(model, monkeypatch):
    import random
    rng = random.Random(21)
    if model == "w":
        curve = params.get_curve("TESTW13")
        P = _w_points(curve)
    else:
        curve = edw.get_edwards_curve("TESTED13")
        P = _ed_points(curve)
    nbits, w = curve.q.bit_length(), 4
    m = _scalars(rng, nbits)
    ref = scalar_mul.windowed_mul_public(curve, m, P, nbits=nbits, w=w)
    table = scalar_mul._build_mul_table(curve, P, 1 << w)
    digs = scalar_mul._window_digits(m, nbits, w)
    assert megamul.supported(curve, P, w, digs.shape[0])
    got = _run_kern_fake(curve, w, model, 1, (table,), (digs,),
                         monkeypatch)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_megamul_kern_bitexact_straus(monkeypatch):
    """Dual-table Straus kernel body vs a bit-identical manual XLA
    schedule (w=3, the width the dispatch picks at 256 bits)."""
    curve = params.get_curve("TESTW13")
    import random
    rng = random.Random(29)
    nbits, w = curve.q.bit_length(), 3
    u = _scalars(rng, nbits)
    v = _scalars(rng, nbits)
    P = _w_points(curve)
    from libecc_tpu.curves import shortw
    Q = shortw.point_dbl(curve, P)
    ptab = scalar_mul._build_mul_table(curve, P, 1 << w)
    qtab = scalar_mul._build_mul_table(curve, Q, 1 << w)
    du = scalar_mul._window_digits(u, nbits, w)
    dv = scalar_mul._window_digits(v, nbits, w)
    cls = type(P)
    acc = curve.pinf(like=P)
    for wi in range(du.shape[0]):
        # the scan-step doubling block (Jacobian inside, complete adds)
        acc = shortw.point_dbln_jac(curve, acc, w)
        acc = shortw.point_add(curve, acc, scalar_mul._table_gather(
            cls, ptab, du[wi]))
        acc = shortw.point_add(curve, acc, scalar_mul._table_gather(
            cls, qtab, dv[wi]))
    assert megamul.supported(curve, P, w, du.shape[0], npairs=2)
    got = _run_kern_fake(curve, w, "w", 2, (ptab, qtab), (du, dv),
                         monkeypatch)
    for r, g in zip(acc, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_vmem_budget_forces_w3_dual_tables():
    """On a 256-bit curve the dual w=4 tables exceed the VMEM budget;
    w=3 fits (the straus_double_mul_public_w4 dispatch order)."""
    curve = params.get_curve("SECP256R1")
    P = _w_points(curve)
    assert not megamul.supported(curve, P, 4, 64, npairs=2)
    assert megamul.supported(curve, P, 3, 86, npairs=2)


def test_dispatch_wiring(monkeypatch):
    """The verify hot path (windowed_mul_public) routes through megamul
    when Pallas is enabled and the config is supported."""
    curve = params.get_curve("SECP256R1")
    P = _w_points(curve)
    assert scalar_mul._megamul_dispatch(curve, P, 4, 64) is None  # off
    monkeypatch.setenv("LIBECC_TPU_PALLAS", "1")
    got = scalar_mul._megamul_dispatch(curve, P, 4, 64)
    assert got is not None and got[1] == "w"


# ---------------------------------------------------------------------------
# FULL tier: real interpret-mode pallas_call (slow: minutes-hours on CPU)
# ---------------------------------------------------------------------------

def _check_windowed_pallas(curve, P, m, nbits, w, model):
    ref = scalar_mul.windowed_mul_public(curve, m, P, nbits=nbits, w=w)
    table = scalar_mul._build_mul_table(curve, P, 1 << w)
    digs = scalar_mul._window_digits(m, nbits, w)
    assert megamul.supported(curve, P, w, digs.shape[0])
    got = megamul.windowed_mul(curve, table, digs, type(P), model, w)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


@pytest.mark.skipif(not FULL, reason="interpret-mode pallas_call: FULL tier")
@pytest.mark.parametrize("curve_name", ["TESTW13", "SECP256R1"])
def test_windowed_megamul_pallas_interpret(curve_name):
    curve = params.get_curve(curve_name)
    import random
    rng = random.Random(31)
    nbits = 8 if curve_name != "TESTW13" else curve.q.bit_length()
    m = _scalars(rng, nbits)
    P = _w_points(curve)
    _check_windowed_pallas(curve, P, m, nbits, 4, "w")


@pytest.mark.skipif(not FULL, reason="rows backend interpret: FULL tier")
def test_windowed_megamul_rows_backend(monkeypatch):
    monkeypatch.setenv("LIBECC_TPU_PALLAS_ROWS", "1")
    megamul._build.cache_clear()
    curve = params.get_curve("TESTW13")
    import random
    rng = random.Random(37)
    m = _scalars(rng, 8)
    P = _w_points(curve)
    _check_windowed_pallas(curve, P, m, 8, 4, "w")
