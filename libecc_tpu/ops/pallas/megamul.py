"""Whole-scalar-mult Pallas mega-kernel: the entire windowed multiply
(and the Straus dual multiply) as ONE kernel with the per-lane table
resident in VMEM.

Why: the scan formulation (curves/scalar_mul.py windowed_mul_public /
straus_double_mul_public_w4) already fuses each window step into one
dbln_add kernel, but between steps the accumulator round-trips HBM and —
much worse — the table select (_table_gather) re-reads the whole
(2^w, ncoord, K, N) table from HBM every window: ~16*3*K*N*4 bytes *
nwin ≈ 2 GB of HBM traffic per 256-bit multiply at N=8192. This kernel
loads the table block once per batch tile, keeps the accumulator in the
output VMEM block across all windows, and runs a lax.fori_loop over the
window schedule inside the kernel, so Mosaic code size stays at ONE
window body regardless of scalar length.

Math is bit-identical to the scan path: same _build_mul_table entries,
same MSW-first digit schedule, same dbl/add formula bodies (point.py /
edpoint.py), same masked-sum table select semantics. Differential tests
(tests/test_pallas_megamul.py) assert lane-for-lane equality against the
XLA path in interpreter mode.

Reference analog: the windowed/Straus public-scalar engines of
src/curves/prj_pt.c:1835+ — here restructured so the hot loop never
leaves VMEM.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...nn import core as nn
from .mont import SUBLANES, LANES, BLOCK, MAX_PALLAS_LIMBS, _interp
from . import point as wpoint
from . import edpoint
from .point import _make_ops, _row_scratch, _use_rows

# VMEM budget (bytes): real VMEM is ~16 MB/core; Pallas double-buffers
# the in/out blocks across grid steps (the 2x in _vmem_bytes), so the
# budget leaves headroom for Mosaic's own temporaries. Configs over
# budget fall back to the XLA scan path (w=4 Straus at 256 bits and
# Ed448/512-bit windowed land there; the P-256/Ed25519 verify hot path
# fits comfortably).
VMEM_BUDGET = 13 * 1024 * 1024


def _select_entry(tab_ref, d, k, tw, rows):
    """Constant-schedule table lookup inside the kernel: one-hot masked
    sum over the tw entries (the in-VMEM analog of scalar_mul's
    _table_gather — every lane touches every entry identically).
    tab_ref: (tw*k, S, L) coord limbs, entry e at rows [e*k, e*k+k);
    d: (S, L) int32 digits. Returns a field element in backend rep."""
    acc = None
    for e in range(tw):
        m = (d == jnp.int32(e)).astype(jnp.uint32)
        if rows:
            ent = tab_ref[pl.ds(e * k, k)] * m[None]
            acc = ent if acc is None else acc + ent
        else:
            ent = [tab_ref[e * k + i] * m for i in range(k)]
            acc = ent if acc is None else [a + x for a, x in zip(acc, ent)]
    return acc


def _felem_const(limbs, k, rows):
    """Identity-coordinate constant in backend rep (scalar constants
    only — Pallas kernels cannot capture array constants)."""
    if rows:
        # full-shape concat-of-splats (see rows.RowOps.const: Mosaic
        # lowers neither the 1-D->3-D reshape nor a (K,1,1) broadcast)
        return jnp.concatenate(
            [jnp.full((1, SUBLANES, LANES), np.uint32(int(v)))
             for v in limbs], axis=0)
    return [jnp.full((SUBLANES, LANES), np.uint32(int(v)))
            for v in limbs]


@functools.lru_cache(maxsize=None)
def _build_kern(curve_key, k, w, nwin, model, npairs):
    """Construct the kernel function (and its layout metadata) for one
    (curve, window, schedule) configuration. Split from _build so the
    differential tests can drive the EXACT kernel body eagerly through
    fake refs (tests/test_pallas_megamul.py) — interpret-mode compiles
    of the whole multi-formula kernel take tens of minutes on CPU.

    model: 'w' (short-Weierstrass projective, 3 coords) or 'ed'
    (twisted-Edwards extended, 4 coords). npairs: number of
    (table, digits) pairs folded per window (1 = plain windowed mult,
    2 = Straus dual mult)."""
    if model == "ed":
        from ...curves import edwards as edc
        curve = edc.get_edwards_curve(curve_key)
        C = edpoint._consts(curve)
        dblf, addf = edpoint._dbl_body, edpoint._add_body
        ncoord = 4
    else:
        from ...curves import params
        curve = params.get_curve(curve_key)
        C = wpoint._curve_consts(curve)
        dblf, addf = wpoint._dbl_body, wpoint._add_body
        ncoord = 3
    ctx = curve.fp_ctx
    one = tuple(int(x) for x in nn.to_limbs(ctx.R % ctx.p_int, k))
    tw = 1 << w
    rows = _use_rows(k)

    def kern(*refs):
        digs = refs[:npairs]                       # (nwin, S, L) i32
        tabs = refs[npairs:npairs + npairs * ncoord]
        outs = refs[npairs + npairs * ncoord:
                    npairs + npairs * ncoord + ncoord]
        scratch = refs[npairs + npairs * ncoord + ncoord:]
        ops = _make_ops(C, tuple(scratch))
        # acc = identity, accumulated in the output VMEM blocks
        zero = _felem_const((0,) * k, k, rows)
        onec = _felem_const(one, k, rows)
        if model == "ed":
            init = (zero, onec, onec, zero)        # (0 : 1 : 1 : 0)
        else:
            init = (zero, onec, zero)              # (0 : 1 : 0)
        for o, v in zip(outs, init):
            ops.write(o, v)

        def body(wi, carry):
            coords = [ops.read(o) for o in outs]
            if model == "w":
                # short-Weierstrass: the window's w doublings run in
                # Jacobian coordinates (3M+5S each) with one conversion
                # each way; the table adds stay COMPLETE (point.py
                # _dbln_jac_block — identity handled by the entry select)
                coords = list(wpoint._dbln_jac_block(ops, *coords[:3], w))
            else:
                for _ in range(w):
                    coords = list(dblf(ops, *coords[:3]))
            for pi in range(npairs):
                d = digs[pi][wi]
                T = [_select_entry(tabs[pi * ncoord + c], d, k, tw, rows)
                     for c in range(ncoord)]
                coords = list(addf(ops, *coords, *T))
            for o, v in zip(outs, coords):
                ops.write(o, v)
            return carry

        _LOOP(0, nwin, body, 0)

    return kern, ncoord, tw, rows


# Window-loop strategy hook: Mosaic compiles the fori_loop to ONE window
# body (code size O(1) in scalar length). The differential tests swap in
# a trace-time-unrolled loop to drive the kernel eagerly via fake refs.
_LOOP = jax.lax.fori_loop


@functools.lru_cache(maxsize=None)
def _build(curve_key, k, w, nwin, model, npairs):
    """pallas_call wrapper around the kernel from _build_kern."""
    kern, ncoord, tw, rows = _build_kern(curve_key, k, w, nwin, model,
                                         npairs)

    def call(tables, digs):
        """tables: npairs arrays (tw, ncoord, K, N) from _build_mul_table;
        digs: npairs arrays (nwin, N) int32 MSW-first window digits."""
        n = digs[0].shape[-1]
        g = n // BLOCK
        nrow = n // LANES
        dig_args = [d.reshape(nwin, nrow, LANES) for d in digs]
        tab_args = []
        for t in tables:
            for c in range(ncoord):
                tab_args.append(t[:, c].reshape(tw * k, nrow, LANES))
        dspec = pl.BlockSpec((nwin, SUBLANES, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        tspec = pl.BlockSpec((tw * k, SUBLANES, LANES),
                             lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((k, SUBLANES, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        sds = jax.ShapeDtypeStruct((k, nrow, LANES), jnp.uint32)
        outs = pl.pallas_call(
            kern, grid=(g,),
            in_specs=[dspec] * npairs + [tspec] * (npairs * ncoord),
            out_specs=(ospec,) * ncoord,
            out_shape=(sds,) * ncoord,
            scratch_shapes=_row_scratch(k) if rows else [],
            interpret=_interp(),
        )(*dig_args, *tab_args)
        return tuple(o.reshape(k, n) for o in outs)

    return call


def _vmem_bytes(k, w, nwin, ncoord, npairs):
    tile = SUBLANES * LANES * 4
    tables = npairs * ncoord * (1 << w) * k * tile
    digits = npairs * nwin * tile
    outs = ncoord * k * tile
    scratch = (3 * k + 1) * tile
    # in/out blocks are double-buffered across grid steps
    return 2 * (tables + digits + outs) + scratch


def supported(curve, P, w: int, nwin: int, npairs: int = 1) -> bool:
    ncoord = len(P)
    k = curve.fp_ctx.k
    return (P.x.ndim == 2 and P.x.shape[-1] % BLOCK == 0
            and (nn.LIMB_BITS == 15 or _use_rows(k))
            and k <= MAX_PALLAS_LIMBS
            and getattr(curve.fp_ctx, "relaxed_ok", False)
            and _vmem_bytes(k, w, nwin, ncoord, npairs) <= VMEM_BUDGET)


def windowed_mul(curve, table, digs, point_cls, model: str, w: int):
    """Whole windowed m*P: table (tw, ncoord, K, N) per-lane multiples,
    digs (nwin, N) MSW-first w-bit digits."""
    call = _build(curve.name, curve.fp_ctx.k, w, digs.shape[0], model, 1)
    return point_cls(*call((table,), (digs,)))


def straus_mul(curve, ptab, du, qtab, dv, point_cls, model: str, w: int):
    """Whole Straus u*P + v*Q with separate per-base tables."""
    call = _build(curve.name, curve.fp_ctx.k, w, du.shape[0], model, 2)
    return point_cls(*call((ptab, qtab), (du, dv)))
