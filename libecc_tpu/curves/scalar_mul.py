"""Batched scalar multiplication: constant-schedule ladder + public-input
windowed multi-scalar paths.

TPU-native analog of the reference scalar-mult engines
(src/curves/prj_pt.c:1569 Montgomery ladder, :1835 unprotected public mult).
Design split (BASELINE north star): *secret* scalars (signing, key gen,
ECDH) take the fixed-schedule Montgomery ladder — under jit every lane
executes the identical instruction schedule, the lane-local bit only drives
vector selects, so the schedule is data-independent by construction.
*Public* scalars (verification) take throughput paths (Straus/Shamir
interleaved double-scalar with per-lane window tables) that the reference
only approaches via Bos-Coster batch verification.

All loops are `lax.scan` over bit/window schedules so the traced graph stays
one body deep regardless of scalar length.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..fp import field as fp
from .shortw import (PrjPoint, ShortWCurve, point_add, point_dbl,
                     point_select, point_neg, is_infinity_mask)


def _pstack(P: PrjPoint):
    return jnp.stack(P, axis=0)           # (3, K, *batch)


def _punstack(a):
    return PrjPoint(a[0], a[1], a[2])


def ladder_mul(c: ShortWCurve, m, P: PrjPoint, nbits: int | None = None) -> PrjPoint:
    """Montgomery-ladder m*P with a fixed nbits-iteration schedule.

    m: scalar limb tensor uint32[Km, *batch] (plain domain, < 2^nbits).
    Complete formulas make the R0=infinity start well-defined, which
    replaces the reference's m' = m+q MSB-fixing trick (prj_pt.c:1239-1259):
    our schedule length is already data-independent.
    Reference: _prj_pt_mul_ltr_monty_ladder (prj_pt.c:1569).
    """
    if nbits is None:
        nbits = c.q.bit_length()
    bits = nn.bits_msb_first(m, nbits)          # (nbits, *batch)
    R0 = c.infinity(like=P)
    R1 = P

    def step(carry, bit):
        r0, r1 = _punstack(carry[0]), _punstack(carry[1])
        bmask = bit.astype(bool)
        s0 = point_select(bmask, r1, r0)
        s1 = point_select(bmask, r0, r1)
        t1 = point_add(c, s0, s1)
        t0 = point_dbl(c, s0)
        r0n = point_select(bmask, t1, t0)
        r1n = point_select(bmask, t0, t1)
        return (_pstack(r0n), _pstack(r1n)), None

    (r0, _), _ = jax.lax.scan(step, (_pstack(R0), _pstack(R1)), bits)
    return _punstack(r0)


def double_add_always_mul(c: ShortWCurve, m, P: PrjPoint,
                          nbits: int | None = None) -> PrjPoint:
    """Double-and-add-always (reference: prj_pt.c:1317) — parity with the
    reference's USE_DOUBLE_ADD_ALWAYS configuration; on TPU both engines
    have identical (fixed) schedules."""
    if nbits is None:
        nbits = c.q.bit_length()
    bits = nn.bits_msb_first(m, nbits)
    acc = c.infinity(like=P)

    def step(carry, bit):
        accp = _punstack(carry)
        accp = point_dbl(c, accp)
        added = point_add(c, accp, P)
        accp = point_select(bit.astype(bool), added, accp)
        return _pstack(accp), None

    out, _ = jax.lax.scan(step, _pstack(acc), bits)
    return _punstack(out)


# ---------------------------------------------------------------------------
# Tables and window digits
# ---------------------------------------------------------------------------

def _window_digits(m, nbits: int, w: int):
    """Split scalar into windows, MSW first: int32[nwin, *batch]."""
    nwin = -(-nbits // w)
    digs = []
    for widx in range(nwin - 1, -1, -1):
        lo = widx * w
        d = jnp.zeros(m.shape[1:], jnp.int32)
        for j in range(w):
            if lo + j < nbits:
                d = d | (nn.get_bit(m, lo + j).astype(jnp.int32) << j)
        digs.append(d)
    return jnp.stack(digs, axis=0)


def _build_mul_table(c: ShortWCurve, P: PrjPoint, size: int):
    """[0..size-1]P as a stacked array (size, 3, K, *batch)."""
    table = [c.infinity(like=P), P]
    for i in range(2, size):
        table.append(point_dbl(c, table[i // 2]) if i % 2 == 0
                     else point_add(c, table[i - 1], P))
    return jnp.stack([_pstack(t) for t in table], axis=0)


def _table_gather(table, idx):
    """table: (T, 3, K, *batch); idx: int32[*batch] -> PrjPoint.
    Per-lane gather along the table axis (the batched analog of the
    reference's CT nn_tabselect, src/nn/nn.c:564)."""
    bshape = idx.shape
    idxb = idx.reshape((1, 1, 1) + bshape)
    idxb = jnp.broadcast_to(idxb, (1,) + table.shape[1:])
    picked = jnp.take_along_axis(table, idxb, axis=0)[0]
    return _punstack(picked)


def windowed_mul_public(c: ShortWCurve, m, P: PrjPoint, nbits: int | None = None,
                        w: int = 4) -> PrjPoint:
    """Fixed-window m*P for public scalars. Precomputes [0..2^w-1]P per lane,
    then scans nbits/w windows of (w doublings + 1 table-add)."""
    if nbits is None:
        nbits = c.q.bit_length()
    table = _build_mul_table(c, P, 1 << w)
    digs = _window_digits(m, nbits, w)
    acc = c.infinity(like=P)

    def step(carry, d):
        accp = _punstack(carry)
        for _ in range(w):
            accp = point_dbl(c, accp)
        accp = point_add(c, accp, _table_gather(table, d))
        return _pstack(accp), None

    out, _ = jax.lax.scan(step, _pstack(acc), digs)
    return _punstack(out)


def straus_double_mul_public(c: ShortWCurve, u, P: PrjPoint, v, Q: PrjPoint,
                             nbits: int | None = None, w: int = 2) -> PrjPoint:
    """u*P + v*Q interleaved (Straus-Shamir), public scalars.

    The workhorse of batched verification: replaces the reference's two
    hardened ladders + add (ecdsa_common.c:788-796) with one shared-doubling
    pass over a joint per-lane table T[i,j] = iP + jQ.
    Cost ~ nbits doublings + (nbits/w) table-adds.
    """
    if nbits is None:
        nbits = c.q.bit_length()
    tw = 1 << w
    ptab = _build_mul_table(c, P, tw)       # (tw, 3, K, *b)
    qtab = _build_mul_table(c, Q, tw)
    rows = []
    for i in range(tw):
        Pi = _punstack(ptab[i])
        for j in range(tw):
            if i == 0:
                rows.append(qtab[j])
            elif j == 0:
                rows.append(ptab[i])
            else:
                rows.append(_pstack(point_add(c, Pi, _punstack(qtab[j]))))
    table = jnp.stack(rows, axis=0)          # (tw*tw, 3, K, *b)

    du = _window_digits(u, nbits, w)
    dv = _window_digits(v, nbits, w)
    acc = c.infinity(like=P)

    def step(carry, dd):
        d_u, d_v = dd
        accp = _punstack(carry)
        for _ in range(w):
            accp = point_dbl(c, accp)
        accp = point_add(c, accp, _table_gather(table, d_u * tw + d_v))
        return _pstack(accp), None

    out, _ = jax.lax.scan(step, _pstack(acc), (du, dv))
    return _punstack(out)
