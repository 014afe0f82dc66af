"""Batched scalar multiplication, generic over curve models.

Works on any curve object exposing `padd`, `pdbl`, `pinf`, `scalar_bits`
(short-Weierstrass projective, twisted-Edwards extended, ...; points are
NamedTuples of limb tensors — see curves/group.py).

Reference analogs: the scalar-mult engines in src/curves/prj_pt.c
(:1569 Montgomery ladder, :1317 double-add-always, :1835 unprotected
public mult). Design split (BASELINE north star): *secret* scalars take
fixed-schedule engines (ladder / DAA) — under jit every lane executes the
identical instruction schedule and lane-local bits only drive vector
selects. *Public* scalars (verification) take throughput paths: fixed
windows and Straus/Shamir interleaving with per-lane gather tables.

All loops are `lax.scan` over bit/window schedules so the traced graph
stays one body deep regardless of scalar length.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from .group import pstack, punstack, pselect


def ladder_mul(c, m, P, nbits: int | None = None):
    """Montgomery-ladder m*P with a fixed nbits-iteration schedule.

    m: scalar limb tensor uint32[Km, *batch] (plain domain, < 2^nbits).
    Complete/unified formulas make the identity start well-defined, which
    replaces the reference's m' = m+q MSB-fixing trick (prj_pt.c:1239-1259):
    our schedule length is already data-independent.
    """
    if nbits is None:
        nbits = c.scalar_bits()
    cls = type(P)
    bits = nn.bits_msb_first(m, nbits)
    R0 = c.pinf(like=P)

    def step(carry, bit):
        r0, r1 = punstack(cls, carry[0]), punstack(cls, carry[1])
        bmask = bit.astype(bool)
        s0 = pselect(bmask, r1, r0)
        s1 = pselect(bmask, r0, r1)
        t1 = c.padd(s0, s1)
        t0 = c.pdbl(s0)
        r0n = pselect(bmask, t1, t0)
        r1n = pselect(bmask, t0, t1)
        return (pstack(r0n), pstack(r1n)), None

    (r0, _), _ = jax.lax.scan(step, (pstack(R0), pstack(P)), bits)
    return punstack(cls, r0)


def double_add_always_mul(c, m, P, nbits: int | None = None):
    """Double-and-add-always (reference: prj_pt.c:1317) — parity with the
    reference's USE_DOUBLE_ADD_ALWAYS configuration."""
    if nbits is None:
        nbits = c.scalar_bits()
    cls = type(P)
    bits = nn.bits_msb_first(m, nbits)
    acc = c.pinf(like=P)

    def step(carry, bit):
        accp = c.pdbl(punstack(cls, carry))
        added = c.padd(accp, P)
        accp = pselect(bit.astype(bool), added, accp)
        return pstack(accp), None

    out, _ = jax.lax.scan(step, pstack(acc), bits)
    return punstack(cls, out)


# ---------------------------------------------------------------------------
# Fixed-base comb multiplication (generator tables, no doublings).
#
# The generator G is host-known, so all multiples T[j][d] = d * 2^(w*j) * G
# precompute on host once per (curve, w); k*G then costs nbits/w table
# lookups + adds and ZERO doublings — the dominant win for keygen, signing
# (k*G) and the uG term of verification. For SECRET scalars the lookup is
# a constant-schedule select chain over all 2^w entries (the batched
# analog of the reference's CT nn_tabselect, src/nn/nn.c:564); public
# scalars use a plain XLA gather.
# ---------------------------------------------------------------------------

_COMB_CACHE: dict = {}


def _comb_disk_path(c, w: int, nbits: int):
    import os
    base = os.environ.get("LIBECC_TPU_COMB_CACHE",
                          "/tmp/libecc_tpu_comb_cache")
    os.makedirs(base, exist_ok=True)
    # p in the key guards against same-named user-registered curves;
    # limb width changes the stored limb layout
    tag = (f"{c.name}-{w}-{nbits}-{c.fp_ctx.p_int % (1 << 64):016x}"
           + ("" if nn.LIMB_BITS == 15 else f"-lb{nn.LIMB_BITS}"))
    return os.path.join(base, tag + ".npz")


def _comb_table_host(c, w: int, nbits: int):
    """Host-precomputed comb table as np.uint32[nwin*2^w, ncoord, K]
    (Montgomery-domain, Z=1 for affine entries, identity at d=0).
    Disk-cached across processes (8k+ host EC adds per (curve, w) —
    one-time cost; short-lived CLI runs and test processes reuse it)."""
    key = (c.name, w, nbits)
    if key in _COMB_CACHE:
        return _COMB_CACHE[key]
    path = _comb_disk_path(c, w, nbits)
    try:
        f = np.load(path)
        _COMB_CACHE[key] = (f["tab"], int(f["nwin"]), int(f["ncoord"]))
        return _COMB_CACHE[key]
    except Exception:
        pass
    from ..ref import hostref
    ctx = c.fp_ctx
    p = ctx.p_int
    nwin = -(-nbits // w)
    rows = []
    if hasattr(c, "b"):                       # short-Weierstrass
        ref = hostref.WCurve(p, c.a, c.b, c.gx, c.gy, c.q, c.h)
        base = (c.gx, c.gy)
        for j in range(nwin):
            acc = None
            for d in range(1 << w):
                if acc is None:
                    rows.append((0, 1, 0))    # identity (0:1:0)
                    acc = "init"
                elif acc == "init":
                    acc = base
                    rows.append((acc[0], acc[1], 1))
                else:
                    acc = hostref.ec_add(ref, acc, base)
                    rows.append((acc[0], acc[1], 1) if acc is not None
                                else (0, 1, 0))
            base = hostref.ec_mul(ref, 1 << w, base)
        ncoord = 3
    else:                                      # twisted Edwards (x,y,z,t)
        ref = hostref.EdCurve(p, c.a, c.d, c.gx, c.gy, c.q, c.h)
        base = (c.gx, c.gy)
        for j in range(nwin):
            acc = None
            for d in range(1 << w):
                if acc is None:
                    rows.append((0, 1, 1, 0))
                    acc = "init"
                else:
                    acc = base if acc == "init" else hostref.ed_add(
                        ref, acc, base)
                    rows.append((acc[0], acc[1], 1,
                                 acc[0] * acc[1] % p))
            base = hostref.ed_mul(ref, 1 << w, base)
        ncoord = 4
    k = ctx.k
    out = np.zeros((len(rows), ncoord, k), np.uint32)
    for r, coords in enumerate(rows):
        for ci, v in enumerate(coords):
            out[r, ci] = nn.to_limbs(v * ctx.R % p, k)
    _COMB_CACHE[key] = (out, nwin, ncoord)
    try:
        tmp = path + ".tmp%d" % os.getpid()
        np.savez(tmp, tab=out, nwin=nwin, ncoord=ncoord)
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                   path)
    except Exception:
        pass
    return _COMB_CACHE[key]


def _comb_digits(m, nbits: int, w: int, nwin: int):
    """w-bit digits, LSW first, as int32[nwin, *batch]."""
    digs = []
    for widx in range(nwin):
        lo = widx * w
        d = jnp.zeros(m.shape[1:], jnp.int32)
        for j in range(w):
            if lo + j < nbits:
                d = d | (nn.get_bit(m, lo + j).astype(jnp.int32) << j)
        digs.append(d)
    return digs


def fixed_base_mul(c, m, nbits: int | None = None, w: int = 8,
                   secret: bool = True, lam=None):
    """m*G via the comb table: nbits/w constant-time (or gathered) table
    lookups + adds, no doublings. m: uint32[Km, *batch] plain scalars.

    secret=True  -> select-chain lookups (constant schedule, every table
                    entry touched identically for every lane);
    secret=False -> same one-hot MXU matmul lookup: measured faster than
                    a per-lane row gather on TPU (gathers lower badly),
                    so the public path shares it; the flag is kept for
                    API clarity at call sites.
    lam: optional Montgomery-domain uint32[Kp, *batch] random field
    elements — projective-coordinate blinding (the reference's
    _blind_projective_point, prj_pt.c:1266): the accumulator starts from
    the lam-scaled identity representative, so every intermediate
    projective representative is randomized; the final affine divide
    removes lam. Output VALUES are unchanged.
    """
    if nbits is None:
        nbits = c.scalar_bits()
    tab_np, nwin, ncoord = _comb_table_host(c, w, nbits)
    tw = 1 << w
    n = m.shape[-1]
    k = c.fp_ctx.k
    digs = jnp.stack(_comb_digits(m, nbits, w, nwin))   # (nwin, n)
    tab = jnp.asarray(tab_np).reshape(nwin, tw, ncoord, k)
    acc = c.pinf(batch_shape=(n,))
    cls = type(acc)
    if lam is not None:
        from ..fp import field as fp
        acc = cls(*[fp.mul(coord, lam, c.fp_ctx) for coord in acc])
    iota = jnp.arange(tw, dtype=jnp.int32)

    def step(carry, xs):
        window, d = xs                        # (tw, ncoord, K), (n,)
        # constant-schedule lookup as a one-hot matmul: every lane
        # touches every table entry identically (the batched CT
        # nn_tabselect); limbs < 2^15 so the f32 product is exact
        # (exactly one nonzero term per output).
        onehot = (d[None, :] == iota[:, None]).astype(jnp.float32)
        wf = window.reshape(tw, ncoord * k).astype(jnp.float32)
        # HIGHEST precision: the TPU's default f32 matmul rounds
        # operands to bf16, which would corrupt 15-bit limbs
        sel = jax.lax.dot_general(
            wf, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        sel = sel.astype(jnp.uint32).reshape(ncoord, k, n)
        P = cls(*[sel[i] for i in range(ncoord)])
        return pstack(c.padd(punstack(cls, carry), P)), None

    out, _ = jax.lax.scan(step, pstack(acc), (tab, digs))
    return punstack(cls, out)

def fixed_base_double_mul_public(c, u, v, Q, nbits: int | None = None,
                                 w: int = 4):
    """u*G + v*Q for PUBLIC scalars: comb-gather for the fixed base G
    (zero doublings) + windowed mult for the variable base Q, one final
    add. Replaces joint Straus in verification — fewer adds and half the
    scan steps (the carry-state HBM round-trip dominates scan cost)."""
    uG = fixed_base_mul(c, u, nbits=nbits, secret=False)
    vQ = windowed_mul_public(c, v, Q, nbits=nbits, w=w)
    return c.padd(uG, vQ)


def _window_digits(m, nbits: int, w: int):
    """Split scalar into w-bit windows, MSW first: int32[nwin, *batch]."""
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


def _build_mul_table(c, P, size: int):
    """[0..size-1]P as a stacked array (size, ncoord, K, *batch).
    Levelized: each doubling level's odd adds run as ONE batched padd.

    Uses the same fused point kernels as the hot loop: the XLA formula
    path measured 3x slower END-TO-END here (the unrolled-limb XLA graph
    both compiles and runs poorly on TPU), and wrapping the kernels in
    nested jits to dedupe their traces made XLA compile ~80s slower than
    the re-traces it saved. Plain inline binds are the measured optimum
    on this stack (docs/BENCH_RCA.md)."""
    table = [c.pinf(like=P), P]
    for i in range(2, size):
        table.append(c.pdbl(table[i // 2]) if i % 2 == 0
                     else c.padd(table[i - 1], P))
    return jnp.stack([pstack(t) for t in table], axis=0)


def _table_gather(cls, table, idx):
    """table: (T, nc, K, *batch); idx: int32[*batch] -> point.
    Per-lane selection along the table axis (batched analog of the
    reference's CT nn_tabselect, src/nn/nn.c:564).

    Implemented as a one-hot masked sum, NOT take_along_axis: a dynamic
    per-lane gather lowers to scatter/gather loops on TPU, while the
    masked sum is one fused linear pass over the T=2^w table entries
    (T*nc*K*N u32 mul+adds, trivially vectorized). It is also constant
    schedule for free."""
    T = table.shape[0]
    iota = jnp.arange(T, dtype=idx.dtype).reshape((T, 1, 1) + (1,) * idx.ndim)
    mask = (iota == idx[None, None, None]).astype(table.dtype)
    picked = (table * mask).sum(axis=0)
    return punstack(cls, picked)


def _megamul_dispatch(c, P, w: int, nwin: int, npairs: int = 1):
    """Return the megamul module + model tag when the whole-scalar-mult
    Pallas kernel applies (ops/pallas/megamul.py), else None."""
    from ..config import use_megamul, use_pallas
    if not (use_pallas() and use_megamul()):
        return None
    from ..ops.pallas import megamul
    if megamul.supported(c, P, w, nwin, npairs):
        return megamul, ("w" if len(P) == 3 else "ed")
    return None


def windowed_mul_public(c, m, P, nbits: int | None = None, w: int = 4):
    """Fixed-window m*P for public scalars: per-lane [0..2^w-1]P table,
    scan over nbits/w windows of (w doublings + 1 table-add).

    On TPU the whole multiply runs as ONE Pallas kernel with the table
    resident in VMEM (ops/pallas/megamul.py) — bit-identical schedule."""
    if nbits is None:
        nbits = c.scalar_bits()
    cls = type(P)
    # whole-mult mega-kernel at the requested w, else at w-1: a smaller
    # table (half the VMEM) with ~nbits/(w-1) windows still beats the
    # scan path's per-window HBM round-trips by a wide margin — this is
    # what carries the 512-bit curves (K=37: the w=4 table is ~7.3 MB
    # and over budget, w=3 fits)
    for w_try in (w, w - 1):
        if w_try < 2:
            break
        nwin = -(-nbits // w_try)
        mm = _megamul_dispatch(c, P, w_try, nwin)
        if mm is not None:
            mod, model = mm
            table = _build_mul_table(c, P, 1 << w_try)
            digs = _window_digits(m, nbits, w_try)
            return mod.windowed_mul(c, table, digs, cls, model, w_try)
    table = _build_mul_table(c, P, 1 << w)
    digs = _window_digits(m, nbits, w)
    acc = c.pinf(like=P)

    def step(carry, d):
        accp = punstack(cls, carry)
        accp = c.pdbln_add(accp, _table_gather(cls, table, d), w)
        return pstack(accp), None

    out, _ = jax.lax.scan(step, pstack(acc), digs)
    return punstack(cls, out)


def straus_double_mul_public_w4(c, u, P, v, Q, nbits: int | None = None):
    """u*P + v*Q with SEPARATE 16-entry tables per base and 4-bit windows.

    Same shared-doubling idea as the joint-table Straus below, but each
    scan step processes 4 bits (4 doublings + 2 table adds), so the scan
    carry state round-trips HBM 4x less often — the dominant cost of the
    XLA-scan formulation on TPU. Table build: 2 x 14 adds/dbls."""
    if nbits is None:
        nbits = c.scalar_bits()
    cls = type(P)
    # whole-mult mega-kernel when the dual tables fit VMEM: w=4 first,
    # then w=3 (3 more adds per 12 bits, but no per-window HBM traffic)
    for w in (4, 3):
        nwin = -(-nbits // w)
        mm = _megamul_dispatch(c, P, w, nwin, npairs=2)
        if mm is not None:
            mod, model = mm
            ptab = _build_mul_table(c, P, 1 << w)
            qtab = _build_mul_table(c, Q, 1 << w)
            du = _window_digits(u, nbits, w)
            dv = _window_digits(v, nbits, w)
            return mod.straus_mul(c, ptab, du, qtab, dv, cls, model, w)
    ptab = _build_mul_table(c, P, 16)
    qtab = _build_mul_table(c, Q, 16)
    du = _window_digits(u, nbits, 4)
    dv = _window_digits(v, nbits, 4)
    acc = c.pinf(like=P)

    def step(carry, dd):
        d_u, d_v = dd
        accp = punstack(cls, carry)
        accp = c.pdbln_add(accp, _table_gather(cls, ptab, d_u), 4)
        accp = c.padd(accp, _table_gather(cls, qtab, d_v))
        return pstack(accp), None

    out, _ = jax.lax.scan(step, pstack(acc), (du, dv))
    return punstack(cls, out)


def straus_double_mul_public(c, u, P, v, Q, nbits: int | None = None,
                             w: int = 2):
    """u*P + v*Q interleaved (Straus-Shamir), public scalars — the
    workhorse of batched verification: one shared-doubling pass over a
    joint per-lane table T[i,j] = iP + jQ."""
    if nbits is None:
        nbits = c.scalar_bits()
    cls = type(P)
    tw = 1 << w
    ptab = _build_mul_table(c, P, tw)
    qtab = _build_mul_table(c, Q, tw)
    rows = []
    for i in range(tw):
        Pi = punstack(cls, ptab[i])
        for j in range(tw):
            if i == 0:
                rows.append(qtab[j])
            elif j == 0:
                rows.append(ptab[i])
            else:
                rows.append(pstack(c.padd(Pi, punstack(cls, qtab[j]))))
    table = jnp.stack(rows, axis=0)

    du = _window_digits(u, nbits, w)
    dv = _window_digits(v, nbits, w)
    acc = c.pinf(like=P)

    def step(carry, dd):
        d_u, d_v = dd
        accp = punstack(cls, carry)
        accp = c.pdbln_add(accp, _table_gather(cls, table, d_u * tw + d_v),
                           w)
        return pstack(accp), None

    out, _ = jax.lax.scan(step, pstack(acc), (du, dv))
    return punstack(cls, out)
