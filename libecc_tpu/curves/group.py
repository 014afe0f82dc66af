"""Generic group-op helpers shared by all curve models.

A "point batch" is any NamedTuple of limb tensors (3 coords for projective
short-Weierstrass, 4 for extended Edwards, 2 for x-only Montgomery pairs).
A curve model object provides `padd`, `pdbl`, `pinf` methods; everything in
scalar_mul is generic over that interface — one ladder/window engine serves
all three models (the reference instead routes Montgomery/Edwards through
the Weierstrass core via isogenies, aff_pt_montgomery.c/aff_pt_edwards.c;
on TPU native per-model formulas are both simpler and faster, SURVEY §7.3).
"""

from __future__ import annotations

import jax.numpy as jnp


def pstack(P):
    """NamedTuple of (K, *b) coords -> (ncoords, K, *b)."""
    return jnp.stack(tuple(P), axis=0)


def punstack(cls, a):
    return cls(*[a[i] for i in range(a.shape[0])])


def pselect(cond, a, b):
    """Lanewise cond ? a : b over any point tuple."""
    c = cond.astype(bool)[None]
    return type(a)(*(jnp.where(c, x, y) for x, y in zip(a, b)))
