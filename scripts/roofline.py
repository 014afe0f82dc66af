"""Verify-pipeline roofline: field-multiply census + in-kernel mulmod rate.

Two measurements steer the headline-kernel work (VERDICT r3 item 2):

1. A *census* of Montgomery multiplies per verify: fp.mul/fp.sqr (and the
   q-context nn multiplies) are shimmed with counters and verify_core is
   traced once. This is exact — under jit the traced graph IS the
   schedule, so trace-time counts equal run-time counts.

2. The *in-kernel* mulmod rate: the fused Pallas Montgomery kernel run as
   a dependence chain (the same kernel the point formulas call), which is
   the honest per-multiply speed inside the verify program — the
   standalone XLA mulmod bench (bench.py) is HBM-bound and ~3x slower,
   so dividing by it would overstate how close to the bound we are.

Roofline = kernel_rate / muls_per_verify, compared against the measured
verify throughput. Run on the TPU:  python scripts/roofline.py
"""

import sys
import time
from collections import Counter

import numpy as np

sys.path.insert(0, ".")


def census(curve_name="SECP256R1", n=1024):
    import jax
    import jax.numpy as jnp
    from libecc_tpu.curves import params
    from libecc_tpu.fp import field as fp
    from libecc_tpu.nn import core as nn
    from libecc_tpu.sig import ecdsa
    from libecc_tpu.curves.shortw import PrjPoint

    c = params.get_curve(curve_name)
    counts = Counter()

    orig_mul = nn.mont_mul
    orig_relaxed = nn.mont_mul_relaxed

    def wrap(name, f):
        def g(a, b, ctx, *args, **kw):
            # weight by ctx: p-field vs q-scalar multiplies
            tag = "p" if ctx.p_int == c.fp_ctx.p_int else "q"
            # broadcasting may make one operand a constant: still one
            # batched multiply per lane
            counts[f"{name}_{tag}"] += 1
            return f(a, b, ctx, *args, **kw)
        return g

    nn.mont_mul = wrap("mul", orig_mul)
    nn.mont_mul_relaxed = wrap("mul_relaxed", orig_relaxed)
    try:
        q_ctx = c.q_ctx
        kq, kp = q_ctx.k, c.fp_ctx.k
        e = jnp.zeros((kq, n), jnp.uint32)
        r = jnp.ones((kq, n), jnp.uint32)
        s = jnp.ones((kq, n), jnp.uint32)
        pub = PrjPoint(jnp.zeros((kp, n), jnp.uint32),
                       jnp.zeros((kp, n), jnp.uint32),
                       jnp.zeros((kp, n), jnp.uint32))
        jax.eval_shape(
            lambda px, py, pz, e, r, s: ecdsa.verify_core(
                c, PrjPoint(px, py, pz), e, r, s),
            pub.x, pub.y, pub.z, e, r, s)
    finally:
        nn.mont_mul = orig_mul
        nn.mont_mul_relaxed = orig_relaxed
    return counts


def kernel_rate(n=1 << 13, chain=256, iters=8):
    """Dependence-chained fused-kernel mulmod rate (P-256 field)."""
    import jax
    import jax.numpy as jnp
    from libecc_tpu.curves import params
    from libecc_tpu.ops.pallas import mont
    from libecc_tpu.nn import core as nn

    ctx = params.get_curve("SECP256R1").fp_ctx
    rng = np.random.RandomState(3)
    a = [int.from_bytes(rng.bytes(32), "big") % ctx.p_int for _ in range(n)]
    b = [int.from_bytes(rng.bytes(32), "big") % ctx.p_int for _ in range(n)]
    am = jnp.asarray(nn.batch_to_limbs(a, ctx.k))
    bm = jnp.asarray(nn.batch_to_limbs(b, ctx.k))

    @jax.jit
    def mul_chain(x, y, tok):
        x = jnp.where(tok <= jnp.uint32(n), x, x + 1)

        def body(_, x):
            return mont.mont_mul_relaxed(x, y, ctx)
        x = jax.lax.fori_loop(0, chain, body, x)
        return x, jnp.uint32(jnp.sum(x[0] & 1, dtype=jnp.uint32))

    x, tok = mul_chain(am, bm, jnp.uint32(0))
    np.asarray(tok)
    t0 = time.perf_counter()
    for _ in range(iters):
        x, tok = mul_chain(am, bm, tok)
    np.asarray(tok)
    dt = (time.perf_counter() - t0) / iters
    return n * chain / dt


def main():
    counts = census()
    total_p = sum(v for k, v in counts.items() if k.endswith("_p"))
    total_q = sum(v for k, v in counts.items() if k.endswith("_q"))
    print("multiply census per verify lane:")
    for k, v in sorted(counts.items()):
        print(f"  {k:16s} {v}")
    print(f"  TOTAL p-field: {total_p}   q-field: {total_q}")
    rate = kernel_rate()
    print(f"fused-kernel mulmod rate: {rate/1e6:.1f} M/s")
    bound = rate / (total_p + total_q)
    print(f"mul-only verify bound:    {bound/1e3:.1f} k verifies/s "
          f"(excl. add/sub/select overhead)")


if __name__ == "__main__":
    main()
