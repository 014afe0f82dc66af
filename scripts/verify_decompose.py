"""Decompose the P-256 verify pipeline cost on the TPU: time the vQ
windowed megamul, the uG comb, the q-arithmetic + accept logic, and the
whole verify_core, so kernel work targets the real dominant term.

Also measures a fully IN-KERNEL multiply chain (a Pallas kernel whose
body runs `chain` dependent Montgomery products before writing out) —
the true VPU speed-of-light for one multiply, free of the per-dispatch
HBM round-trip that bounds the standalone kernel-chain number.

Run on the chip:  python scripts/verify_decompose.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, args, iters=8):
    import jax
    out = fn(*args)
    jax.tree.map(np.asarray, out)        # sync after compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from libecc_tpu.curves import params
    from libecc_tpu.curves import scalar_mul
    from libecc_tpu.curves.shortw import PrjPoint
    from libecc_tpu.sig import ecdsa
    from libecc_tpu.nn import core as nn
    from libecc_tpu.ops.pallas import mont
    from libecc_tpu.ops.pallas.point import TileOps, _curve_consts

    n = 8192
    c = params.get_curve("SECP256R1")
    ctx = c.fp_ctx
    q_ctx = c.q_ctx
    rng = np.random.RandomState(9)

    def rand_limbs(k, bits):
        vals = [int.from_bytes(rng.bytes(bits // 8), "big") % ctx.p_int
                for _ in range(n)]
        return jnp.asarray(nn.batch_to_limbs(vals, k))

    # --- true in-kernel mul chain: one kernel, `chain` dependent muls ---
    C = _curve_consts(c)
    chain = 64

    def kern(a_ref, b_ref, o_ref):
        ops = TileOps(C)
        a = ops.read(a_ref)
        b = ops.read(b_ref)
        for _ in range(chain):
            a = ops.mul(a, b)
        ops.write(o_ref, a)

    k = ctx.k
    spec = pl.BlockSpec((k, mont.SUBLANES, mont.LANES),
                        lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def chain_call(a, b):
        a3 = a.reshape(k, n // mont.LANES, mont.LANES)
        b3 = b.reshape(k, n // mont.LANES, mont.LANES)
        return pl.pallas_call(
            kern, grid=(n // mont.BLOCK,), in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((k, n // mont.LANES,
                                            mont.LANES), jnp.uint32),
        )(a3, b3)

    a = rand_limbs(k, 256)
    b = rand_limbs(k, 256)
    dt = timeit(chain_call, (a, b))
    inkernel = n * chain / dt
    print(f"IN-KERNEL mul chain: {inkernel/1e6:.1f} M mulmod/s "
          f"({dt*1e3:.2f} ms for {chain} chained muls @ {n})")

    # --- sqr chain (specialized) ---
    def kern_sq(a_ref, o_ref):
        ops = TileOps(C)
        a = ops.read(a_ref)
        for _ in range(chain):
            a = ops.sqr(a)
        ops.write(o_ref, a)

    @jax.jit
    def sqr_call(a):
        a3 = a.reshape(k, n // mont.LANES, mont.LANES)
        return pl.pallas_call(
            kern_sq, grid=(n // mont.BLOCK,), in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((k, n // mont.LANES,
                                            mont.LANES), jnp.uint32),
        )(a3)

    dt = timeit(sqr_call, (a,))
    print(f"IN-KERNEL sqr chain: {n*chain/dt/1e6:.1f} M sqr/s "
          f"(ratio vs mul: {n*chain/dt/inkernel:.2f}x)")

    # --- pipeline pieces ---
    kq = q_ctx.k
    u = rand_limbs(kq, 256)
    v = rand_limbs(kq, 256)
    px = rand_limbs(k, 256)
    P = PrjPoint(px, rand_limbs(k, 256),
                 jnp.broadcast_to(jnp.asarray(
                     nn.to_limbs(ctx.R % ctx.p_int, k)).reshape(k, 1),
                     (k, n)))

    f_vq = jax.jit(lambda v, P: scalar_mul.windowed_mul_public(
        c, v, PrjPoint(*P)))
    dt = timeit(f_vq, (v, tuple(P)))
    print(f"vQ windowed megamul: {dt*1e3:.2f} ms/batch "
          f"({n/dt/1e3:.1f}k mults/s)")

    f_ug = jax.jit(lambda u: tuple(scalar_mul.fixed_base_mul(
        c, u, secret=False)))
    dt = timeit(f_ug, (u,))
    print(f"uG comb (w=8):       {dt*1e3:.2f} ms/batch")

    f_ver = jax.jit(lambda px, py, pz, e, r, s: ecdsa.verify_core(
        c, PrjPoint(px, py, pz), e, r, s))
    e = rand_limbs(kq, 256)
    r = rand_limbs(kq, 256)
    s = rand_limbs(kq, 256)
    dt = timeit(f_ver, (P.x, P.y, P.z, e, r, s))
    print(f"verify_core total:   {dt*1e3:.2f} ms/batch "
          f"({n/dt/1e3:.1f}k verifies/s)")


if __name__ == "__main__":
    main()
