"""On-hardware validation + microbench for the whole-scalar-mult Pallas
mega-kernel (ops/pallas/megamul.py).

Run on a real TPU once the tunnel is up:

    python scripts/validate_megamul.py [N]

Steps:
  1. bit-exactness: windowed_mul_public with the mega-kernel vs the XLA
     scan path, full-width scalars, P-256 (w model) and Ed25519 (ed);
     Straus dual-table (w=3) on P-256 vs a manual XLA schedule.
  2. microbench: verify-pipeline throughput with LIBECC_TPU_MEGAMUL=1
     vs =0 (same batch, pipelined timing protocol from bench.py).

Prints PASS/FAIL per check and a JSON line per timing. If the mega-kernel
loses, keep dispatch disabled by exporting LIBECC_TPU_MEGAMUL=0.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _rand_scalars(rng, nbits, n, jnp, nn):
    vals = [rng.randrange(1 << nbits) for _ in range(n)]
    k = max(-(-nbits // nn.LIMB_BITS), 1)
    return jnp.asarray(nn.batch_to_limbs(vals, k))


def check_bitexact(jax, jnp, n):
    import random
    from libecc_tpu.curves import params, scalar_mul
    from libecc_tpu.curves import edwards as edw
    from libecc_tpu.curves import shortw
    from libecc_tpu.nn import core as nn
    from libecc_tpu.sig import keys as K

    rng = random.Random(0xA11)
    ok_all = True

    # --- Weierstrass windowed, full-width scalars
    c = params.get_curve("P-256")
    privs = [rng.randrange(1, c.q) for _ in range(n)]
    kb = K.keygen(c, "ECDSA", n, priv_ints=privs)
    m = _rand_scalars(rng, c.scalar_bits(), n, jnp, nn)
    os.environ["LIBECC_TPU_MEGAMUL"] = "0"
    ref = scalar_mul.windowed_mul_public(c, m, kb.pub)
    ref = [np.asarray(x) for x in ref]
    os.environ["LIBECC_TPU_MEGAMUL"] = "1"
    t0 = time.perf_counter()
    got = scalar_mul.windowed_mul_public(c, m, kb.pub)
    got = [np.asarray(x) for x in got]
    print(f"megamul P-256 windowed compile+run: "
          f"{time.perf_counter() - t0:.1f}s")
    ok = all((g == r).all() for g, r in zip(got, ref))
    print(f"windowed w-model bit-exact: {'PASS' if ok else 'FAIL'}")
    ok_all &= ok

    # --- Straus dual-table (the batch_verify path), w=3 fits VMEM
    u = _rand_scalars(rng, c.scalar_bits(), n, jnp, nn)
    v = _rand_scalars(rng, c.scalar_bits(), n, jnp, nn)
    Q = shortw.point_dbl(c, kb.pub)
    os.environ["LIBECC_TPU_MEGAMUL"] = "0"
    ref = scalar_mul.straus_double_mul_public_w4(c, u, kb.pub, v, Q)
    ref = [np.asarray(x) for x in ref]
    os.environ["LIBECC_TPU_MEGAMUL"] = "1"
    t0 = time.perf_counter()
    got = scalar_mul.straus_double_mul_public_w4(c, u, kb.pub, v, Q)
    got = [np.asarray(x) for x in got]
    print(f"megamul P-256 straus compile+run: "
          f"{time.perf_counter() - t0:.1f}s")
    ok = all((g == r).all() for g, r in zip(got, ref))
    print(f"straus dual-table bit-exact: {'PASS' if ok else 'FAIL'}")
    ok_all &= ok

    # --- Edwards windowed
    ec = edw.get_edwards_curve("ED25519")
    from libecc_tpu.ref import hostref
    hc = hostref.EdCurve(ec.fp_ctx.p_int, ec.a, ec.d, ec.gx, ec.gy,
                         ec.q, 1)
    pts, P = [], (ec.gx, ec.gy)
    for _ in range(8):
        pts.append(P)
        P = hostref.ed_add(hc, P, (ec.gx, ec.gy))
    Pb = ec.point_from_affine_ints([pts[i % 8][0] for i in range(n)],
                                   [pts[i % 8][1] for i in range(n)])
    me = _rand_scalars(rng, ec.scalar_bits(), n, jnp, nn)
    os.environ["LIBECC_TPU_MEGAMUL"] = "0"
    ref = scalar_mul.windowed_mul_public(ec, me, Pb)
    ref = [np.asarray(x) for x in ref]
    os.environ["LIBECC_TPU_MEGAMUL"] = "1"
    t0 = time.perf_counter()
    got = scalar_mul.windowed_mul_public(ec, me, Pb)
    got = [np.asarray(x) for x in got]
    print(f"megamul Ed25519 windowed compile+run: "
          f"{time.perf_counter() - t0:.1f}s")
    ok = all((g == r).all() for g, r in zip(got, ref))
    print(f"windowed ed-model bit-exact: {'PASS' if ok else 'FAIL'}")
    ok_all &= ok
    return ok_all


def bench_both(jax, jnp, n, iters):
    import json
    import bench

    for mode in ("0", "1"):
        os.environ["LIBECC_TPU_MEGAMUL"] = mode
        # fresh traces: verify_pipeline closures are rebuilt per call
        t0 = time.perf_counter()
        bench.bench_verify(jax, jnp, "SECP256R1", n, iters,
                           headline=False)
        print(json.dumps({"megamul": mode,
                          "wall_s": round(time.perf_counter() - t0, 1)}))


def main():
    n = int(os.environ.get("BENCH_BATCH", "8192"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices())

    ok = check_bitexact(jax, jnp, n)
    if not ok:
        print("BIT-EXACTNESS FAILED — do not enable megamul dispatch")
        sys.exit(1)
    bench_both(jax, jnp, n, iters)


if __name__ == "__main__":
    main()
