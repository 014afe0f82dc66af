"""Headline configuration probe: one compile of the verify pipeline at a
given batch, then measure throughput at several dispatch-pipeline depths
(iters). Used to pick the default BENCH_BATCH / BENCH_ITERS for the
number of record (dispatch amortization over the tunnel: sign moved
703k -> 786k/s going 8192 -> 32768; this measures the same for verify).

Usage: BENCH_BATCH=32768 python scripts/bench_headline_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import bench  # noqa: E402


def main():
    n = int(os.environ.get("BENCH_BATCH", "32768"))
    iters_list = [int(x) for x in
                  os.environ.get("BENCH_PROBE_ITERS", "4,8,16,32").split(",")]
    bench._diag("probe_startup", batch=n, iters_list=iters_list)
    bench._start_watchdog(float(os.environ.get("BENCH_BUDGET_S", "1500")))

    import jax
    import jax.numpy as jnp
    from libecc_tpu.curves import params
    from libecc_tpu.sig import ecdsa
    from libecc_tpu.sig.common import e_from_digest_bits
    from libecc_tpu.curves.shortw import PrjPoint
    from libecc_tpu.hash.registry import get_hash
    from libecc_tpu.nn import core as nn

    c = params.get_curve("SECP256R1")
    q_ctx = c.q_ctx
    nb = (c.q.bit_length() + 7) // 8
    kb, msgs, sigs, _ = bench._ecdsa_fixture(jnp, c, n, seed=42)
    sha = get_hash("SHA256")
    blocks = jnp.asarray(sha.pack_fn(msgs))
    r = jnp.asarray(nn.batch_to_limbs(
        [int.from_bytes(s[:nb], "big") for s in sigs], q_ctx.k))
    s = jnp.asarray(nn.batch_to_limbs(
        [int.from_bytes(s[nb:], "big") for s in sigs], q_ctx.k))

    @jax.jit
    def verify_pipeline(blocks, px, py, pz, r, s, tok):
        words = sha.device_fn(blocks)
        e = e_from_digest_bits(words, 256, q_ctx)
        r_dep = jnp.where(tok <= jnp.uint32(n), r, r + 1)
        acc = ecdsa.verify_core(c, PrjPoint(px, py, pz), e, r_dep, s)
        return acc, jnp.sum(acc.astype(jnp.uint32))

    args = (blocks, kb.pub.x, kb.pub.y, kb.pub.z, r, s)
    t_w = time.monotonic()
    out, tok = verify_pipeline(*args, jnp.uint32(0))
    np.asarray(tok)
    bench._diag("probe_warm", warm_s=round(time.monotonic() - t_w, 1))

    for iters in iters_list:
        tok = jnp.uint32(0)
        # warm dispatch chain once so timing excludes any re-layout
        out, tok = verify_pipeline(*args, tok)
        np.asarray(tok)
        t0 = time.perf_counter()
        for _ in range(iters):
            out, tok = verify_pipeline(*args, tok)
        got = int(np.asarray(tok))
        dt = time.perf_counter() - t0
        assert got == n, f"verified {got}/{n}"
        rate = iters * n / dt
        bench._diag("probe_point", batch=n, iters=iters,
                    rate=round(rate, 1), secs=round(dt, 3))
        print(f'{{"metric": "probe_verify_b{n}_i{iters}", '
              f'"value": {rate:.1f}, "unit": "verifies/sec/chip"}}',
              flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
