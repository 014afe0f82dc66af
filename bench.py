"""Benchmark: batched P-256 ECDSA verification throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: libecc's best published verify rate, 355 ops/s/core
(Xeon E3-1535M, BrainpoolP256R1, README_original.md:628 / BASELINE.md) —
the reference protocol is 300 sign/verify ops over short messages
(ec_self_tests_core.c:1571).

Pipeline timed here (per signature): SHA-256 hash-to-scalar on device +
s^-1 (Fermat) + Straus uG+vY double-scalar + affine + x mod q == r.
"""

import json
import os
import sys
import time

# Persistent XLA/Mosaic compile cache: the fused Pallas point kernels take
# minutes to compile; cache them across bench invocations.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/libecc_axon_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np


def main():
    n = int(os.environ.get("BENCH_BATCH", "8192"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    import jax
    import jax.numpy as jnp
    from libecc_tpu.curves import params
    from libecc_tpu.sig import ecdsa, keys as K
    from libecc_tpu.sig.common import digests_to_words, e_from_digest_bits
    from libecc_tpu.curves.shortw import PrjPoint
    from libecc_tpu.hash.registry import get_hash
    from libecc_tpu.nn import core as nn
    import hashlib

    c = params.get_curve("P-256")
    q_ctx = c.q_ctx
    rng = np.random.RandomState(42)

    # keys/messages/sigs on host (sign once, verify is the metric)
    privs = [int.from_bytes(rng.bytes(32), "big") % c.q or 1 for _ in range(n)]
    kb = K.keygen(c, "ECDSA", n, priv_ints=privs)
    msgs = [rng.bytes(32) for _ in range(n)]
    nonces = [int.from_bytes(rng.bytes(32), "big") % c.q or 1 for _ in range(n)]
    sigs, ok = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces)
    assert ok.all()

    sha = get_hash("SHA256")
    blocks = jnp.asarray(sha.pack_fn(msgs))            # (1, 16, N) device
    r = jnp.asarray(nn.batch_to_limbs(
        [int.from_bytes(s[:32], "big") for s in sigs], q_ctx.k))
    s = jnp.asarray(nn.batch_to_limbs(
        [int.from_bytes(s[32:], "big") for s in sigs], q_ctx.k))

    @jax.jit
    def verify_pipeline(blocks, px, py, pz, r, s, tok):
        # tok chains the previous iteration's accept count into this
        # dispatch so pipelined iterations are data-dependent (the runtime
        # cannot elide or reorder them); the where() is a no-op on values.
        words = sha.device_fn(blocks)                  # device hashing
        e = e_from_digest_bits(words, 256, q_ctx)
        r_dep = jnp.where(tok <= jnp.uint32(n), r, r + 1)
        acc = ecdsa.verify_core(c, PrjPoint(px, py, pz), e, r_dep, s)
        return acc, jnp.sum(acc.astype(jnp.uint32))

    args = (blocks, kb.pub.x, kb.pub.y, kb.pub.z, r, s)
    tok = jnp.uint32(0)
    acc, tok = verify_pipeline(*args, tok)             # compile + warm
    assert bool(np.asarray(acc).all()), "verification failed in bench"

    # Throughput protocol: keep `iters` batches in flight (device-resident
    # token chaining, no per-iteration host round trip), ONE host-transfer
    # sync at the end — block_until_ready does not reliably drain the
    # device queue, so the sync must be a transfer.
    t0 = time.perf_counter()
    for _ in range(iters):
        acc, tok = verify_pipeline(*args, tok)
    n_ok = int(np.asarray(tok))
    dt = (time.perf_counter() - t0) / iters
    assert n_ok == n, f"verified {n_ok}/{n}"
    rate = n / dt

    baseline = 355.0  # libecc verify ops/s/core (BASELINE.md)
    print(json.dumps({
        "metric": "p256_ecdsa_verify_throughput",
        "value": round(rate, 1),
        "unit": "verifies/sec/chip",
        "vs_baseline": round(rate / baseline, 2),
    }))


if __name__ == "__main__":
    main()
