"""Break down P-256 ECDSA verify-pipeline time on the real chip.

Times each stage as its own jitted program (batch BENCH_BATCH, default
2048): device hashing, mod-q scalar work (batched s^-1), comb u*G,
windowed v*Y, projective accept check, and the full pipeline. Per-stage
numbers include one dispatch each, so they slightly overcount vs the
fused whole-pipeline run; use them for *relative* weight only.
"""

import os
import time

# compile cache: enabled by libecc_tpu.__init__ via jax.config.update

import numpy as np
import jax
import jax.numpy as jnp

from libecc_tpu.curves import params, scalar_mul
from libecc_tpu.curves.shortw import PrjPoint
from libecc_tpu.sig import ecdsa, keys as K, common
from libecc_tpu.sig.common import digests_to_words, e_from_digest_bits
from libecc_tpu.hash.registry import get_hash
from libecc_tpu.nn import core as nn


def _sync(out):
    # host transfer is the only reliable device sync through the tunnel
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)


def timeit(f, *a, iters=5):
    _sync(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(f(*a))
    return (time.perf_counter() - t0) / iters


def main():
    n = int(os.environ.get("BENCH_BATCH", "2048"))
    c = params.get_curve("P-256")
    q_ctx = c.q_ctx
    rng = np.random.RandomState(42)
    privs = [int.from_bytes(rng.bytes(32), "big") % c.q or 1
             for _ in range(n)]
    kb = K.keygen(c, "ECDSA", n, priv_ints=privs)
    msgs = [rng.bytes(32) for _ in range(n)]
    nonces = [int.from_bytes(rng.bytes(32), "big") % c.q or 1
              for _ in range(n)]
    sigs, ok = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces)
    assert ok.all()
    sha = get_hash("SHA256")
    blocks = jnp.asarray(sha.pack_fn(msgs))
    r = jnp.asarray(nn.batch_to_limbs(
        [int.from_bytes(s[:32], "big") for s in sigs], q_ctx.k))
    s = jnp.asarray(nn.batch_to_limbs(
        [int.from_bytes(s[32:], "big") for s in sigs], q_ctx.k))
    e = e_from_digest_bits(jnp.asarray(sha.device_fn(blocks)), 256, q_ctx)

    def ck(f):
        # reduce outputs to one word on device: stage timings must not
        # include transferring megabyte outputs through the tunnel
        def g(*a):
            out = f(*a)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(x.astype(jnp.uint32)) for x in leaves)
        return jax.jit(g)

    stages = {
        "hash": ck(lambda b: sha.device_fn(b)),
        "qinv_batched": ck(lambda s: common.q_inv(s, q_ctx)),
        "comb_uG_public": ck(
            lambda u: scalar_mul.fixed_base_mul(c, u, secret=False)),
        "comb_kG_secret": ck(
            lambda u: scalar_mul.fixed_base_mul(c, u, secret=True)),
        "windowed_vY_w4": ck(
            lambda v, px, py, pz: scalar_mul.windowed_mul_public(
                c, v, PrjPoint(px, py, pz))),
        "full_verify": ck(
            lambda px, py, pz, e, r, s: ecdsa.verify_core(
                c, PrjPoint(px, py, pz), e, r, s)),
    }
    args = {
        "hash": (blocks,),
        "qinv_batched": (s,),
        "comb_uG_public": (e,),
        "comb_kG_secret": (e,),
        "windowed_vY_w4": (r, kb.pub.x, kb.pub.y, kb.pub.z),
        "full_verify": (kb.pub.x, kb.pub.y, kb.pub.z, e, r, s),
    }
    for name, f in stages.items():
        dt = timeit(f, *args[name])
        print(f"{name:18s} {dt * 1e3:8.2f} ms   "
              f"({n / dt:10.0f} ops/s)", flush=True)


if __name__ == "__main__":
    main()
