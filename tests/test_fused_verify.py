"""Fused bytes-in verify pipeline: device-side hash padding and limb
unpacking must be bit-identical to the host packers, and the fused
verify path must produce the same accept mask as the generic one."""

import numpy as np
import jax.numpy as jnp

from libecc_tpu.nn import core as nn
from libecc_tpu.hash import sha2


def test_device_limb_unpack_bitexact():
    rng = np.random.RandomState(5)
    for L, k in ((32, 20), (48, 28), (64, 37), (28, 20)):
        bufs = [rng.bytes(L) for _ in range(17)]
        ref = nn.bytes_be_to_limbs_np(bufs, k)
        u8 = jnp.asarray(np.frombuffer(b"".join(bufs),
                                       np.uint8).reshape(17, L))
        got = np.asarray(nn.be_rows_to_limbs_dev(u8, k))
        np.testing.assert_array_equal(ref, got)


def test_device_block_pack_bitexact():
    rng = np.random.RandomState(6)
    for mlen in (32, 55, 56, 119):
        msgs = [rng.bytes(mlen) for _ in range(9)]
        ref = sha2.pack_blocks_sha256(msgs)
        u8 = jnp.asarray(np.frombuffer(b"".join(msgs),
                                       np.uint8).reshape(9, mlen))
        got = np.asarray(sha2.blocks_from_bytes_dev(u8, mlen))
        np.testing.assert_array_equal(ref, got)


def test_fused_verify_matches_generic():
    from libecc_tpu.curves import params
    from libecc_tpu.sig import ecdsa, keys as K
    import jax

    # the n=64 CPU verify executable deterministically SEGFAULTS the
    # persistent-cache serializer (jax compilation_cache
    # put_executable_and_time / zstd) on this jaxlib; computing is fine —
    # only the cache write crashes. Disable the cache for this test.
    old = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        _run_fused_vs_generic(ecdsa, K, params)
    finally:
        jax.config.update("jax_enable_compilation_cache", old)


def _run_fused_vs_generic(ecdsa, K, params):
    c = params.get_curve("P-256")
    n = 64
    rng = np.random.RandomState(44)
    privs = [int.from_bytes(rng.bytes(32), "big") % c.q or 1
             for _ in range(n)]
    kb = K.keygen(c, "ECDSA", n, priv_ints=privs)
    msgs = [rng.bytes(32) for _ in range(n)]
    nonces = [int.from_bytes(rng.bytes(32), "big") % c.q or 1
              for _ in range(n)]
    sigs, ok = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces)
    assert ok.all()
    sigs = list(sigs)
    for i in (5, 17, 40):
        b = bytearray(sigs[i])
        b[9] ^= 0x40
        sigs[i] = bytes(b)
    # fused path (uniform batch of >= 64)
    acc_fused = np.asarray(ecdsa.verify_batch_async(kb, msgs, sigs,
                                                    "SHA256"))
    # generic path: verify_batch never takes the fused bytes-in jit
    # (host hashing + host limb packing)
    acc_gen = ecdsa.verify_batch(kb, msgs, sigs, "SHA256")
    np.testing.assert_array_equal(acc_fused, np.asarray(acc_gen))
    expect = np.ones(n, bool)
    expect[[5, 17, 40]] = False
    np.testing.assert_array_equal(acc_fused, expect)


def test_sign_batches_pipelined():
    """Pipelined sign stream: deterministic mode is byte-identical to
    sign_batch; outputs verify."""
    from libecc_tpu.curves import params
    from libecc_tpu.sig import ecdsa, keys as K

    c = params.get_curve("P-256")
    n = 32
    rng = np.random.RandomState(9)
    privs = [int.from_bytes(rng.bytes(32), "big") % c.q or 1
             for _ in range(n)]
    kb = K.keygen(c, "ECDSA", n, priv_ints=privs)
    batches = [[rng.bytes(32) for _ in range(n)] for _ in range(3)]
    outs = list(ecdsa.sign_batches(kb, batches, "SHA256",
                                   deterministic=True))
    assert len(outs) == 3
    for msgs, (sigs, ok) in zip(batches, outs):
        assert ok.all()
        ref, ok2 = ecdsa.sign_batch(kb, msgs, "SHA256",
                                    deterministic=True)
        assert sigs == ref
        assert np.asarray(ecdsa.verify_batch(kb, msgs, sigs,
                                             "SHA256")).all()
