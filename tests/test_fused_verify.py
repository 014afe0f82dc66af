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
    # generic path, forced: ragged batch trick — verify per the
    # digest-level API which never fuses
    acc_gen = ecdsa.verify_digests_batch(
        kb, [__import__("hashlib").sha256(m).digest() for m in msgs],
        sigs, "SHA256")
    np.testing.assert_array_equal(acc_fused, np.asarray(acc_gen))
    expect = np.ones(n, bool)
    expect[[5, 17, 40]] = False
    np.testing.assert_array_equal(acc_fused, expect)
