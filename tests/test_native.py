"""Native C++ host runtime vs numpy reference (byte<->limb marshalling and
hash block packing). The native layer is an acceleration of the host
boundary; both paths must agree bit-exactly.
"""

import os
import random

import numpy as np
import pytest

from libecc_tpu.nn import core as nn
from libecc_tpu.nn import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

rng = random.Random(0xBEEF)


def _numpy_be_to_limbs(bufs, k):
    os.environ["LIBECC_TPU_NO_NATIVE"] = "1"
    try:
        native._TRIED, native._LIB = True, None
        return nn.bytes_be_to_limbs_np(bufs, k)
    finally:
        del os.environ["LIBECC_TPU_NO_NATIVE"]
        native._TRIED = False


def test_bytes_to_limbs_matches():
    for item_len, k in [(32, 20), (48, 28), (66, 37), (5, 4), (64, 35)]:
        bufs = [rng.getrandbits(8 * item_len).to_bytes(item_len, "big")
                for _ in range(33)]
        nat = native.be_bytes_to_limbs(bufs, k)
        ref = _numpy_be_to_limbs(bufs, k)
        assert nat is not None
        np.testing.assert_array_equal(nat, ref)
        # value-level check
        vals = nn.batch_from_limbs(nat)
        assert vals == [int.from_bytes(b, "big")
                        % (1 << (k * nn.LIMB_BITS)) for b in bufs]


def test_limbs_to_bytes_matches():
    k, n, item_len = 20, 17, 32
    vals = [rng.getrandbits(8 * item_len - 4) for _ in range(n)]
    arr = nn.batch_to_limbs(vals, k)
    out = native.limbs_to_be_bytes(arr, item_len)
    assert out == [v.to_bytes(item_len, "big") for v in vals]


def test_md_pad_pack():
    from libecc_tpu.hash import sha2
    for mlen in (0, 3, 55, 56, 64, 119):
        msgs = [bytes(rng.randrange(256) for _ in range(mlen))
                for _ in range(9)]
        nat = native.md_pad_pack_be64(msgs)
        ref = sha2.pack_messages_256(msgs) if hasattr(
            sha2, "pack_messages_256") else None
        assert nat is not None
        # verify against hashlib through the device kernel path
        import hashlib
        import jax.numpy as jnp
        from libecc_tpu.hash.registry import get_hash
        alg = get_hash("SHA256")
        words = np.asarray(alg.device_fn(jnp.asarray(nat)))
        for i, m in enumerate(msgs):
            dig = b"".join(int(w).to_bytes(4, "big") for w in words[:, i])
            assert dig == hashlib.sha256(m).digest()
