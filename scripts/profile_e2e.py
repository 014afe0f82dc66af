"""Profile the END-TO-END verify/sign paths (host marshalling included).

The device-only pipelines run at hundreds of kops/s; the user-facing
byte-string APIs (`ecdsa.verify_batch` / `sign_batch`) are host-bound.
This script cProfiles those paths at a realistic batch size so the limb
packers / hash packers / digest unpackers show up by name.

Usage (idle host!):
    JAX_PLATFORMS=cpu python scripts/profile_e2e.py [batch] [iters]
"""

import cProfile
import pstats
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from libecc_tpu.curves import params
    from libecc_tpu.sig import ecdsa, keys as K

    c = params.get_curve("P-256")
    rng = np.random.RandomState(44)
    privs = [int.from_bytes(rng.bytes(32), "big") % c.q or 1
             for _ in range(n)]
    kb = K.keygen(c, "ECDSA", n, priv_ints=privs)
    msgs = [rng.bytes(32) for _ in range(n)]
    nonces = [int.from_bytes(rng.bytes(32), "big") % c.q or 1
              for _ in range(n)]
    sigs, ok = ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces)
    assert ok.all()
    acc = ecdsa.verify_batch(kb, msgs, sigs, "SHA256")   # warm + compile
    assert acc.all()

    t0 = time.perf_counter()
    for _ in range(iters):
        ecdsa.verify_batch(kb, msgs, sigs, "SHA256")
    dt = (time.perf_counter() - t0) / iters
    print(f"verify_batch e2e: {n / dt:,.0f}/s  ({dt*1e3:.1f} ms/batch of {n})")

    prof = cProfile.Profile()
    prof.enable()
    for _ in range(iters):
        ecdsa.verify_batch(kb, msgs, sigs, "SHA256")
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(25)

    # sign path
    t0 = time.perf_counter()
    for _ in range(iters):
        ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces)
    dt = (time.perf_counter() - t0) / iters
    print(f"sign_batch e2e: {n / dt:,.0f}/s  ({dt*1e3:.1f} ms/batch of {n})")
    prof = cProfile.Profile()
    prof.enable()
    for _ in range(iters):
        ecdsa.sign_batch(kb, msgs, "SHA256", nonces=nonces)
    prof.disable()
    pstats.Stats(prof).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
