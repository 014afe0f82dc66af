"""RFC 7748 5.2 iterated-ladder vectors for X25519 and X448.

Each iteration feeds (k, u) <- (X(k, u), k) starting from k = u = the
base point's u. The expected constants below are the RFC's published
values, re-derived independently by a pure-int ladder at authoring time
(scripts/gen_wycheproof_subset.py ladders). Reference analog: the
x25519/x448 known-answer suite (src/tests/x25519_test_vectors.h,
x448_test_vectors.h exercise the same core).

Iteration MUST run in RFC mode (strict=False): intermediate u values
land on the twist about half the time, and the reference-policy strict
mode rejects those by design (x25519_448.h:28-32).

Tiers: 1 iteration in the default tier; 1,000 in the nightly (slow)
tier; 1,000,000 behind LIBECC_TPU_X1M=1 (hours on CPU).
"""

import os

import pytest

X25519_START = (9).to_bytes(32, "little")
X25519_ITER = {
    1: "422c8e7a6227d7bca1350b3e2bb7279f7897b87bb6854b783c60e80311ae3079",
    1000: "684cf59ba83309552800ef566f2f4d3c1c3887c49360e3875f2eb94d99532c51",
    10 ** 6: "7c3911e0ab2586fd864497297e575e6f3bc601c0883c30df5f4dd2d24f665424",
}
X448_START = (5).to_bytes(56, "little")
X448_ITER = {
    1: "3f482c8a9f19b01e6c46ee9711d9dc14fd4bf67af30765c2ae2b846a4d23a8cd"
       "0db897086239492caf350b51f833868b9bc2b3bca9cf4113",
    1000: "aa3b4749d55b9daf1e5b00288826c467274ce3ebbdd5c17b975e09d4af6c67cf"
          "10d087202db88286e2b79fceea3ec353ef54faa26e219f38",
    10 ** 6: None,   # filled once the pure-int derivation completes
}


def _iterate(fn, start, n_iter):
    k = u = start
    for _ in range(n_iter):
        out, _ok = fn([k], [u], strict=False)
        k, u = out[0], k
    return k


def _run(variant, n_iter):
    from libecc_tpu.ecdh import x25519 as xdh

    if variant == "x25519":
        want = X25519_ITER[n_iter]
        fn, start = xdh.x25519_batch, X25519_START
    else:
        want = X448_ITER[n_iter]
        fn, start = xdh.x448_batch, X448_START
    if want is None:
        pytest.skip("expected constant not yet derived")
    got = _iterate(fn, start, n_iter)
    assert got.hex() == want


@pytest.mark.parametrize("variant", ["x25519", "x448"])
def test_iterated_once(variant):
    _run(variant, 1)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["x25519", "x448"])
def test_iterated_1k(variant):
    _run(variant, 1000)


@pytest.mark.skipif(os.environ.get("LIBECC_TPU_X1M", "0") != "1",
                    reason="1M-iteration vectors: set LIBECC_TPU_X1M=1")
@pytest.mark.parametrize("variant", ["x25519", "x448"])
def test_iterated_1m(variant):
    _run(variant, 10 ** 6)
