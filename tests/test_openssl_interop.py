"""Cross-LIBRARY validation against OpenSSL (via the `cryptography`
package): sign here / verify there and vice versa on shared curves.

The reference's analog: scripts/gen_openssl_curves_tests.sh + the
openssl-backed python test workflow (a second, independent
implementation checking the same math). Skips cleanly when the
bindings are unavailable.
"""

import numpy as np
import pytest

cryptography = pytest.importorskip("cryptography")

from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import ec, ed25519
from cryptography.hazmat.primitives.asymmetric.utils import (
    decode_dss_signature, encode_dss_signature)
from cryptography.exceptions import InvalidSignature

from libecc_tpu.curves import params
from libecc_tpu.sig import ecdsa, keys as K

CURVES = [("SECP256R1", ec.SECP256R1(), 32),
          ("SECP384R1", ec.SECP384R1(), 48),
          ("SECP256K1", ec.SECP256K1(), 32)]


@pytest.mark.parametrize("name,ossl_curve,nb", CURVES)
def test_ecdsa_sign_here_verify_openssl(name, ossl_curve, nb):
    c = params.get_curve(name)
    n = 4
    rng = np.random.RandomState(77)
    privs = [int.from_bytes(rng.bytes(nb), "big") % c.q or 1
             for _ in range(n)]
    kb = K.keygen(c, "ECDSA", n, priv_ints=privs)
    msgs = [rng.bytes(40) for _ in range(n)]
    sigs, ok = ecdsa.sign_batch(kb, msgs, "SHA256", deterministic=True)
    assert ok.all()
    for i in range(n):
        ossl_priv = ec.derive_private_key(privs[i], ossl_curve)
        pub = ossl_priv.public_key()
        r = int.from_bytes(sigs[i][:nb], "big")
        s = int.from_bytes(sigs[i][nb:], "big")
        der = encode_dss_signature(r, s)
        pub.verify(der, msgs[i], ec.ECDSA(hashes.SHA256()))  # raises on bad
        # and a corrupted message must NOT verify
        with pytest.raises(InvalidSignature):
            pub.verify(der, msgs[i] + b"x", ec.ECDSA(hashes.SHA256()))


@pytest.mark.parametrize("name,ossl_curve,nb", CURVES)
def test_ecdsa_sign_openssl_verify_here(name, ossl_curve, nb):
    c = params.get_curve(name)
    n = 4
    rng = np.random.RandomState(78)
    privs = [int.from_bytes(rng.bytes(nb), "big") % c.q or 1
             for _ in range(n)]
    msgs = [rng.bytes(51) for _ in range(n)]
    sigs = []
    for i in range(n):
        ossl_priv = ec.derive_private_key(privs[i], ossl_curve)
        der = ossl_priv.sign(msgs[i], ec.ECDSA(hashes.SHA256()))
        r, s = decode_dss_signature(der)
        sigs.append(r.to_bytes(nb, "big") + s.to_bytes(nb, "big"))
    kb = K.keygen(c, "ECDSA", n, priv_ints=privs)
    acc = ecdsa.verify_batch(kb, msgs, sigs, "SHA256")
    assert np.asarray(acc).all()
    # cross-check the public keys agree byte-for-byte (SEC1 uncompressed)
    ours = K.export_pub_sec1(kb, compressed=False)
    for i in range(n):
        theirs = ec.derive_private_key(
            privs[i], ossl_curve).public_key().public_bytes(
            serialization.Encoding.X962,
            serialization.PublicFormat.UncompressedPoint)
        assert ours[i] == theirs


def test_ed25519_interop():
    from libecc_tpu.sig import eddsa

    rng = np.random.RandomState(79)
    seeds = [rng.bytes(32) for _ in range(3)]
    msgs = [rng.bytes(33) for _ in range(3)]
    kb = eddsa.EdDSAKeyBatch("ed25519", seeds)
    sigs = eddsa.sign_batch(kb, msgs)
    for i in range(3):
        opriv = ed25519.Ed25519PrivateKey.from_private_bytes(seeds[i])
        opub = opriv.public_key()
        assert opub.public_bytes(
            serialization.Encoding.Raw,
            serialization.PublicFormat.Raw) == kb.pub_bytes[i]
        opub.verify(sigs[i], msgs[i])            # raises on mismatch
        assert opriv.sign(msgs[i]) == sigs[i]    # deterministic: equal
    # openssl-signed verifies here
    osigs = [ed25519.Ed25519PrivateKey.from_private_bytes(seeds[i]).sign(
        msgs[i]) for i in range(3)]
    acc = eddsa.verify_batch("ed25519", kb.pub_bytes, msgs, osigs)
    assert np.asarray(acc).all()


def test_x25519_interop():
    from cryptography.hazmat.primitives.asymmetric import x25519 as ox
    from libecc_tpu.ecdh import x25519 as xdh

    rng = np.random.RandomState(80)
    for _ in range(3):
        a = rng.bytes(32)
        opriv = ox.X25519PrivateKey.from_private_bytes(a)
        opub_b = opriv.public_key().public_bytes(
            serialization.Encoding.Raw, serialization.PublicFormat.Raw)
        b = rng.bytes(32)
        bpriv = ox.X25519PrivateKey.from_private_bytes(b)
        bpub_b = bpriv.public_key().public_bytes(
            serialization.Encoding.Raw, serialization.PublicFormat.Raw)
        theirs = opriv.exchange(bpriv.public_key())
        ours, ok = xdh.x25519_batch([a], [bpub_b])
        assert ok.all() and ours[0] == theirs
        # and the public key derivation agrees (u = 9 base)
        mine_pub, ok2 = xdh.x25519_batch([a], [(9).to_bytes(32, "little")])
        assert ok2.all() and mine_pub[0] == opub_b
