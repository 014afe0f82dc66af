"""Full fixed-vector KAT matrix, bit-exact against the reference library.

tests/vectors/kats_full.jsonl is the reference's ENTIRE self-test vector
matrix (ec_self_tests_core.h:4915 ec_fixed_vector_tests[] — 128 signature
cases with their injected fixed nonces — plus ecdh_fixed_vector_tests[]
:5294 — 131 ECDH cases), dumped by the checked-in oracle driver
(scripts/oracle/kat_dump.c; regenerate with `make -C scripts/oracle kats`).
Every signature case is cross-checked by the reference itself at dump time
(ref_ok), so a green run here means byte-for-byte parity with libecc.

Cases sharing (alg, curve, hash, adata) run as ONE batch — one jit compile
and one dispatch per group. The default run covers every scheme on up to
three curves; LIBECC_TPU_FULL=1 runs all groups.
"""

import json
import os
from collections import OrderedDict

import numpy as np
import pytest

from libecc_tpu.curves import params
from libecc_tpu.sig import keys as K
from libecc_tpu.sig import (ecdsa, ecgdsa, eckcdsa, ecsdsa, ecfsdsa, ecrdsa,
                            sm2, bign, bip0340, eddsa)
from libecc_tpu.ecdh import ecccdh, x25519 as xdh

VEC = os.path.join(os.path.dirname(__file__), "vectors", "kats_full.jsonl")
FULL = os.environ.get("LIBECC_TPU_FULL", "0") == "1"

EDDSA_VARIANT = {
    "EDDSA25519": "ed25519", "EDDSA25519CTX": "ed25519ctx",
    "EDDSA25519PH": "ed25519ph", "EDDSA448": "ed448",
    "EDDSA448PH": "ed448ph",
}

# alg -> (sign(kb,msgs,hash,nonces,adata), verify(kb,msgs,sigs,hash,adata),
#         init_pub)
SCHEMES = {
    "ECDSA": (lambda kb, m, h, k, a: ecdsa.sign_batch(kb, m, h, nonces=k),
              lambda kb, m, s, h, a: ecdsa.verify_batch(kb, m, s, h), None),
    "DECDSA": (lambda kb, m, h, k, a: ecdsa.sign_batch(kb, m, h,
                                                       deterministic=True),
               lambda kb, m, s, h, a: ecdsa.verify_batch(kb, m, s, h), None),
    "ECGDSA": (lambda kb, m, h, k, a: ecgdsa.sign_batch(kb, m, h, nonces=k),
               lambda kb, m, s, h, a: ecgdsa.verify_batch(kb, m, s, h),
               ecgdsa.init_pub),
    "ECKCDSA": (lambda kb, m, h, k, a: eckcdsa.sign_batch(kb, m, h,
                                                          nonces=k),
                lambda kb, m, s, h, a: eckcdsa.verify_batch(kb, m, s, h),
                eckcdsa.init_pub),
    "ECSDSA": (lambda kb, m, h, k, a: ecsdsa.sign_batch(kb, m, h, nonces=k),
               lambda kb, m, s, h, a: ecsdsa.verify_batch(kb, m, s, h),
               None),
    "ECOSDSA": (lambda kb, m, h, k, a: ecsdsa.sign_batch_osdsa(kb, m, h,
                                                               nonces=k),
                lambda kb, m, s, h, a: ecsdsa.verify_batch_osdsa(kb, m, s,
                                                                 h), None),
    "ECFSDSA": (lambda kb, m, h, k, a: ecfsdsa.sign_batch(kb, m, h,
                                                          nonces=k),
                lambda kb, m, s, h, a: ecfsdsa.verify_batch(kb, m, s, h),
                None),
    "ECRDSA": (lambda kb, m, h, k, a: ecrdsa.sign_batch(kb, m, h, nonces=k),
               lambda kb, m, s, h, a: ecrdsa.verify_batch(kb, m, s, h),
               None),
    # the reference's USE_ISO14888_3_ECRDSA build variant (big-endian
    # digest import) — dumped by scripts/oracle/kat_dump_iso
    "ECRDSA_ISO14888": (
        lambda kb, m, h, k, a: ecrdsa.sign_batch(kb, m, h, nonces=k,
                                                 iso14888=True),
        lambda kb, m, s, h, a: ecrdsa.verify_batch(kb, m, s, h,
                                                   iso14888=True), None),
    "SM2": (lambda kb, m, h, k, a: sm2.sign_batch(kb, m, h, nonces=k,
                                                  adata=a),
            lambda kb, m, s, h, a: sm2.verify_batch(kb, m, s, h, adata=a),
            None),
    "BIGN": (lambda kb, m, h, k, a: bign.sign_batch(kb, m, h, nonces=k,
                                                    adata=a),
             lambda kb, m, s, h, a: bign.verify_batch(kb, m, s, h, adata=a),
             None),
    "DBIGN": (lambda kb, m, h, k, a: bign.sign_batch_dbign(kb, m, h,
                                                           adata=a),
              lambda kb, m, s, h, a: bign.verify_batch_dbign(kb, m, s, h,
                                                             adata=a), None),
    "BIP0340": (lambda kb, m, h, k, a: bip0340.sign_batch(
                    kb, m, h, aux=[x.to_bytes(32, "big") for x in k]),
                lambda kb, m, s, h, a: bip0340.verify_batch(kb, m, s, h),
                None),
}


def _load():
    sig_groups = OrderedDict()
    ecdh_groups = OrderedDict()
    with open(VEC) as f:
        for line in f:
            r = json.loads(line)
            if "alg" in r:
                alg = r["alg"] + ("_ISO14888" if r.get("iso14888") else "")
                r["alg"] = alg
                key = (alg, r["curve"], r["hash"], r["adata_hex"])
                sig_groups.setdefault(key, []).append(r)
            else:
                ecdh_groups.setdefault((r["ecdh"], r["curve"]),
                                       []).append(r)
    if not FULL:
        # default (smoke tier): per alg, exactly ONE group, preferring a
        # <=256-bit curve — every (alg, curve, hash) group is its own
        # sign+verify jit compile pair (minutes each cold on this 1-CPU
        # host), so the sample must be one compile pair per scheme, on
        # the cheapest limb count. The Ed448 family (K=32 limbs, the
        # most expensive compiles in the suite) runs at nightly tier
        # only; its field/ladder arithmetic stays smoke-covered by the
        # X448 RFC 7748 single-iteration test and the Wycheproof corpus.
        def rank(curve):
            # SECP256R1 groups share their sign/verify programs with the
            # rest of the default tier (test_ecdsa, wycheproof, blinding)
            if curve == "SECP256R1":
                return 0
            return 1 if params.get_curve(curve).q.bit_length() <= 256 else 2

        chosen = {}
        for key in sig_groups:
            alg, curve = key[0], key[1]
            if alg in ("EDDSA448", "EDDSA448PH"):
                continue
            prev = chosen.get(alg)
            if prev is None or rank(curve) < rank(prev[1]):
                chosen[alg] = key
        sig_groups = OrderedDict((k, sig_groups[k]) for k in chosen.values())
        ecdh_groups = OrderedDict(
            (k, v) for k, v in ecdh_groups.items()
            if k[0] in ("X25519", "X448") or k[1] == "SECP256R1")
    return sig_groups, ecdh_groups


SIG_GROUPS, ECDH_GROUPS = _load()


def _gid(key):
    alg, curve, hash_name, adata = key
    return f"{alg}-{curve}-{hash_name}" + ("-ad" if adata else "")


@pytest.mark.parametrize("key", list(SIG_GROUPS), ids=_gid)
def test_sig_kat_group(key):
    alg, curve_name, hash_name, adata_hex = key
    rows = SIG_GROUPS[key]
    msgs = [bytes.fromhex(r["msg_hex"]) for r in rows]
    adata = bytes.fromhex(adata_hex) if adata_hex else None
    exp_sigs = [r["sig"] for r in rows]

    if alg in EDDSA_VARIANT:
        variant = EDDSA_VARIANT[alg]
        seeds = [bytes.fromhex(r["priv"]) for r in rows]
        kb = eddsa.EdDSAKeyBatch(variant, seeds)
        ctx = adata if adata is not None else b""
        sigs = eddsa.sign_batch(kb, msgs, context=ctx)
        for i, s in enumerate(sigs):
            assert s.hex() == exp_sigs[i], (
                f"{rows[i]['name']}: sig mismatch\n ours {s.hex()}"
                f"\n ref  {exp_sigs[i]}")
        acc = eddsa.verify_batch(variant, kb.pub_bytes, msgs, sigs,
                                 context=ctx)
        assert bool(np.asarray(acc).all())
        bad = [bytes([sigs[0][0] ^ 1]) + sigs[0][1:]] + sigs[1:]
        accb = eddsa.verify_batch(variant, kb.pub_bytes, msgs, bad,
                                  context=ctx)
        assert not bool(np.asarray(accb)[0])
        return

    curve = params.get_curve(curve_name)
    q = curve.q
    p = curve.fp_ctx.p_int
    p_len = (curve.fp_ctx.bits + 7) // 8
    privs = [int.from_bytes(bytes.fromhex(r["priv"]), "big") for r in rows]
    nonces = [int.from_bytes(bytes.fromhex(r["nonce"]), "big")
              if r["nonce"] else None for r in rows]
    if alg == "BIP0340":
        ks = [int.from_bytes(bytes.fromhex(r["nonce"]), "big")
              for r in rows]  # raw aux bytes, NOT reduced mod q
    else:
        ks = [n % q if n is not None else None for n in nonces]

    sign, verify, init_pub = SCHEMES[alg]
    kb = K.keygen(curve, alg, len(rows), priv_ints=privs, init_pub=init_pub)

    # cross-check public keys against the reference's projective export
    xs, ys, _ = kb.pub_affine_ints()
    for i, r in enumerate(rows):
        pub = bytes.fromhex(r["pub"])
        X = int.from_bytes(pub[:p_len], "big")
        Y = int.from_bytes(pub[p_len:2 * p_len], "big")
        Z = int.from_bytes(pub[2 * p_len:], "big")
        zi = pow(Z, -1, p)
        assert xs[i] == X * zi % p and ys[i] == Y * zi % p, (
            f"{r['name']}: pubkey mismatch")

    sigs, ok = sign(kb, msgs, hash_name, ks, adata)
    assert bool(np.asarray(ok).all())
    for i, s in enumerate(sigs):
        assert s.hex() == exp_sigs[i], (
            f"{rows[i]['name']}: sig mismatch\n ours {s.hex()}"
            f"\n ref  {exp_sigs[i]}")

    acc = verify(kb, msgs, sigs, hash_name, adata)
    assert bool(np.asarray(acc).all())
    bad = [bytes([sigs[0][0] ^ 1]) + sigs[0][1:]] + sigs[1:]
    accb = verify(kb, msgs, bad, hash_name, adata)
    assert not bool(np.asarray(accb)[0])


@pytest.mark.parametrize("key", list(ECDH_GROUPS),
                         ids=lambda k: f"{k[0]}-{k[1]}")
def test_ecdh_kat_group(key):
    kind, curve_name = key
    rows = ECDH_GROUPS[key]
    if kind == "ECCCDH":
        curve = params.get_curve(curve_name)
        p_len = (curve.fp_ctx.bits + 7) // 8
        privs = [int.from_bytes(bytes.fromhex(r["priv"]), "big")
                 for r in rows]
        kb = ecccdh.keygen(curve, len(rows), priv_ints=privs)
        pubs = ecccdh.export_pub(kb)
        for i, r in enumerate(rows):
            assert pubs[i].hex() == r["our_pub"], (
                f"{r['name']}: pub mismatch")
        peer = [bytes.fromhex(r["peer_pub"]) for r in rows]
        secrets, ok = ecccdh.derive_shared_secret(kb, peer)
        assert bool(np.asarray(ok).all())
        for i, r in enumerate(rows):
            assert secrets[i].hex() == r["shared"], (
                f"{r['name']}: shared-secret mismatch")
    else:
        fn = xdh.x25519_batch if kind == "X25519" else xdh.x448_batch
        base = (b"\x09" + b"\x00" * 31 if kind == "X25519"
                else b"\x05" + b"\x00" * 55)
        privs = [bytes.fromhex(r["priv"]) for r in rows]
        peers = [bytes.fromhex(r["peer_pub"]) for r in rows]
        ours, ok1 = fn(privs, [base] * len(rows))
        shared, ok2 = fn(privs, peers)
        assert np.asarray(ok1).all() and np.asarray(ok2).all()
        for i, r in enumerate(rows):
            assert ours[i].hex() == r["our_pub"], f"{r['name']}: pub"
            assert shared[i].hex() == r["shared"], f"{r['name']}: shared"
