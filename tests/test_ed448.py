"""Ed448 / Ed448ph RFC 8032 known-answer tests (section 7.4 vectors).

Reference parity: src/sig/eddsa.c EDDSA448/EDDSA448PH (vector headers
src/tests/ed448_test_vectors.h, ed448ph_test_vectors.h carry the same
RFC 8032 vectors).
"""

import pytest
import numpy as np

from libecc_tpu.sig import eddsa

# nightly tier (Ed448 (37-limb) compiles); smoke skips, LIBECC_TPU_FULL=1 runs
pytestmark = pytest.mark.slow

V_BLANK = dict(
    secret="6c82a562cb808d10d632be89c8513ebf6c929f34ddfa8c9f63c9960ef6e348a3"
           "528c8a3fcc2f044e39a3fc5b94492f8f032e7549a20098f95b",
    public="5fd7449b59b461fd2ce787ec616ad46a1da1342485a70e1f8a0ea75d80e96778"
           "edf124769b46c7061bd6783df1e50f6cd1fa1abeafe8256180",
    msg="",
    ctx="",
    sig="533a37f6bbe457251f023c0d88f976ae2dfb504a843e34d2074fd823d41a591f"
        "2b233f034f628281f2fd7a22ddd47d7828c59bd0a21bfd3980ff0d2028d4b18a"
        "9df63e006c5d1c2d345b925d8dc00b4104852db99ac5c7cdda8530a113a0f4db"
        "b61149f05a7363268c71d95808ff2e652600",
)

V_1OCTET = dict(
    secret="c4eab05d357007c632f3dbb48489924d552b08fe0c353a0d4a1f00acda2c463a"
           "fbea67c5e8d2877c5e3bc397a659949ef8021e954e0a12274e",
    public="43ba28f430cdff456ae531545f7ecd0ac834a55d9358c0372bfa0c6c6798c086"
           "6aea01eb00742802b8438ea4cb82169c235160627b4c3a9480",
    msg="03",
    ctx="",
    sig="26b8f91727bd62897af15e41eb43c377efb9c610d48f2335cb0bd0087810f435"
        "2541b143c4b981b7e18f62de8ccdf633fc1bf037ab7cd779805e0dbcc0aae1cb"
        "cee1afb2e027df36bc04dcecbf154336c19f0af7e0a6472905e799f1953d2a0f"
        "f3348ab21aa4adafd1d234441cf807c03a00",
)

V_1OCTET_CTX = dict(
    secret=V_1OCTET["secret"],
    public=V_1OCTET["public"],
    msg="03",
    ctx="666f6f",
    sig="d4f8f6131770dd46f40867d6fd5d5055de43541f8c5e35abbcd001b32a89f7d2"
        "151f7647f11d8ca2ae279fb842d607217fce6e042f6815ea000c85741de5c8da"
        "1144a6a1aba7f96de42505d7a7298524fda538fccbbb754f578c1cad10d54d0d"
        "5428407e85dcbc98a49155c13764e66c3c00",
)

V_PH_ABC = dict(
    secret="833fe62409237b9d62ec77587520911e9a759cec1d19755b7da901b96dca3d42"
           "ef7822e0d5104127dc05d6dbefde69e3ab2cec7c867c6e2c49",
    public="259b71c19f83ef77a7abd26524cbdb3161b590a48f7d17de3ee0ba9c52beb743"
           "c09428a131d6b1b57303d90d8132c276d5ed3d5d01c0f53880",
    msg="616263",
    ctx="",
    sig="822f6901f7480f3d5f562c592994d9693602875614483256505600bbc281ae38"
        "1f54d6bce2ea911574932f52a4e6cadd78769375ec3ffd1b801a0d9b3f4030cd"
        "433964b6457ea39476511214f97469b57dd32dbc560a9a94d00bff07620464a3"
        "ad203df7dc7ce360c3cd3696d9d9fab90f00",
)


def _run(vecs, variant):
    seeds = [bytes.fromhex(v["secret"]) for v in vecs]
    kb = eddsa.EdDSAKeyBatch(variant, seeds)
    for i, v in enumerate(vecs):
        assert kb.pub_bytes[i].hex() == v["public"], "pubkey mismatch"
    msgs = [bytes.fromhex(v["msg"]) for v in vecs]
    ctx = bytes.fromhex(vecs[0]["ctx"])
    sigs = eddsa.sign_batch(kb, msgs, variant, context=ctx)
    for i, v in enumerate(vecs):
        assert sigs[i].hex() == v["sig"], (
            f"sig mismatch\n ours {sigs[i].hex()}\n ref  {v['sig']}")
    acc = eddsa.verify_batch(variant, kb.pub_bytes, msgs, sigs, context=ctx)
    assert acc.all()
    # negatives
    bad = eddsa.verify_batch(variant, kb.pub_bytes,
                             [m + b"x" for m in msgs], sigs, context=ctx)
    assert not bad.any()
    bsig = [bytes([s[0] ^ 1]) + s[1:] for s in sigs]
    bad2 = eddsa.verify_batch(variant, kb.pub_bytes, msgs, bsig, context=ctx)
    assert not bad2.any()


def test_ed448_rfc8032():
    _run([V_BLANK, V_1OCTET], "ed448")


def test_ed448_context():
    _run([V_1OCTET_CTX], "ed448")


def test_ed448ph_rfc8032():
    _run([V_PH_ABC], "ed448ph")
