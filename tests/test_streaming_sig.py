"""Streaming IUF sign/verify contexts vs the one-shot batch APIs.

Reference surface: ec_sign_init/update/finalize (sig_algs.c:294+,
sig_algs_internal.h:60-77). Each scheme signs the same messages with the
same fixed nonces through SignContext (update in odd-sized chunks) and
through the scheme's one-shot sign_batch; signatures must be
byte-identical and VerifyContext must accept. Also checks context
invalidation after finalize (ecdsa_common.c:571-573 parity).
"""

import numpy as np
import pytest

from libecc_tpu import cli
from libecc_tpu.curves import params
from libecc_tpu.sig import keys as K
from libecc_tpu.sig.streaming import SignContext, VerifyContext

# nightly tier (streaming contexts across schemes); smoke skips, LIBECC_TPU_FULL=1 runs
# Tier note: full scheme matrix is nightly; one ECDSA streaming
# roundtrip stays in the default (smoke) tier (round-4 verdict:
# no subsystem may be invisible to the default run).

N = 3
MSGS = [b"streaming-iuf-" + bytes([65 + i]) * (5 + 11 * i)
        for i in range(N)]
NONCES = [0x1234567 + 0x9E3779B9 * i for i in range(N)]
PRIVS = [0xA5A5A5 + 7919 * i for i in range(N)]

# (scheme, hash) — the scheme's reference-default hash
CASES = [
    ("ECDSA", "SHA256"), ("DECDSA", "SHA256"), ("ECGDSA", "SHA256"),
    ("ECRDSA", "STREEBOG256"), ("BIGN", "BELT_HASH"),
    ("DBIGN", "BELT_HASH"), ("ECSDSA", "SHA256"), ("ECOSDSA", "SHA256"),
    ("ECFSDSA", "SHA256"), ("ECKCDSA", "SHA256"), ("SM2", "SM3"),
]
_DETERMINISTIC = {"DECDSA", "DBIGN"}


def _keys(scheme):
    c = params.get_curve("P-256")
    _, _, init_pub, _ = cli._scheme_mod(scheme)
    return c, K.keygen(c, scheme, N, priv_ints=PRIVS, init_pub=init_pub)


@pytest.mark.parametrize("scheme,hash_name", CASES)
@pytest.mark.slow
def test_streaming_matches_oneshot(scheme, hash_name):
    c, kb = _keys(scheme)
    sign_fn, verify_fn, _, _ = cli._scheme_mod(scheme)
    nonces = None if scheme in _DETERMINISTIC else NONCES
    if scheme in _DETERMINISTIC:
        ref_sigs, ref_ok = sign_fn(kb, MSGS, hash_name)
    else:
        ref_sigs, ref_ok = sign_fn(kb, MSGS, hash_name, nonces=nonces)
    assert np.asarray(ref_ok).all()

    ctx = SignContext(kb, scheme, hash_name, nonces=nonces)
    # odd-sized per-lane chunks exercise the buffering boundaries
    ctx.update([m[:7] for m in MSGS])
    ctx.update([m[7:] for m in MSGS])
    sigs, ok = ctx.finalize()
    assert np.asarray(ok).all()
    assert sigs == ref_sigs

    vctx = VerifyContext(kb, scheme, sigs, hash_name)
    vctx.update([m[:3] for m in MSGS])
    vctx.update([m[3:] for m in MSGS])
    acc = np.asarray(vctx.finalize())
    assert acc.all()


@pytest.mark.parametrize("variant", ["ed25519", "ed25519ph"])
@pytest.mark.slow
def test_eddsa_streaming_matches_oneshot(variant):
    """Bounded-memory EdDSA streaming: two-pass protocol for pure
    variants, one-pass (through the prehash) for ph — byte-identical to
    the one-shot sign_batch; EdDSAVerifyContext streams verification in
    one pass for both."""
    from libecc_tpu.sig import eddsa
    from libecc_tpu.sig.streaming import (EdDSASignContext,
                                          EdDSAVerifyContext)
    seeds = [bytes([i * 37 + 1]) * 32 for i in range(N)]
    kb = eddsa.EdDSAKeyBatch(variant, seeds)
    ref_sigs = eddsa.sign_batch(kb, MSGS, variant)

    ctx = EdDSASignContext(kb, variant)
    ctx.update([m[:5] for m in MSGS])
    ctx.update([m[5:] for m in MSGS])
    if not ctx.v.phflag:
        with pytest.raises(RuntimeError):
            ctx.finalize()          # pure EdDSA: second pass required
        ctx = EdDSASignContext(kb, variant)
        ctx.update([m[:5] for m in MSGS])
        ctx.update([m[5:] for m in MSGS])
        ctx.second_pass()
        # pass 2 streams the same bytes at different chunk boundaries
        ctx.update([m[:11] for m in MSGS])
        ctx.update([m[11:] for m in MSGS])
    sigs = ctx.finalize()
    assert sigs == ref_sigs
    with pytest.raises(RuntimeError):
        ctx.finalize()

    vctx = EdDSAVerifyContext(kb.pub_bytes, sigs, variant)
    vctx.update([m[:3] for m in MSGS])
    vctx.update([m[3:] for m in MSGS])
    assert np.asarray(vctx.finalize()).all()

    # tampered lane rejected through the streaming verifier
    bad = list(sigs)
    bad[0] = bytes([bad[0][0] ^ 1]) + bad[0][1:]
    vctx = EdDSAVerifyContext(kb.pub_bytes, bad, variant)
    vctx.update(MSGS)
    acc = np.asarray(vctx.finalize())
    assert not acc[0] and acc[1:].all()


@pytest.mark.slow
def test_eddsa_two_pass_length_mismatch():
    from libecc_tpu.sig import eddsa
    from libecc_tpu.sig.streaming import EdDSASignContext
    seeds = [bytes([i + 9]) * 32 for i in range(N)]
    kb = eddsa.EdDSAKeyBatch("ed25519", seeds)
    ctx = EdDSASignContext(kb, "ed25519")
    ctx.update(MSGS)
    ctx.second_pass()
    ctx.update([m[:4] for m in MSGS])   # shorter second pass
    with pytest.raises(ValueError):
        ctx.finalize()
    # generic SignContext refuses EdDSA and points at the right API
    with pytest.raises(TypeError):
        SignContext(kb, "EDDSA25519")


@pytest.mark.slow
def test_bip0340_streaming_verify():
    """BIP0340 verification streams: the tagged-hash prefix
    H(tag)||H(tag)||Rx||Px is absorbed at init, the message streams."""
    from libecc_tpu.sig import bip0340
    c = params.get_curve("SECP256K1")
    kb = K.keygen(c, "BIP0340", N, priv_ints=PRIVS,
                  init_pub=cli._scheme_mod("BIP0340")[2])
    sigs, ok = bip0340.sign_batch(kb, MSGS, "SHA256",
                                  aux=[b"\x07" * 32] * N)
    assert np.asarray(ok).all()
    vctx = VerifyContext(kb, "BIP0340", sigs, "SHA256")
    vctx.update([m[:9] for m in MSGS])
    vctx.update([m[9:] for m in MSGS])
    assert np.asarray(vctx.finalize()).all()
    # wrong message rejected
    vctx = VerifyContext(kb, "BIP0340", sigs, "SHA256")
    vctx.update([b"x" + m[1:] for m in MSGS])
    assert not np.asarray(vctx.finalize()).any()


@pytest.mark.slow
def test_context_invalidated_after_finalize():
    _, kb = _keys("ECDSA")
    ctx = SignContext(kb, "ECDSA", "SHA256", nonces=NONCES)
    ctx.update(MSGS)
    sigs, ok = ctx.finalize()
    assert np.asarray(ok).all()
    with pytest.raises(RuntimeError):
        ctx.update(MSGS)
    with pytest.raises(RuntimeError):
        ctx.finalize()
    assert ctx._states is None and ctx._nonces is None

    vctx = VerifyContext(kb, "ECDSA", sigs, "SHA256")
    vctx.update(MSGS)
    assert np.asarray(vctx.finalize()).all()
    with pytest.raises(RuntimeError):
        vctx.finalize()
    with pytest.raises(RuntimeError):
        vctx.update(MSGS)


def test_streaming_smoke():
    """Default-tier representative: ECDSA/SHA256 streaming == one-shot."""
    test_streaming_matches_oneshot("ECDSA", "SHA256")
