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
