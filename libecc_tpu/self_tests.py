"""Runtime self-tests: the ec_self_tests analog (reference:
src/tests/ec_self_tests.c with modes vectors / rand / perf,
ec_self_tests_core.c).

  vectors: known-answer tests — hash KATs and fixed-nonce signature KATs
           (the bundled oracle vectors) executed through the public API.
  rand:    property tests — keygen, sign/verify roundtrip with random
           streaming splits, corruption rejection.
  perf:    ops/s per (scheme, curve, hash) triple, batched
           (reference protocol: ec_self_tests_core.c:1571 PERF_NUM_OP).

Run: python -m libecc_tpu self_tests [vectors|rand|perf] [filters...]
Filters: sign=NAME hash=NAME curve=NAME (reference CLI compatible).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from .curves import params
from .hash.registry import get_hash

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")


def _sig_modules():
    from .sig import (ecdsa, ecgdsa, eckcdsa, ecsdsa, ecfsdsa, ecrdsa,
                      sm2, bign, bip0340)
    return {
        "ECDSA": (ecdsa.sign_batch, ecdsa.verify_batch, None),
        "DECDSA": (lambda kb, m, h, **kw: ecdsa.sign_batch(
            kb, m, h, deterministic=True, **kw),
            ecdsa.verify_batch, None),
        "ECGDSA": (ecgdsa.sign_batch, ecgdsa.verify_batch, ecgdsa.init_pub),
        "ECKCDSA": (eckcdsa.sign_batch, eckcdsa.verify_batch,
                    eckcdsa.init_pub),
        "ECSDSA": (ecsdsa.sign_batch, ecsdsa.verify_batch, None),
        "ECOSDSA": (ecsdsa.sign_batch_osdsa, ecsdsa.verify_batch_osdsa,
                    None),
        "ECFSDSA": (ecfsdsa.sign_batch, ecfsdsa.verify_batch, None),
        "ECRDSA": (ecrdsa.sign_batch, ecrdsa.verify_batch, None),
        "SM2": (sm2.sign_batch, sm2.verify_batch, None),
        "BIGN": (bign.sign_batch, bign.verify_batch, None),
        "DBIGN": (bign.sign_batch_dbign, bign.verify_batch_dbign, None),
        "BIP0340": (bip0340.sign_batch, bip0340.verify_batch, None),
    }


def _filters(args):
    f = {"sign": None, "hash": None, "curve": None}
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            if k in f:
                f[k] = v.upper()
    return f


def run_vectors(args=()) -> bool:
    """Known-answer self tests through the public API."""
    ok_all = True
    flt = _filters(args)
    # hash KATs
    path = os.path.join(VEC_DIR, "hash_kats.jsonl")
    if os.path.exists(path) and not flt["sign"] and not flt["curve"]:
        lens = [0, 3, 55, 56, 64, 65, 137, 1000]

        def msg(ln):
            if ln == 0:
                return b""
            if ln == 3:
                return b"abc"
            idx = lens.index(ln)
            return bytes(((j * 7 + idx * 31) & 0xFF) for j in range(ln))

        n_ok = n_tot = 0
        for line in open(path):
            k = json.loads(line)
            if flt["hash"] and k["alg"].upper() != flt["hash"]:
                continue
            got = get_hash(k["alg"]).hash(msg(k["len"])).hex()
            n_tot += 1
            n_ok += got == k["digest"]
        print(f"[vectors] hash KATs: {n_ok}/{n_tot} OK")
        ok_all &= n_ok == n_tot
    # signature KATs (fixed key + fixed nonce, oracle-generated)
    path = os.path.join(VEC_DIR, "sig_kats.jsonl")
    if os.path.exists(path):
        from .sig import keys as K
        from .sig import bign as bign_mod, bip0340 as bip_mod
        mods = _sig_modules()
        n_ok = n_tot = 0
        for line in open(path):
            kat = json.loads(line)
            if flt["sign"] and kat["alg"] != flt["sign"]:
                continue
            if flt["curve"] and kat["curve"].upper() != flt["curve"]:
                continue
            if flt["hash"] and kat["hash"].upper() != flt["hash"]:
                continue
            curve = params.get_curve(kat["curve"])
            q = curve.q
            priv = int.from_bytes(
                ORACLE_PRIV[: (q.bit_length() + 7) // 8], "big")
            nonce = int.from_bytes(ORACLE_K, "big") % q
            sign, verify, init_pub = mods[kat["alg"]]
            kb = K.keygen(curve, kat["alg"], 1, priv_ints=[priv],
                          init_pub=init_pub)
            msg = [kat["msg"].encode()]
            if kat["alg"] == "BIP0340":
                aux = (int.from_bytes(ORACLE_K, "big")
                       % (1 << 256)).to_bytes(32, "big")
                sigs, _ = bip_mod.sign_batch(kb, msg, kat["hash"],
                                             aux=[aux])
            elif kat["alg"] in ("DECDSA", "DBIGN"):
                sigs, _ = sign(kb, msg, kat["hash"])
            else:
                sigs, _ = sign(kb, msg, kat["hash"], nonces=[nonce])
            good = sigs[0].hex() == kat["sig"]
            acc = verify(kb, msg, sigs, kat["hash"])
            good &= bool(np.asarray(acc).all())
            n_tot += 1
            n_ok += good
            print(f"[vectors] {kat['alg']}/{kat['curve']}/{kat['hash']}: "
                  f"{'OK' if good else 'FAIL'}")
        print(f"[vectors] signature KATs: {n_ok}/{n_tot} OK")
        ok_all &= n_ok == n_tot
    return ok_all


# fixed oracle inputs used to generate tests/vectors/sig_kats.jsonl
ORACLE_K = bytes([
    0x0a, 0x5c, 0x1e, 0x77, 0x23, 0x9b, 0x4d, 0x12, 0x5f, 0x60, 0x71, 0x88,
    0x93, 0xa4, 0xb5, 0xc6, 0xd7, 0xe8, 0xf9, 0x01, 0x12, 0x23, 0x34, 0x45,
    0x56, 0x67, 0x78, 0x89, 0x9a, 0xab, 0xbc, 0xcd, 0xde, 0xef, 0xf0, 0x0f,
    0x1e, 0x2d, 0x3c, 0x4b, 0x5a, 0x69, 0x78, 0x87, 0x96, 0xa5, 0xb4, 0xc3,
    0xd2, 0xe1, 0xf0, 0x10, 0x21, 0x32, 0x43, 0x54, 0x65, 0x76, 0x87, 0x98,
    0xa9, 0xba, 0xcb, 0xdc, 0x11, 0x22])
ORACLE_PRIV = bytes([
    0x00, 0x9c, 0x32, 0x45, 0x33, 0x99, 0xe1, 0x26, 0xd8, 0x42, 0x15, 0x67,
    0x2c, 0xaf, 0x9e, 0x84, 0x40, 0x96, 0x67, 0x83, 0x4d, 0x16, 0x29, 0x0e,
    0x73, 0x61, 0x5a, 0x13, 0x9b, 0x07, 0x2d, 0x44, 0x92, 0x75, 0xee, 0x88,
    0xc7, 0x9f, 0x70, 0x41, 0x38, 0x53, 0x3a, 0xbe, 0x12, 0x90, 0x61, 0xcd,
    0x12, 0x9d, 0x91, 0x44, 0xf6, 0x77, 0xb2, 0xa8, 0x2e, 0x96, 0x1c, 0x55,
    0x09, 0x12, 0xab, 0x11, 0x33, 0x44])


def run_rand(args=(), n=4, seed=0xEC) -> bool:
    """Random property tests: roundtrip + random streaming split +
    corruption (reference: random_split_ec_sign/verify,
    ec_self_tests_core.c:123)."""
    import random
    from .sig import keys as K
    from .sig.streaming import SignContext
    rng = random.Random(seed)
    flt = _filters(args)
    mods = _sig_modules()
    combos = [("ECDSA", "SECP256R1", "SHA256"),
              ("ECGDSA", "BRAINPOOLP256R1", "SHA256"),
              ("ECSDSA", "SECP256R1", "SHA256"),
              ("ECFSDSA", "SECP256R1", "SHA256"),
              ("SM2", "SM2P256V1", "SM3")]
    ok_all = True
    for alg, cname, hname in combos:
        if flt["sign"] and alg != flt["sign"]:
            continue
        if flt["curve"] and cname != flt["curve"]:
            continue
        curve = params.get_curve(cname)
        sign, verify, init_pub = mods[alg]
        kb = K.keygen(curve, alg, n,
                      priv_ints=[rng.randrange(1, curve.q)
                                 for _ in range(n)],
                      init_pub=init_pub)
        msgs = [bytes(rng.randrange(256) for _ in range(rng.randrange(
            1, 300))) for _ in range(n)]
        nonces = [rng.randrange(1, curve.q) for _ in range(n)]
        sigs, okm = sign(kb, msgs, hname, nonces=nonces)
        acc = verify(kb, msgs, sigs, hname)
        good = bool(np.asarray(okm).all()) and bool(np.asarray(acc).all())
        # random-split streaming sign must agree
        ctx = SignContext(kb, alg, hname, nonces=nonces)
        pos = [0] * n
        while any(p < len(m) for p, m in zip(pos, msgs)):
            chunks = []
            for i in range(n):
                step = rng.randrange(1, 64)
                chunks.append(msgs[i][pos[i]: pos[i] + step])
                pos[i] = min(len(msgs[i]), pos[i] + step)
            ctx.update(chunks)
        sigs2, _ = ctx.finalize()
        good &= sigs2 == sigs
        # corruption must be rejected
        bad = [bytes([s[0] ^ 1]) + s[1:] for s in sigs]
        good &= not bool(np.asarray(verify(kb, msgs, bad, hname)).any())
        print(f"[rand] {alg}/{cname}/{hname}: {'OK' if good else 'FAIL'}")
        ok_all &= good
    if not flt["sign"] or flt["sign"] == "EDDSA25519":
        ok_all &= _rand_eddsa(rng, n)
    return ok_all


def _rand_eddsa(rng, n) -> bool:
    """EdDSA random-split round-trip through the bounded-memory streaming
    contexts: two-pass sign (pure ed25519) must match the one-shot path;
    one-pass streaming verify must accept and reject corruption."""
    from .sig import eddsa
    from .sig.streaming import EdDSASignContext, EdDSAVerifyContext
    seeds = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(n)]
    kb = eddsa.EdDSAKeyBatch("ed25519", seeds)
    msgs = [bytes(rng.randrange(256) for _ in range(rng.randrange(1, 300)))
            for _ in range(n)]
    ref = eddsa.sign_batch(kb, msgs, "ed25519")

    def stream(ctx):
        pos = [0] * n
        while any(p < len(m) for p, m in zip(pos, msgs)):
            chunks = []
            for i in range(n):
                step = rng.randrange(1, 64)
                chunks.append(msgs[i][pos[i]: pos[i] + step])
                pos[i] = min(len(msgs[i]), pos[i] + step)
            ctx.update(chunks)

    ctx = EdDSASignContext(kb, "ed25519")
    stream(ctx)
    ctx.second_pass()
    stream(ctx)
    sigs = ctx.finalize()
    good = sigs == ref
    vctx = EdDSAVerifyContext(kb.pub_bytes, sigs, "ed25519")
    stream(vctx)
    good &= bool(np.asarray(vctx.finalize()).all())
    bad = [bytes([s[0] ^ 1]) + s[1:] for s in sigs]
    vctx = EdDSAVerifyContext(kb.pub_bytes, bad, "ed25519")
    stream(vctx)
    good &= not bool(np.asarray(vctx.finalize()).any())
    print(f"[rand] EDDSA25519 streaming two-pass: "
          f"{'OK' if good else 'FAIL'}")
    return good


def run_perf(args=(), batch=1024, iters=3):
    """Throughput per (scheme, curve, hash): batched sign and verify ops/s
    (reference perf protocol, scaled to batches)."""
    import random
    from .sig import keys as K
    rng = random.Random(1)
    flt = _filters(args)
    mods = _sig_modules()
    combos = [("ECDSA", "SECP256R1", "SHA256"),
              ("ECDSA", "BRAINPOOLP256R1", "SHA256"),
              ("ECDSA", "SECP384R1", "SHA384"),
              ("ECGDSA", "BRAINPOOLP256R1", "SHA256"),
              ("ECFSDSA", "SECP256R1", "SHA256"),
              ("SM2", "SM2P256V1", "SM3"),
              ("BIP0340", "SECP256K1", "SHA256")]
    rows = []
    for alg, cname, hname in combos:
        if flt["sign"] and alg != flt["sign"]:
            continue
        if flt["curve"] and cname != flt["curve"]:
            continue
        if flt["hash"] and hname != flt["hash"]:
            continue
        curve = params.get_curve(cname)
        sign, verify, init_pub = mods[alg]
        kb = K.keygen(curve, alg, batch,
                      priv_ints=[rng.randrange(1, curve.q)
                                 for _ in range(batch)],
                      init_pub=init_pub)
        msgs = [rng.randbytes(32) for _ in range(batch)]
        nonces = [rng.randrange(1, curve.q) for _ in range(batch)]
        kw = {} if alg == "BIP0340" else {"nonces": nonces}
        sigs, _ = sign(kb, msgs, hname, **kw)   # warm + compile
        t0 = time.perf_counter()
        for _ in range(iters):
            sigs, _ = sign(kb, msgs, hname, **kw)
        t_sign = (time.perf_counter() - t0) / iters
        verify(kb, msgs, sigs, hname)           # warm + compile
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = verify(kb, msgs, sigs, hname)
        t_vrfy = (time.perf_counter() - t0) / iters
        assert bool(np.asarray(acc).all())
        rows.append((alg, cname, hname, batch / t_sign, batch / t_vrfy))
        print(f"[perf] {alg:8s} {cname:18s} {hname:12s} "
              f"sign {batch / t_sign:10.0f} ops/s   "
              f"verify {batch / t_vrfy:10.0f} ops/s")
    return rows


def main(argv):
    mode = argv[0] if argv else "vectors"
    rest = argv[1:]
    if mode == "vectors":
        return 0 if run_vectors(rest) else 1
    if mode == "rand":
        return 0 if run_rand(rest) else 1
    if mode == "perf":
        run_perf(rest)
        return 0
    print("modes: vectors | rand | perf  (filters: sign= hash= curve=)")
    return 1
