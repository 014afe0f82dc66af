"""ec_utils-compatible command line interface.

Mirrors the reference CLI (src/tests/ec_utils.c): gen_keys / sign /
verify / struct_sign / struct_verify / scalar_mult, with the same
argument shapes, file formats (structured keys and signatures,
HDR_MAGIC signed-image layout) and exit semantics.

Usage: python -m libecc_tpu <command> ...
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from . import serialization as ser
from .curves import params
from .hash.registry import get_hash

HDR_MAGIC = 0x34215609
IMAGE_TYPES = {"IMAGE_TYPE0": 1, "IMAGE_TYPE1": 2, "IMAGE_TYPE2": 3,
               "IMAGE_TYPE3": 4}

# CLI alg name -> (module path, uses Weierstrass KeyBatch)
_SCHEMES = ("ECDSA", "DECDSA", "ECGDSA", "ECKCDSA", "ECSDSA", "ECOSDSA",
            "ECFSDSA", "ECRDSA", "SM2", "BIGN", "DBIGN", "BIP0340")


def _scheme_mod(alg: str):
    from .sig import (ecdsa, ecgdsa, eckcdsa, ecsdsa, ecfsdsa, ecrdsa,
                      sm2, bign, bip0340)
    a = alg.upper()
    table = {
        "ECDSA": (ecdsa.sign_batch, ecdsa.verify_batch, None, {}),
        "DECDSA": (lambda kb, m, h, **kw: ecdsa.sign_batch(
            kb, m, h, deterministic=True), ecdsa.verify_batch, None, {}),
        "ECGDSA": (ecgdsa.sign_batch, ecgdsa.verify_batch,
                   ecgdsa.init_pub, {}),
        "ECKCDSA": (eckcdsa.sign_batch, eckcdsa.verify_batch,
                    eckcdsa.init_pub, {}),
        "ECSDSA": (ecsdsa.sign_batch, ecsdsa.verify_batch, None, {}),
        "ECOSDSA": (ecsdsa.sign_batch_osdsa, ecsdsa.verify_batch_osdsa,
                    None, {}),
        "ECFSDSA": (ecfsdsa.sign_batch, ecfsdsa.verify_batch, None, {}),
        "ECRDSA": (ecrdsa.sign_batch, ecrdsa.verify_batch, None, {}),
        "SM2": (sm2.sign_batch, sm2.verify_batch, None, {}),
        "BIGN": (bign.sign_batch, bign.verify_batch, None, {}),
        "DBIGN": (bign.sign_batch_dbign, bign.verify_batch_dbign, None, {}),
        "BIP0340": (bip0340.sign_batch, bip0340.verify_batch, None, {}),
    }
    if a not in table:
        raise SystemExit(f"unknown signature algorithm {alg!r}; "
                         f"known: {', '.join(_SCHEMES)}")
    return table[a]


def _read(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def _write(path: str, data: bytes):
    with open(path, "wb") as f:
        f.write(data)


def _load_priv(curve, alg, path):
    from .sig import keys as K
    raw, is_priv, alg_name, curve_name = ser.structured_key_import(
        _read(path), expect_priv=True)
    if curve_name != curve.name.upper():
        raise SystemExit(f"key curve {curve_name} != requested {curve.name}")
    _, _, init_pub, _ = _scheme_mod(alg)
    return K.keygen(curve, alg, 1,
                    priv_ints=[int.from_bytes(raw, "big")],
                    init_pub=init_pub)


def _load_pub(curve, alg, path):
    from .sig import keys as K
    raw, is_priv, alg_name, curve_name = ser.structured_key_import(
        _read(path), expect_priv=False)
    x, y = ser.import_pub_projective(curve, raw)
    return K.pubkey_batch_from_affine_ints(curve, alg, [x], [y])


def cmd_gen_keys(argv):
    if len(argv) != 3:
        raise SystemExit("usage: gen_keys <curve> <alg> <prefix>")
    cname, alg, prefix = argv
    curve = params.get_curve(cname)
    from .sig import keys as K
    _, _, init_pub, _ = _scheme_mod(alg)
    kb = K.keygen(curve, alg.upper(), 1, init_pub=init_pub)
    q_len = (curve.q.bit_length() + 7) // 8
    priv_raw = kb.priv_ints()[0].to_bytes(q_len, "big")
    xs, ys, _ = kb.pub_affine_ints()
    pub_raw = ser.export_pub_projective(curve, xs, ys)[0]
    _write(prefix + "_private_key.bin",
           ser.structured_key_export(priv_raw, True, alg, curve.name))
    _write(prefix + "_public_key.bin",
           ser.structured_key_export(pub_raw, False, alg, curve.name))
    print(f"wrote {prefix}_private_key.bin / {prefix}_public_key.bin")
    return 0


def _sign_blob(curve, alg, hash_name, data, kb, adata=None):
    sign, _, _, _ = _scheme_mod(alg)
    kw = {}
    if adata is not None:
        kw["adata"] = adata
    sigs, ok = sign(kb, [data], hash_name, **kw)
    if not bool(np.asarray(ok).all()):
        raise SystemExit("signing failed")
    return sigs[0]


def cmd_sign(argv):
    if len(argv) not in (6, 7):
        raise SystemExit("usage: sign <curve> <alg> <hash> <infile> "
                         "<privkey> <sigfile> [adata]")
    cname, alg, hname, infile, keyfile, sigfile = argv[:6]
    adata = argv[6].encode() if len(argv) == 7 else None
    curve = params.get_curve(cname)
    kb = _load_priv(curve, alg, keyfile)
    sig = _sign_blob(curve, alg, hname, _read(infile), kb, adata)
    _write(sigfile, ser.structured_sig_export(sig, alg, hname, curve.name))
    print(f"wrote {sigfile} ({len(sig)}-byte {alg.upper()} signature)")
    return 0


def cmd_verify(argv):
    if len(argv) not in (6, 7):
        raise SystemExit("usage: verify <curve> <alg> <hash> <infile> "
                         "<pubkey> <sigfile> [adata]")
    cname, alg, hname, infile, keyfile, sigfile = argv[:6]
    adata = argv[6].encode() if len(argv) == 7 else None
    curve = params.get_curve(cname)
    raw_sig, alg_name, hash_name, curve_name = ser.structured_sig_import(
        _read(sigfile))
    if (alg_name != alg.upper() or curve_name != curve.name.upper()):
        print("signature metadata mismatch")
        return 1
    kb = _load_pub(curve, alg, keyfile)
    _, verify, _, _ = _scheme_mod(alg)
    kw = {"adata": adata} if adata is not None else {}
    acc = verify(kb, [_read(infile)], [raw_sig], hname, **kw)
    ok = bool(np.asarray(acc).all())
    print("signature OK" if ok else "signature KO")
    return 0 if ok else 1


def cmd_struct_sign(argv):
    if len(argv) not in (8, 9):
        raise SystemExit("usage: struct_sign <curve> <alg> <hash> <infile> "
                         "<privkey> <outfile> <hdr_type> <version> [adata]")
    cname, alg, hname, infile, keyfile, outfile, hdr_type, version = argv[:8]
    adata = argv[8].encode() if len(argv) == 9 else None
    curve = params.get_curve(cname)
    kb = _load_priv(curve, alg, keyfile)
    data = _read(infile)
    from .sig import wcore
    _, _, _, _ = _scheme_mod(alg)
    # deterministically sized structured signature
    probe = _sign_blob(curve, alg, hname, b"probe", kb, adata)
    siglen = len(ser.structured_sig_export(probe, alg, hname, curve.name))
    hdr = struct.pack("<IIIII", HDR_MAGIC,
                      IMAGE_TYPES.get(hdr_type, 0), int(version),
                      len(data), siglen)
    sig = _sign_blob(curve, alg, hname, hdr + data, kb, adata)
    _write(outfile, hdr + data
           + ser.structured_sig_export(sig, alg, hname, curve.name))
    print(f"wrote {outfile} (signed image, {len(data)} data bytes)")
    return 0


def cmd_struct_verify(argv):
    if len(argv) not in (5, 6):
        raise SystemExit("usage: struct_verify <curve> <alg> <hash> "
                         "<image> <pubkey> [adata]")
    cname, alg, hname, infile, keyfile = argv[:5]
    adata = argv[5].encode() if len(argv) == 6 else None
    curve = params.get_curve(cname)
    blob = _read(infile)
    if len(blob) < 20:
        print("image too short")
        return 1
    magic, itype, version, dlen, siglen = struct.unpack("<IIIII", blob[:20])
    if magic != HDR_MAGIC:
        print(f"bad magic {magic:#x}")
        return 1
    if len(blob) != 20 + dlen + siglen:
        print("image length mismatch")
        return 1
    signed = blob[:20 + dlen]
    raw_sig, alg_name, hash_name, curve_name = ser.structured_sig_import(
        blob[20 + dlen:])
    kb = _load_pub(curve, alg, keyfile)
    _, verify, _, _ = _scheme_mod(alg)
    kw = {"adata": adata} if adata is not None else {}
    acc = verify(kb, [signed], [raw_sig], hname, **kw)
    ok = bool(np.asarray(acc).all())
    print("signed image OK" if ok else "signed image KO")
    return 0 if ok else 1


def cmd_scalar_mult(argv):
    if len(argv) != 4:
        raise SystemExit("usage: scalar_mult <curve> <scalar_bin> "
                         "<point_bin> <outfile>")
    cname, scalar_file, point_file, outfile = argv
    curve = params.get_curve(cname)
    import jax.numpy as jnp
    from .nn import core as nn
    from .sig import wcore
    from .curves.shortw import PrjPoint, to_affine_plain
    from .curves import scalar_mul
    k = int.from_bytes(_read(scalar_file), "big")
    x, y = ser.import_pub_projective(curve, _read(point_file))
    P = curve.point_from_affine_ints([x], [y])
    k_dev = wcore.scalars_dev(curve.q_ctx, [k])
    W = scalar_mul.ladder_mul(curve, jnp.asarray(k_dev), P)
    wx, wy, inf = to_affine_plain(curve, W)
    if bool(np.asarray(inf).any()):
        print("result is the point at infinity")
        return 1
    xs = nn.batch_from_limbs(np.asarray(wx))
    ys = nn.batch_from_limbs(np.asarray(wy))
    _write(outfile, ser.export_pub_projective(curve, xs, ys)[0])
    print(f"wrote {outfile}")
    return 0


def cmd_self_tests(argv):
    from . import self_tests
    return self_tests.main(argv)


def cmd_import_curve(argv):
    """Register a user curve from an RFC3279 DER/PEM ECParameters file
    (the expand_libecc.py --ECfile flow, run at runtime instead of
    codegen) and print its parameters."""
    if len(argv) not in (1, 2):
        raise SystemExit("usage: import_curve <params.der|.pem> [name]")
    from .curves import asn1
    name = asn1.load_curve_file(_read(argv[0]),
                                name=argv[1] if len(argv) == 2 else None)
    c = params.get_curve(name)
    print(f"registered curve {name}: p={c.fp_ctx.p_int:#x} q={c.q:#x} "
          f"h={c.h}")
    return 0


def cmd_export_curve(argv):
    if len(argv) != 2:
        raise SystemExit("usage: export_curve <curve> <out.pem>")
    from .curves import asn1
    _write(argv[1], asn1.export_ec_parameters(argv[0], pem=True))
    print(f"wrote explicit ECParameters PEM for {argv[0]} to {argv[1]}")
    return 0


def cmd_arith_stream(argv):
    """Generate or run an opcode differential stream (the reference's
    arithmetic_tests harness, SURVEY §4.2)."""
    if len(argv) < 1 or argv[0] not in ("gen", "run"):
        raise SystemExit("usage: arith_stream gen <n> [seed] | "
                         "arith_stream run <file>")
    from . import arith_stream as ast
    if argv[0] == "gen":
        n = int(argv[1]) if len(argv) > 1 else 8
        seed = int(argv[2], 0) if len(argv) > 2 else 0xA17
        print("\n".join(ast.generate(n, seed)))
        return 0
    lines = _read(argv[1]).decode().splitlines()
    res = ast.run_stream(lines)
    nf = len(res["failures"])
    print(f"{res['total'] - nf}/{res['total']} ops OK")
    for ln, got in res["failures"][:20]:
        print(f"  FAIL {ln}\n    got {got}")
    return 1 if nf else 0


COMMANDS = {
    "gen_keys": cmd_gen_keys,
    "sign": cmd_sign,
    "verify": cmd_verify,
    "struct_sign": cmd_struct_sign,
    "struct_verify": cmd_struct_verify,
    "scalar_mult": cmd_scalar_mult,
    "self_tests": cmd_self_tests,
    "import_curve": cmd_import_curve,
    "export_curve": cmd_export_curve,
    "arith_stream": cmd_arith_stream,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(__doc__)
        print("commands:", ", ".join(COMMANDS))
        return 0 if argv else 1
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; known: {', '.join(COMMANDS)}")
        return 1
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
