"""libecc-compatible structured serialization for keys and signatures.

Reference formats (byte-compatible with the reference's `ec_utils` CLI
and structured import/export API):

  * structured signature  = [alg u8 | hash u8 | curve u8] || raw sig
    (sig_algs.c ec_structured_sig_export_to_buf)
  * structured key        = [EC_PUBKEY/EC_PRIVKEY u8 | alg u8 | curve u8]
    || raw key  (ec_key.c ec_structured_*_key_export_to_buf)
  * raw public key        = FE2OS(X) || FE2OS(Y) || FE2OS(Z) projective
    (prj_pt export, prj_pt.c:536); raw private key = I2OS(x, BYTECEIL(q))

The numeric type tags mirror the reference enums (lib_ecc_types.h:22-286,
ec_key.h:31-32) so artifacts are interchangeable.
"""

from __future__ import annotations

# -- enum tables (lib_ecc_types.h) -------------------------------------------

ALG_TYPES = {
    "ECDSA": 1, "ECKCDSA": 2, "ECSDSA": 3, "ECOSDSA": 4, "ECFSDSA": 5,
    "ECGDSA": 6, "ECRDSA": 7, "SM2": 8, "EDDSA25519": 9, "EDDSA25519CTX": 10,
    "EDDSA25519PH": 11, "EDDSA448": 12, "EDDSA448PH": 13, "DECDSA": 14,
    "ECCCDH": 15, "X25519": 16, "X448": 17, "BIGN": 18, "DBIGN": 19,
    "BIP0340": 20,
}

HASH_TYPES = {
    "SHA224": 1, "SHA256": 2, "SHA384": 3, "SHA512": 4, "SHA3_224": 5,
    "SHA3_256": 6, "SHA3_384": 7, "SHA3_512": 8, "SHA512_224": 9,
    "SHA512_256": 10, "SM3": 11, "SHAKE256": 12, "STREEBOG256": 13,
    "STREEBOG512": 14, "RIPEMD160": 15, "BELT_HASH": 16, "BASH224": 17,
    "BASH256": 18, "BASH384": 19, "BASH512": 20,
}

CURVE_TYPES = {
    "FRP256V1": 1, "SECP192R1": 2, "SECP224R1": 3, "SECP256R1": 4,
    "SECP384R1": 5, "SECP521R1": 6, "BRAINPOOLP224R1": 7,
    "BRAINPOOLP256R1": 8, "BRAINPOOLP512R1": 9, "GOST256": 10, "GOST512": 11,
    "BRAINPOOLP384R1": 12, "BRAINPOOLP192R1": 13, "WEI25519": 14,
    "WEI448": 15, "SM2P256TEST": 16, "SM2P256V1": 17,
    "GOST_R3410_2012_256_PARAMSETA": 18, "SECP256K1": 19,
    "GOST_R3410_2001_TESTPARAMSET": 20,
    "GOST_R3410_2001_CRYPTOPRO_A_PARAMSET": 21,
    "GOST_R3410_2001_CRYPTOPRO_B_PARAMSET": 22,
    "GOST_R3410_2001_CRYPTOPRO_C_PARAMSET": 23,
    "GOST_R3410_2001_CRYPTOPRO_XCHA_PARAMSET": 24,
    "GOST_R3410_2001_CRYPTOPRO_XCHB_PARAMSET": 25,
    "GOST_R3410_2012_256_PARAMSETB": 26, "GOST_R3410_2012_256_PARAMSETC": 27,
    "GOST_R3410_2012_256_PARAMSETD": 28,
    "GOST_R3410_2012_512_PARAMSETTEST": 29,
    "GOST_R3410_2012_512_PARAMSETA": 30, "GOST_R3410_2012_512_PARAMSETB": 31,
    "GOST_R3410_2012_512_PARAMSETC": 32, "SECP192K1": 33, "SECP224K1": 34,
    "BRAINPOOLP192T1": 35, "BRAINPOOLP224T1": 36, "BRAINPOOLP256T1": 37,
    "BRAINPOOLP320R1": 38, "BRAINPOOLP320T1": 39, "BRAINPOOLP384T1": 40,
    "BRAINPOOLP512T1": 41, "BIGN256V1": 42, "BIGN384V1": 43, "BIGN512V1": 44,
}

ALG_NAMES = {v: k for k, v in ALG_TYPES.items()}
HASH_NAMES = {v: k for k, v in HASH_TYPES.items()}
CURVE_NAMES = {v: k for k, v in CURVE_TYPES.items()}

EC_PUBKEY = 0
EC_PRIVKEY = 1


def _canon(name: str) -> str:
    return name.replace("-", "_").replace("/", "_").upper()


def alg_byte(name: str) -> int:
    return ALG_TYPES[_canon(name)]


def hash_byte(name: str) -> int:
    return HASH_TYPES[_canon(name)]


def curve_byte(name: str) -> int:
    return CURVE_TYPES[_canon(name)]


# -- structured signatures ----------------------------------------------------

def structured_sig_export(sig: bytes, alg: str, hash_name: str,
                          curve: str) -> bytes:
    return bytes([alg_byte(alg), hash_byte(hash_name),
                  curve_byte(curve)]) + sig


def structured_sig_import(buf: bytes):
    """-> (raw_sig, alg_name, hash_name, curve_name)."""
    if len(buf) < 3:
        raise ValueError("structured signature too short")
    a, h, c = buf[0], buf[1], buf[2]
    if a not in ALG_NAMES or h not in HASH_NAMES or c not in CURVE_NAMES:
        raise ValueError("unknown metadata in structured signature")
    return buf[3:], ALG_NAMES[a], HASH_NAMES[h], CURVE_NAMES[c]


# -- structured keys ----------------------------------------------------------

def structured_key_export(raw: bytes, is_priv: bool, alg: str,
                          curve: str) -> bytes:
    return bytes([EC_PRIVKEY if is_priv else EC_PUBKEY, alg_byte(alg),
                  curve_byte(curve)]) + raw


def structured_key_import(buf: bytes, expect_priv: bool | None = None):
    """-> (raw_key, is_priv, alg_name, curve_name)."""
    if len(buf) < 3:
        raise ValueError("structured key too short")
    kt, a, c = buf[0], buf[1], buf[2]
    if kt not in (EC_PUBKEY, EC_PRIVKEY):
        raise ValueError("bad key-type byte")
    if a not in ALG_NAMES or c not in CURVE_NAMES:
        raise ValueError("unknown metadata in structured key")
    is_priv = kt == EC_PRIVKEY
    if expect_priv is not None and is_priv != expect_priv:
        raise ValueError("key type mismatch")
    return buf[3:], is_priv, ALG_NAMES[a], CURVE_NAMES[c]


# -- raw key codecs (match the reference's projective pubkey export) ----------

def export_pub_projective(curve, xs, ys) -> list[bytes]:
    """Affine ints -> reference raw pubkey bytes (X||Y||Z with Z=1)."""
    p_len = (curve.fp_ctx.bits + 7) // 8
    one = (1).to_bytes(p_len, "big")
    return [int(x).to_bytes(p_len, "big") + int(y).to_bytes(p_len, "big")
            + one for x, y in zip(xs, ys)]


def import_pub_projective(curve, buf: bytes):
    """Reference raw pubkey bytes -> affine (x, y) host ints."""
    p = curve.fp_ctx.p_int
    p_len = (curve.fp_ctx.bits + 7) // 8
    if len(buf) != 3 * p_len:
        raise ValueError("bad raw public key length")
    X = int.from_bytes(buf[:p_len], "big")
    Y = int.from_bytes(buf[p_len:2 * p_len], "big")
    Z = int.from_bytes(buf[2 * p_len:], "big")
    if Z == 0:
        raise ValueError("public key at infinity")
    zi = pow(Z, -1, p)
    return X * zi % p, Y * zi % p
