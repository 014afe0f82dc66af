"""Generate tests/vectors/wycheproof_subset.jsonl — the critical
Wycheproof attack classes re-entered as a concrete corpus with
valid / invalid / acceptable semantics.

The reference ships a Wycheproof harness (src/wycheproof_tests/
libecc_wycheproof.c:74-800, struct defs libecc_wycheproof.h:27-151) whose
vector blob is stripped from the source drop. This script re-creates the
critical test classes from PUBLIC primary sources, with a built-in
self-check so no mistyped constant can land in the corpus:

  * ECDSA  — RFC 6979 A.2.5/A.2.6 deterministic vectors (P-256/P-384,
    SHA-256): each VALID vector is re-derived by this framework's own
    RFC 6979 signer and generation FAILS if the bytes differ from the
    RFC constants inlined below. Invalid cases are systematic edge
    mutations: r/s in {0, 1, q-1, q, q+1}, r+q aliasing, swapped (r,s),
    truncated/extended encodings, bit flips (the classes of Wycheproof's
    ecdsa_*_sha256_p1363_test.json).
  * EdDSA  — RFC 8032 §7.1 Ed25519 vectors (valid), plus non-canonical
    encodings: S >= q (signature malleability), S += q aliasing,
    R/A y >= p non-canonical compression, sign-bit abuse
    (eddsa_test.json classes).
  * X25519 — RFC 7748 §5.2/§6.1 vectors (valid), plus ALL low-order
    points on curve25519 and its twist DERIVED algebraically here
    (order-{1,2,4,8} points, x25519_test.json "LowOrderPublic" class),
    non-canonical u >= p, and on-twist u (reference policy rejects:
    x25519_448.h:28-32).

Result semantics: "valid" must verify/derive OK; "invalid" must be
rejected; "acceptable" = behavior is implementation-defined by RFC but
pinned to the REFERENCE's policy here (flag says which way).

Usage: JAX_PLATFORMS=cpu python scripts/gen_wycheproof_subset.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Force the CPU backend BEFORE any jax import: a sitecustomize hook may
# set jax.config.jax_platforms = "axon,..." directly, which overrides
# the JAX_PLATFORMS env var and silently routes every compile through
# the remote TPU tunnel (tests/conftest.py does the same dance).
os.environ["JAX_PLATFORMS"] = "cpu"   # force: the shell exports axon
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors",
                   "wycheproof_subset.jsonl")

# ---------------------------------------------------------------------------
# RFC 6979 A.2.5 (P-256) / A.2.6 (P-384), SHA-256 — public constants
# ---------------------------------------------------------------------------

RFC6979_P256_KEY = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721
RFC6979_P256 = [
    # (msg, r, s) with SHA-256
    ("sample",
     0xEFD48B2AACB6A8FD1140DD9CD45E81D69D2C877B56AAF991C34D0EA84EAF3716,
     0xF7CB1C942D657C41D436C7A1B6E29F65F3E900DBB9AFF4064DC4AB2F843ACDA8),
    ("test",
     0xF1ABB023518351CD71D881567B1EA663ED3EFCF6C5132B354F28D3B0B7D38367,
     0x019F4113742A2B14BD25926B49C649155F267E60D3814B4C0CC84250E46F0083),
]
RFC6979_P384_KEY = 0x6B9D3DAD2E1B8C1C05B19875B6659F4DE23C3B667BF297BA9AA47740787137D896D5724E4C70A825F872C9EA60D2EDF5
RFC6979_P384 = [
    ("sample",
     0x21B13D1E013C7FA1392D03C5F99AF8B30C570C6F98D4EA8E354B63A21D3DAA33BDE1E888E63355D92FA2B3C36D8FB2CD,
     0xF3AA443FB107745BF4BD77CB3891674632068A10CA67E3D45DB2266FA7D1FEEBEFDC63ECCD1AC42EC0CB8668A4FA0AB0),
    ("test",
     0x6D6DEFAC9AB64DABAFE36C6BF510352A4CC27001263638E5B16D9BB51D451559F918EEDAF2293BE5B475CC8F0188636B,
     0x2D46F3BECBCC523D5F1A1256BF0C9B024D879BA9E838144C8BA6BAEB4B53B47D51AB373F9845C0514EEFB14024787265),
]


def ecdsa_vectors():
    from libecc_tpu.curves import params
    from libecc_tpu.sig import ecdsa, keys as K

    out = []
    tid = [0]

    def case(curve, hashn, pub_hex, msg, sig, result, flags, comment):
        tid[0] += 1
        out.append({
            "tcId": tid[0], "scheme": "ECDSA", "curve": curve,
            "hash": hashn, "pub": pub_hex, "msg": msg.hex(),
            "sig": sig.hex(), "result": result, "flags": flags,
            "comment": comment,
        })

    for curve_name, key, vecs in (
            ("SECP256R1", RFC6979_P256_KEY, RFC6979_P256),
            ("SECP384R1", RFC6979_P384_KEY, RFC6979_P384)):
        c = params.get_curve(curve_name)
        q = c.q
        nb = (q.bit_length() + 7) // 8
        kb = K.keygen(c, "ECDSA", 1, priv_ints=[key])
        pub = K.export_pub_raw(kb)[0].hex()
        for msg_s, r_ref, s_ref in vecs:
            msg = msg_s.encode()
            # self-check: our deterministic signer must reproduce the RFC
            sigs, ok = ecdsa.sign_batch(kb, [msg], "SHA256",
                                        deterministic=True)
            got_r = int.from_bytes(sigs[0][:nb], "big")
            got_s = int.from_bytes(sigs[0][nb:], "big")
            assert ok.all() and (got_r, got_s) == (r_ref, s_ref), (
                f"RFC 6979 self-check FAILED for {curve_name}/{msg_s}: "
                f"got ({got_r:#x},{got_s:#x})")
            sig = sigs[0]
            case(curve_name, "SHA256", pub, msg, sig, "valid",
                 ["Rfc6979"], f"RFC 6979 {curve_name} SHA-256 '{msg_s}'")
            r, s = r_ref, s_ref

            def enc(rv, sv):
                return rv.to_bytes(nb, "big") + sv.to_bytes(nb, "big")

            for rv, fl, cm in [
                    (0, "RangeCheck", "r = 0"),
                    (q, "RangeCheck", "r = q"),
                    (q + 1, "RangeCheck", "r = q + 1"),
                    (q - 1, "EdgeCase", "r = q - 1 (wrong)"),
                    (1, "EdgeCase", "r = 1 (wrong)")]:
                case(curve_name, "SHA256", pub, msg, enc(rv, s),
                     "invalid", [fl], cm)
            for sv, fl, cm in [
                    (0, "RangeCheck", "s = 0"),
                    (q, "RangeCheck", "s = q"),
                    (q + 1, "RangeCheck", "s = q + 1"),
                    (q - 1, "EdgeCase", "s = q - 1 (wrong)"),
                    (1, "EdgeCase", "s = 1 (wrong)")]:
                case(curve_name, "SHA256", pub, msg, enc(r, sv),
                     "invalid", [fl], cm)
            # negated s: (r, q - s) verifies a NEGATED message point —
            # for plain ECDSA (r, -s) is the OTHER valid signature of the
            # same message (signature malleability — Wycheproof marks
            # P1363 (r, q-s) as valid since ECDSA does not forbid it)
            case(curve_name, "SHA256", pub, msg, enc(r, (q - s) % q),
                 "valid", ["SignatureMalleability"], "s -> q - s")
            case(curve_name, "SHA256", pub, msg, enc(s, r),
                 "invalid", ["EdgeCase"], "swapped r and s")
            case(curve_name, "SHA256", pub, msg, sig[:-1],
                 "invalid", ["Encoding"], "truncated signature")
            case(curve_name, "SHA256", pub, msg, sig + b"\x00",
                 "invalid", ["Encoding"], "extended signature")
            flip = bytearray(sig)
            flip[0] ^= 0x80
            case(curve_name, "SHA256", pub, msg, bytes(flip),
                 "invalid", ["BitFlip"], "MSB of r flipped")
            flip = bytearray(sig)
            flip[-1] ^= 0x01
            case(curve_name, "SHA256", pub, msg, bytes(flip),
                 "invalid", ["BitFlip"], "LSB of s flipped")
            case(curve_name, "SHA256", pub, msg + b"x", sig,
                 "invalid", ["EdgeCase"], "signature of different message")
            # r aliasing: x(W) = r + q < p would also accept candidate
            # r' = r; check r' = r + q is NOT accepted as a distinct sig
            if r + q < c.fp_ctx.p_int:
                case(curve_name, "SHA256", pub, msg, enc(r + q, s),
                     "invalid", ["RangeCheck"], "r' = r + q (aliasing)")
    return out


# ---------------------------------------------------------------------------
# Ed25519: RFC 8032 §7.1 + non-canonical encodings
# ---------------------------------------------------------------------------

RFC8032_ED25519 = [
    # (seed_hex, pub_hex, msg_hex, sig_hex) — TEST 1..3 of §7.1
    ("9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60",
     "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a",
     "",
     "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e06522490155"
     "5fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b"),
    ("4ccd089b28ff96da9db6c346ec114e0f5b8a319f35aba624da8cf6ed4fb8a6fb",
     "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c",
     "72",
     "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da"
     "085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00"),
    ("c5aa8df43f9f837bedb7442f31dcb7b166d38535076f094b85ce3a2e0b4458f7",
     "fc51cd8e6218a1a38da47ed00230f0580816ed13ba3303ac5deb911548908025",
     "af82",
     "6291d657deec24024827e69c3abe01a30ce548a284743a445e3680d7db5ac3ac"
     "18ff9b538d16f290ae67f760984dc6594a7c15e9716ed28dc027beceea1ec40a"),
]


def eddsa_vectors():
    from libecc_tpu.sig import eddsa

    out = []
    tid = [10000]

    def case(pub, msg, sig, result, flags, comment):
        tid[0] += 1
        out.append({
            "tcId": tid[0], "scheme": "EDDSA", "curve": "ED25519",
            "hash": "SHA512", "pub": pub.hex(), "msg": msg.hex(),
            "sig": sig.hex(), "result": result, "flags": flags,
            "comment": comment,
        })

    p = 2 ** 255 - 19
    q = 2 ** 252 + 27742317777372353535851937790883648493
    for seed_h, pub_h, msg_h, sig_h in RFC8032_ED25519:
        seed = bytes.fromhex(seed_h)
        pub = bytes.fromhex(pub_h)
        msg = bytes.fromhex(msg_h)
        sig = bytes.fromhex(sig_h)
        # self-check: our signer reproduces the RFC bytes
        kb = eddsa.EdDSAKeyBatch("ed25519", [seed])
        assert kb.pub_bytes[0] == pub, "RFC 8032 pub self-check failed"
        got = eddsa.sign_batch(kb, [msg])[0]
        assert got == sig, "RFC 8032 sig self-check failed"
        case(pub, msg, sig, "valid", ["Rfc8032"], "RFC 8032 7.1 vector")
        S = int.from_bytes(sig[32:], "little")
        # S >= q (malleability): S + q still < 2^256 -> must reject
        s_alias = sig[:32] + ((S + q).to_bytes(32, "little"))
        case(pub, msg, s_alias, "invalid", ["SignatureMalleability"],
             "S' = S + q")
        # S = q exactly
        case(pub, msg, sig[:32] + q.to_bytes(32, "little"), "invalid",
             ["RangeCheck"], "S = q")
        # bit-flipped R
        flip = bytearray(sig)
        flip[0] ^= 1
        case(pub, msg, bytes(flip), "invalid", ["BitFlip"],
             "R bit flipped")
        # non-canonical R: y(R) >= p encoding (add p to the y value,
        # keeping the sign bit) — reference decodes strictly
        ry = int.from_bytes(sig[:32], "little")
        sign_bit = ry >> 255
        y_val = ry & ((1 << 255) - 1)
        if y_val + p < (1 << 255):
            ncr = ((y_val + p) | (sign_bit << 255)).to_bytes(32, "little")
            case(pub, msg, ncr + sig[32:], "invalid", ["NonCanonical"],
                 "R y-coordinate encoded as y + p")
        # non-canonical A
        ay = int.from_bytes(pub, "little")
        a_sign = ay >> 255
        a_val = ay & ((1 << 255) - 1)
        if a_val + p < (1 << 255):
            nca = ((a_val + p) | (a_sign << 255)).to_bytes(32, "little")
            case(nca, msg, sig, "invalid", ["NonCanonical"],
                 "A y-coordinate encoded as y + p")
        case(pub, msg + b"\x01", sig, "invalid", ["EdgeCase"],
             "different message")
    return out


# ---------------------------------------------------------------------------
# X25519: RFC 7748 + derived low-order/twist points
# ---------------------------------------------------------------------------

RFC7748_X25519 = [
    ("a546e36bf0527c9d3b16154b82465edd62144c0ac1fc5a18506a2244ba449ac4",
     "e6db6867583030db3594c1a424b15f7c726624ec26b3353b10a903a6d0ab1c4c",
     "c3da55379de9c6908e94ea4df28d084f32eccf03491c71f754b4075577a28552"),
    ("4b66e9d4d1b4673c5ad22691957d6af5c11b6421e0ea01d42ca4169e7918ba0d",
     "e5210f12786811d3f4b7959d0538ae2c31dbe7106fc03c3efc4cd549c715a493",
     "95cbde9476e8907d7aade45cb4b873f88b595a68799fa152e6f8f7647aac7957"),
]


def _mont_ladder_int(k, u, p, a24):
    """Plain-int Montgomery ladder (host oracle for derivations)."""
    x1, x2, z2, x3, z3 = u, 1, 0, u, 1
    swap = 0
    for t in range(254, -1, -1):
        kt = (k >> t) & 1
        swap ^= kt
        if swap:
            x2, x3 = x3, x2
            z2, z3 = z3, z2
        swap = kt
        A = (x2 + z2) % p
        AA = A * A % p
        B = (x2 - z2) % p
        BB = B * B % p
        E = (AA - BB) % p
        C = (x3 + z3) % p
        D = (x3 - z3) % p
        DA = D * A % p
        CB = C * B % p
        x3 = (DA + CB) % p
        x3 = x3 * x3 % p
        z3 = (DA - CB) % p
        z3 = x1 * z3 * z3 % p
        x2 = AA * BB % p
        z2 = E * (AA + a24 * E) % p
    if swap:
        x2, x3 = x3, x2
        z2, z3 = z3, z2
    return x2 * pow(z2, p - 2, p) % p if z2 else 0


def _low_order_points():
    """Derive every low-order u on curve25519 AND its twist, from first
    principles (no transcribed constants): points killed by multiplying
    by 8 on the curve (cofactor 8) / by 4 on the twist (cofactor 4).
    Uses the short-Weierstrass group law on the Montgomery curve
    v^2 = u^3 + A u^2 + u via affine chord-tangent over GF(p)."""
    p = 2 ** 255 - 19
    A = 486662

    def on_curve(u):
        rhs = (u * u * u + A * u * u + u) % p
        return pow(rhs, (p - 1) // 2, p) in (0, 1)

    def add(P, Q):
        """Affine Montgomery-curve add: B y^2 = x^3 + A x^2 + x, B=1."""
        if P is None:
            return Q
        if Q is None:
            return P
        (x1, y1), (x2, y2) = P, Q
        if x1 == x2 and (y1 + y2) % p == 0:
            return None
        if P == Q:
            if y1 == 0:
                return None
            lam = (3 * x1 * x1 + 2 * A * x1 + 1) * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - A - x1 - x2) % p
        return x3, (lam * (x1 - x3) - y1) % p

    def mul(k, P):
        R = None
        while k:
            if k & 1:
                R = add(R, P)
            P = add(P, P)
            k >>= 1
        return R

    def sqrt_p(n):
        # p % 8 == 5 -> Atkin
        n %= p
        if n == 0:
            return 0
        c = pow(2 * n, (p - 5) // 8, p)
        i = 2 * n * c * c % p
        r = n * c * (i - 1) % p
        return r if r * r % p == n % p else None

    q = 2 ** 252 + 27742317777372353535851937790883648493
    lows = set()
    # curve: cofactor 8. q * (random point) has order dividing 8.
    u = 2
    found_curve = 0
    while found_curve < 4:
        if on_curve(u):
            y = sqrt_p((u * u * u + A * u * u + u) % p)
            if y is not None:
                T = mul(q, (u, y))
                while T is not None:
                    lows.add(T[0])
                    T = mul(2, T)       # walk down the 2-Sylow
                found_curve += 1
        u += 1
    lows.add(0)                          # (0, 0): the order-2 point
    # twist: cofactor 4 (order 2*(p+1)/... ). twist points: rhs non-QR.
    # The twist group has order p + 1 - (p + 1 - 8q)/..; concretely
    # |twist| = 2*(p+1) - |curve| ... simpler: |curve| = 8q, |twist| =
    # 2p + 2 - 8q. Its odd part times a power of 2; kill the odd part.
    tw_order = 2 * p + 2 - 8 * q
    odd = tw_order
    while odd % 2 == 0:
        odd //= 2
    u = 2
    found_tw = 0
    while found_tw < 4:
        if not on_curve(u):
            # work on the twist via the isomorphic curve over GF(p):
            # scale: v^2 = u^3+Au^2+u with v in GF(p^2); x-only mult via
            # the ladder works for ANY u (it never uses y): use the
            # int ladder to kill the odd part
            x = u
            k = odd
            # x-only multiply by odd via ladder on u (works on twist)
            a24 = (A - 2) // 4
            x = _mont_ladder_int(k, u, p, a24)
            if x != 0:
                # x has order a power of 2 on the twist; walk down by
                # doubling (x-only doubling formula)
                while x != 0:
                    lows.add(x)
                    num = (x * x - 1) % p
                    x = num * num % p * pow(
                        (4 * x * ((x * x + A * x + 1) % p)) % p, -1, p) % p
                    # stop once we hit u=0 fixed point
                    if x == 0:
                        break
                found_tw += 1
        u += 1
    return sorted(lows)


def x25519_vectors():
    out = []
    tid = [20000]

    def case(k_hex, u_hex, result, flags, comment, expect=None):
        tid[0] += 1
        d = {"tcId": tid[0], "scheme": "X25519", "curve": "CURVE25519",
             "priv": k_hex, "u": u_hex, "result": result, "flags": flags,
             "comment": comment}
        if expect:
            d["shared"] = expect
        out.append(d)

    p = 2 ** 255 - 19
    A = 486662
    for k_h, u_h, o_h in RFC7748_X25519:
        # self-check the RFC vectors against the int ladder
        k = int.from_bytes(bytes.fromhex(k_h), "little")
        k = (k & ~(7 | (128 << 8 * 31))) | (64 << 8 * 31)
        u = int.from_bytes(bytes.fromhex(u_h), "little") & ((1 << 255) - 1)
        got = _mont_ladder_int(k, u % p, p, (486662 - 2) // 4)
        assert got.to_bytes(32, "little").hex() == o_h, \
            "RFC 7748 self-check failed"
        # RFC 7748's SECOND vector is deliberately an on-TWIST u: a
        # strictly-checking implementation (the reference's documented
        # policy) REJECTS it while plain RFC mode computes it
        rhs = (u * u * u + A * u * u + u) % p
        on_curve = pow(rhs, (p - 1) // 2, p) in (0, 1)
        if on_curve:
            case(k_h, u_h, "valid", ["Rfc7748"], "RFC 7748 5.2 vector",
                 o_h)
        else:
            case(k_h, u_h, "acceptable", ["Rfc7748", "TwistPublic"],
                 "RFC 7748 5.2 vector (on twist: reference rejects, "
                 "RFC computes)", o_h)
    k_h = bytes(range(32)).hex()
    for u in _low_order_points():
        case(k_h, u.to_bytes(32, "little").hex(), "acceptable",
             ["LowOrderPublic", "ZeroSharedSecret"],
             "low-order point (curve or twist): reference policy rejects")
    # non-canonical u >= p
    for u in (p, p + 1, (1 << 255) - 19, (1 << 255) - 1):
        case(k_h, u.to_bytes(32, "little").hex(), "acceptable",
             ["NonCanonicalPublic"],
             "u >= p: RFC reduces, reference policy rejects")
    # on-twist large-order u: reference policy rejects, RFC computes
    u = 2
    while pow((u ** 3 + 486662 * u * u + u) % p, (p - 1) // 2, p) == 1:
        u += 1
    case(k_h, u.to_bytes(32, "little").hex(), "acceptable",
         ["TwistPublic"], "large-order twist point: reference rejects")
    return out


# ---------------------------------------------------------------------------
# Round-5 breadth: secp256k1 ECDSA, BIP0340, SM2, X448, Ed448, ECDH-CDH,
# HMAC — the remaining runner classes of the reference's Wycheproof
# harness (libecc_wycheproof.c:74, :158, :278, :498, :542, :731, :800).
# Base "valid" vectors come from INDEPENDENT provenance wherever one
# exists locally:
#   * the reference C library's own KAT dump (tests/vectors/kats_full.jsonl,
#     regenerated by scripts/oracle/) for BIP0340 / SM2 / Ed448 / ECDH;
#   * hashlib (OpenSSL-backed) for HMAC;
#   * pure-int re-implementations in THIS file (hashlib + int math only —
#     no framework code) that must agree with the framework's output for
#     secp256k1 RFC 6979 signing and every oracle base case re-derivable
#     on host. Generation FAILS on any disagreement.
# Invalid/acceptable cases are systematic mutations of those bases.
# ---------------------------------------------------------------------------

KATS = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors",
                    "kats_full.jsonl")


def _kat_rows(alg):
    with open(KATS) as f:
        return [d for d in map(json.loads, f) if d.get("alg") == alg]


def _hmac_sha(hashname, key, msg):
    import hashlib
    import hmac as _hmac
    return _hmac.new(key, msg, getattr(hashlib, hashname)).digest()


def _rfc6979_k_int(x, h1, q, hashname="sha256"):
    """Independent RFC 6979 nonce derivation (hashlib-only)."""
    qlen = q.bit_length()
    rlen = (qlen + 7) // 8
    hlen = len(h1)

    def bits2int(b):
        v = int.from_bytes(b, "big")
        blen = 8 * len(b)
        return v >> (blen - qlen) if blen > qlen else v

    def int2octets(v):
        return v.to_bytes(rlen, "big")

    def bits2octets(b):
        return int2octets(bits2int(b) % q)

    V = b"\x01" * hlen
    K = b"\x00" * hlen
    K = _hmac_sha(hashname, K, V + b"\x00" + int2octets(x) + bits2octets(h1))
    V = _hmac_sha(hashname, K, V)
    K = _hmac_sha(hashname, K, V + b"\x01" + int2octets(x) + bits2octets(h1))
    V = _hmac_sha(hashname, K, V)
    while True:
        T = b""
        while len(T) < rlen:
            V = _hmac_sha(hashname, K, V)
            T += V
        k = bits2int(T[:rlen])
        if 0 < k < q:
            return k
        K = _hmac_sha(hashname, K, V + b"\x00")
        V = _hmac_sha(hashname, K, V)


def _wcurve(curve_name):
    from libecc_tpu.curves import params
    from libecc_tpu.ref import hostref as H
    c = params.get_curve(curve_name)
    p = c.fp_ctx.p_int
    return c, H.WCurve(p=p, a=c.a % p, b=c.b % p, gx=c.gx, gy=c.gy,
                       q=c.q, h=c.h)


def ecdsa_k1_vectors():
    """secp256k1 ECDSA: deterministic (RFC 6979) base signatures derived
    TWICE — by the framework's signer and by the pure-int+hashlib
    implementation above — plus the standard mutation battery."""
    import hashlib
    from libecc_tpu.ref import hostref as H
    from libecc_tpu.sig import ecdsa, keys as K

    c, wc = _wcurve("SECP256K1")
    q = c.q
    nb = 32
    key = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721 % q
    kb = K.keygen(c, "ECDSA", 1, priv_ints=[key])
    pub = K.export_pub_raw(kb)[0].hex()
    out = []
    tid = [30000]

    def case(msg, sig, result, flags, comment):
        tid[0] += 1
        out.append({"tcId": tid[0], "scheme": "ECDSA",
                    "curve": "SECP256K1", "hash": "SHA256", "pub": pub,
                    "msg": msg.hex(), "sig": sig.hex(), "result": result,
                    "flags": flags, "comment": comment})

    for msg_s in ("sample", "test"):
        msg = msg_s.encode()
        h1 = hashlib.sha256(msg).digest()
        e = int.from_bytes(h1, "big") % q        # qlen == 256
        k = _rfc6979_k_int(key, h1, q)
        r_i, s_i = H.ecdsa_sign_ref(wc, key, e, k)
        sigs, ok = ecdsa.sign_batch(kb, [msg], "SHA256",
                                    deterministic=True)
        got = (int.from_bytes(sigs[0][:nb], "big"),
               int.from_bytes(sigs[0][nb:], "big"))
        assert ok.all() and got == (r_i, s_i), (
            f"secp256k1 RFC6979 dual-derivation mismatch: "
            f"framework {got} vs host {(r_i, s_i)}")
        sig = sigs[0]
        case(msg, sig, "valid", ["SelfDerivedDual", "Rfc6979Nonce"],
             f"deterministic secp256k1 '{msg_s}' (dual-derived)")

        def enc(rv, sv):
            return rv.to_bytes(nb, "big") + sv.to_bytes(nb, "big")

        for rv in (0, q, q + 1, 1):
            case(msg, enc(rv, s_i), "invalid", ["RangeCheck"],
                 f"r = {rv if rv < 16 else 'q-ish'}")
        for sv in (0, q, q + 1, q - 1):
            case(msg, enc(r_i, sv), "invalid", ["RangeCheck"
                 if sv in (0, q, q + 1) else "EdgeCase"], "s mutated")
        case(msg, enc(r_i, (q - s_i) % q), "valid",
             ["SignatureMalleability"], "s -> q - s")
        case(msg, enc(s_i, r_i), "invalid", ["EdgeCase"], "swapped r,s")
        case(msg, sig[:-1], "invalid", ["Encoding"], "truncated")
        flip = bytearray(sig)
        flip[0] ^= 0x80
        case(msg, bytes(flip), "invalid", ["BitFlip"], "r MSB flipped")
        case(msg + b"x", sig, "invalid", ["EdgeCase"], "other message")
        # secp256k1: p - q < 2^129, so r + q < p is possible only for
        # tiny r — the aliasing case can't be built from a random r;
        # record the range check at the boundary instead
        case(msg, enc(q - 1, s_i), "invalid", ["EdgeCase"], "r = q - 1")
    return out


def _bip340_tagged(tag, *chunks):
    import hashlib
    th = hashlib.sha256(tag.encode()).digest()
    return hashlib.sha256(th + th + b"".join(chunks)).digest()


def _bip340_verify_int(wc, px, msg, sig):
    """Independent BIP-340 verifier (int math + hashlib)."""
    from libecc_tpu.ref import hostref as H
    p, q = wc.p, wc.q
    if len(sig) != 64 or px >= p:
        return False
    r = int.from_bytes(sig[:32], "big")
    s = int.from_bytes(sig[32:], "big")
    if r >= p or s >= q:
        return False
    rhs = (px * px * px + 7) % p
    y = pow(rhs, (p + 1) // 4, p)
    if y * y % p != rhs:
        return False                     # x not on curve
    if y & 1:
        y = p - y                        # even-y lift
    e = int.from_bytes(_bip340_tagged(
        "BIP0340/challenge", sig[:32], px.to_bytes(32, "big"), msg),
        "big") % q
    # R = s*G - e*P
    sG = H.ec_mul(wc, s, (wc.gx, wc.gy))
    eP = H.ec_mul(wc, e, (px, y))
    R = H.ec_add(wc, sG, H.ec_neg(wc, eP))
    return (R is not None) and (R[1] % 2 == 0) and (R[0] == r)


def bip0340_vectors():
    """BIP0340 Schnorr: oracle base cases (the official BIP-340 vectors
    routed through the reference C library) + x-only/range mutations."""
    c, wc = _wcurve("SECP256K1")
    p, q = wc.p, wc.q
    out = []
    tid = [40000]

    def case(pub_x, msg, sig, result, flags, comment):
        tid[0] += 1
        out.append({"tcId": tid[0], "scheme": "BIP0340",
                    "curve": "SECP256K1", "hash": "SHA256",
                    "pub": pub_x.hex(), "msg": msg.hex(),
                    "sig": sig.hex(), "result": result, "flags": flags,
                    "comment": comment})

    rows = _kat_rows("BIP0340")
    assert rows, "no BIP0340 oracle rows in kats_full.jsonl"
    from libecc_tpu.ref import hostref as H
    base = None
    for d in rows:
        priv = int(d["priv"], 16)
        msg = bytes.fromhex(d["msg_hex"])
        sig = bytes.fromhex(d["sig"])
        P = H.ec_mul(wc, priv, (wc.gx, wc.gy))
        px = P[0]
        pub_x = px.to_bytes(32, "big")
        assert _bip340_verify_int(wc, px, msg, sig), (
            f"oracle BIP0340 row {d['name']} fails the independent "
            "pure-int verifier")
        case(pub_x, msg, sig, "valid", ["Oracle", "Bip340Official"],
             f"oracle row {d['name']}")
        if base is None and len(sig) == 64:
            base = (px, pub_x, msg, sig)
    px, pub_x, msg, sig = base
    r = int.from_bytes(sig[:32], "big")
    s = int.from_bytes(sig[32:], "big")
    if r + p < (1 << 256):
        case(pub_x, msg, (r + p).to_bytes(32, "big") + sig[32:],
             "invalid", ["RangeCheck"],
             "r' = r + p (non-canonical field encoding)")
    # (s' = s + q never fits 32 bytes on secp256k1: q ~ 2^256 - 2^129,
    # so the aliased encoding overflows — the boundary checks below
    # cover the s-range class instead)
    case(pub_x, msg, sig[:32] + q.to_bytes(32, "big"), "invalid",
         ["RangeCheck"], "s = q")
    case(pub_x, msg, sig[:32] + (q + 1).to_bytes(32, "big"), "invalid",
         ["RangeCheck"], "s = q + 1")
    case(pub_x, msg, sig[:32] + (q - s).to_bytes(32, "big"), "invalid",
         ["EdgeCase"], "s -> q - s (NOT valid for Schnorr, unlike ECDSA)")
    flip = bytearray(sig)
    flip[0] ^= 1
    case(pub_x, msg, bytes(flip), "invalid", ["BitFlip"], "r bit flip")
    case(pub_x, msg, sig[:-1], "invalid", ["Encoding"], "truncated")
    case(pub_x, msg, sig + b"\x00", "invalid", ["Encoding"], "extended")
    case(pub_x, msg[:-1] + bytes([msg[-1] ^ 1]), sig, "invalid",
         ["EdgeCase"], "different message")
    # pubkey x with no curve point: find x where x^3+7 is a non-residue
    x_bad = 5
    while pow((x_bad ** 3 + 7) % p, (p - 1) // 2, p) == 1:
        x_bad += 1
    case(x_bad.to_bytes(32, "big"), msg, sig, "invalid",
         ["PublicKeyNotOnCurve"], "pub x lifts to no curve point")
    case(p.to_bytes(32, "big"), msg, sig, "invalid", ["RangeCheck"],
         "pub x = p (non-canonical)")
    return [v for v in out if v is not None]


def _sm3_int(msg: bytes) -> bytes:
    from libecc_tpu.hash.registry import get_hash
    return get_hash("SM3").hash(msg)


def _sm2_za(wc, ident: bytes, px: int, py: int) -> bytes:
    fe = lambda v: v.to_bytes(32, "big")
    entl = (len(ident) * 8).to_bytes(2, "big")
    return _sm3_int(entl + ident + fe(wc.a if wc.a >= 0 else wc.a % wc.p)
                    + fe(wc.b) + fe(wc.gx) + fe(wc.gy) + fe(px) + fe(py))


def _sm2_verify_int(wc, pub, ident, msg, sig):
    """Independent SM2 verifier (int math; SM3 via the framework's hash,
    itself pinned by oracle hash KATs)."""
    from libecc_tpu.ref import hostref as H
    q = wc.q
    if len(sig) != 64:
        return False
    r = int.from_bytes(sig[:32], "big")
    s = int.from_bytes(sig[32:], "big")
    if not (0 < r < q and 0 < s < q):
        return False
    t = (r + s) % q
    if t == 0:
        return False
    za = _sm2_za(wc, ident, pub[0], pub[1])
    e = int.from_bytes(_sm3_int(za + msg), "big")
    W = H.ec_add(wc, H.ec_mul(wc, s, (wc.gx, wc.gy)),
                 H.ec_mul(wc, t, pub))
    if W is None:
        return False
    return (e + W[0]) % q == r


def sm2_vectors():
    """SM2: oracle base cases + range/identity mutations (the reference
    wycheproof harness has no SM2 runner; Wycheproof upstream does —
    these are its attack classes applied to the oracle bases)."""
    out = []
    tid = [50000]

    def case(curve, pub, ident, msg, sig, result, flags, comment):
        tid[0] += 1
        out.append({"tcId": tid[0], "scheme": "SM2", "curve": curve,
                    "hash": "SM3", "pub": pub.hex(),
                    "adata": ident.hex(), "msg": msg.hex(),
                    "sig": sig.hex(), "result": result, "flags": flags,
                    "comment": comment})

    rows = _kat_rows("SM2")
    assert rows, "no SM2 oracle rows"
    for d in rows:
        curve = d["curve"]
        c, wc = _wcurve(curve)
        q = wc.q
        priv = int(d["priv"], 16)
        from libecc_tpu.ref import hostref as H
        P = H.ec_mul(wc, priv, (wc.gx, wc.gy))
        pub = P[0].to_bytes(32, "big") + P[1].to_bytes(32, "big")
        ident = bytes.fromhex(d["adata_hex"])
        msg = bytes.fromhex(d["msg_hex"])
        sig = bytes.fromhex(d["sig"])[:64]
        assert _sm2_verify_int(wc, P, ident, msg, sig), (
            f"oracle SM2 row {d['name']} fails independent verifier")
        case(curve, pub, ident, msg, sig, "valid", ["Oracle"],
             f"oracle row {d['name']}")
        r = int.from_bytes(sig[:32], "big")
        s = int.from_bytes(sig[32:], "big")
        enc = lambda rv, sv: rv.to_bytes(32, "big") + sv.to_bytes(32, "big")
        for rv in (0, q, q + 1):
            case(curve, pub, ident, msg, enc(rv, s), "invalid",
                 ["RangeCheck"], "r out of range")
        for sv in (0, q):
            case(curve, pub, ident, msg, enc(r, sv), "invalid",
                 ["RangeCheck"], "s out of range")
        # t = (r + s) mod q == 0 — the SM2-specific rejection class
        case(curve, pub, ident, msg, enc(r, (q - r) % q), "invalid",
             ["EdgeCase"], "r + s = 0 mod q (t = 0)")
        case(curve, pub, ident, msg, enc(s, r), "invalid", ["EdgeCase"],
             "swapped r,s")
        flip = bytearray(sig)
        flip[-1] ^= 1
        case(curve, pub, ident, msg, bytes(flip), "invalid", ["BitFlip"],
             "s bit flip")
        case(curve, pub, b"WRONG-ID@example.com", msg, sig, "invalid",
             ["DistinguishedId"], "wrong SM2 user identity (ZA changes)")
        case(curve, pub, ident, msg + b"\x00", sig, "invalid",
             ["EdgeCase"], "different message")
    return out


# -- X448 --------------------------------------------------------------------

P448 = 2 ** 448 - 2 ** 224 - 1
A448 = 156326
Q448 = 2 ** 446 - 0x8335dc163bb124b65129c96fde933d8d723a70aadc873d6d54a7bb0d
_X448_HDR = "/root/reference/src/tests/x448_test_vectors.h"


def _x448_dh_from_reference():
    """RFC 7748 6.2 X448 DH vectors, extracted from the reference's test
    header (public test data; hand-transcription is typo-prone). Returns
    [(priv_hex, peer_pub_hex, shared_hex)] and is cross-checked against
    the pure-int ladder below before any vector is emitted."""
    import re
    src = open(_X448_HDR).read()
    def arr(name):
        m = re.search(
            r"u8 %s\[\] = \{([^}]*)\}" % re.escape(name), src)
        return bytes(int(b, 16) for b in
                     re.findall(r"0x([0-9a-fA-F]{2})", m.group(1))).hex()
    out = []
    for i in (0, 1):
        out.append((arr(f"x448_WEI448_{i}_our_priv_key"),
                    arr(f"x448_WEI448_{i}_peer_pub_key"),
                    arr(f"x448_WEI448_{i}_shared_secret")))
    return out


def _x448_ladder_int(k: int, u: int) -> int:
    """Independent X448 (pure-int RFC 7748 ladder)."""
    p, a24 = P448, (A448 - 2) // 4
    x1, x2, z2, x3, z3 = u, 1, 0, u, 1
    swap = 0
    for t in range(447, -1, -1):
        kt = (k >> t) & 1
        swap ^= kt
        if swap:
            x2, x3, z2, z3 = x3, x2, z3, z2
        swap = kt
        A_ = (x2 + z2) % p
        AA = A_ * A_ % p
        B = (x2 - z2) % p
        BB = B * B % p
        E = (AA - BB) % p
        C = (x3 + z3) % p
        D = (x3 - z3) % p
        DA = D * A_ % p
        CB = C * B % p
        x3 = (DA + CB) % p
        x3 = x3 * x3 % p
        z3 = (DA - CB) % p
        z3 = x1 * z3 * z3 % p
        x2 = AA * BB % p
        z2 = E * (AA + a24 * E) % p
    if swap:
        x2, z2 = x3, z3
    return x2 * pow(z2, p - 2, p) % p if z2 else 0


def _clamp448(kb: bytes) -> int:
    k = int.from_bytes(kb, "little")
    k &= ~3
    k |= 1 << 447
    return k & ((1 << 448) - 1)


def x448_vectors():
    out = []
    tid = [60000]

    def case(k_hex, u_hex, result, flags, comment, expect=None):
        tid[0] += 1
        d = {"tcId": tid[0], "scheme": "X448", "curve": "CURVE448",
             "priv": k_hex, "u": u_hex, "result": result, "flags": flags,
             "comment": comment}
        if expect:
            d["shared"] = expect
        out.append(d)

    p = P448
    for k_h, u_h, o_h in _x448_dh_from_reference():
        k = _clamp448(bytes.fromhex(k_h))
        u = int.from_bytes(bytes.fromhex(u_h), "little") % p
        got = _x448_ladder_int(k, u)
        assert got.to_bytes(56, "little").hex() == o_h, \
            "RFC 7748 X448 self-check failed"
        case(k_h, u_h, "valid", ["Rfc7748"],
             "RFC 7748 6.2 DH vector", o_h)
    k_h = bytes(range(56)).hex()
    # low-order points on curve448 (order 4q) and its twist (order
    # 2p + 2 - 4q), derived: kill the odd part of the group order by
    # laddering (a plain, non-clamped x-only multiply), then walk the
    # surviving 2-Sylow element down with the x-only doubling formula.
    # NOTE the ladder returns 0 both for infinity and for (0,0), so a
    # walk that starts at 0 found an odd-order point — retry with
    # another u until a NONTRIVIAL 2-power point appears (or the group
    # provably has none: 2-part == 2 means (0,0) is the only one).
    lows = {0}             # (0,0): the order-2 point, shared notation
    tw_order = 2 * p + 2 - 4 * Q448

    def on_curve(u):
        rhs = (u * u * u + A448 * u * u + u) % p
        return rhs == 0 or pow(rhs, (p - 1) // 2, p) == 1

    def walk_2sylow(group_order, want_twist):
        two_part = group_order
        odd = group_order
        while odd % 2 == 0:
            odd //= 2
        two_part //= odd
        if two_part <= 2:
            return          # only (0,0), already recorded
        u0, tries = 2, 0
        while tries < 64:
            if on_curve(u0) != want_twist:
                x = _x448_ladder_int(odd, u0)
                added = False
                while x != 0:
                    lows.add(x)
                    added = True
                    den = (4 * x * ((x * x + A448 * x + 1) % p)) % p
                    if den == 0:
                        break
                    num = (x * x - 1) % p
                    x = num * num % p * pow(den, -1, p) % p
                if added:
                    return
                tries += 1
            u0 += 1
        raise AssertionError("no nontrivial 2-power point found")

    walk_2sylow(4 * Q448, want_twist=False)      # curve448 side
    walk_2sylow(tw_order, want_twist=True)       # twist side
    for u in sorted(lows):
        # algebraic check: a low-order u must be killed by a small power
        # of two — the x-only ladder returns 0 (infinity) for 16*P
        assert _x448_ladder_int(16, u) == 0, f"u={u} is not low-order"
        case(k_h, u.to_bytes(56, "little").hex(), "acceptable",
             ["LowOrderPublic", "ZeroSharedSecret"],
             "low-order u (curve or twist): reference policy rejects")
    for u in (p, p + 1, (1 << 448) - 1):
        case(k_h, u.to_bytes(56, "little").hex(), "acceptable",
             ["NonCanonicalPublic"],
             "u >= p: RFC reduces, reference policy rejects")
    u0 = 2
    while not on_curve(u0):
        u0 += 1
    case(k_h, u0.to_bytes(56, "little").hex(), "valid", ["OnCurve"],
         "small on-curve u, large order",
         _x448_ladder_int(_clamp448(bytes.fromhex(k_h)),
                          u0).to_bytes(56, "little").hex())
    return out


# -- Ed448 -------------------------------------------------------------------

ED448_D = -39081
ED448_Q = Q448
ED448_GX = 0x4f1970c66bed0ded221d15a622bf36da9e146570470f1767ea6de324a3d3a46412ae1af72ab66511433b80e18b00938e2626a82bc70cc05e
ED448_GY = 0x693f46716eb6bc248876203756c9c7624bea73736ca3984087789c1e05a0c2d73ad3ff1ce67c39c4fdbd132c4ed7c8ad9808795bf230fa14


def _shake256(data: bytes, n: int) -> bytes:
    import hashlib
    return hashlib.shake_256(data).digest(n)


def _ed448_sqrt(n):
    p = P448                      # p % 4 == 3
    r = pow(n % p, (p + 1) // 4, p)
    return r if r * r % p == n % p else None


def _ed448_decode(b: bytes):
    """57-byte point decode -> (x, y) or None."""
    p = P448
    if len(b) != 57:
        return None
    y = int.from_bytes(b, "little")
    xsign = (y >> 455) & 1
    y &= (1 << 455) - 1
    if b[56] & 0x7f:
        return None                     # bits 448..454 must be zero
    if y >= p:
        return None
    # x^2 = (y^2 - 1) / (d y^2 - 1)
    num = (y * y - 1) % p
    den = (ED448_D * y * y - 1) % p
    x2 = num * pow(den, -1, p) % p
    x = _ed448_sqrt(x2)
    if x is None:
        return None
    if x == 0 and xsign:
        return None
    if x & 1 != xsign:
        x = p - x
    return (x, y)


def _ed448_verify_int(pub_b: bytes, msg: bytes, sig: bytes,
                      context: bytes = b"") -> bool:
    """Independent Ed448 verifier (int math + hashlib SHAKE256),
    cofactorless equation S*B == R + k*A (the reference checks the same
    strong equation for single verification)."""
    from libecc_tpu.ref import hostref as H
    if len(sig) != 114:
        return False
    A_pt = _ed448_decode(pub_b)
    R_pt = _ed448_decode(sig[:57])
    if A_pt is None or R_pt is None:
        return False
    S = int.from_bytes(sig[57:], "little")
    if S >= ED448_Q:
        return False
    dom = b"SigEd448" + bytes([0, len(context)]) + context
    k = int.from_bytes(_shake256(dom + sig[:57] + pub_b + msg, 114),
                       "little") % ED448_Q
    ec = H.EdCurve(p=P448, a=1, d=ED448_D % P448, gx=ED448_GX,
                   gy=ED448_GY, q=ED448_Q, h=4)
    SB = H.ed_mul(ec, S, (ED448_GX, ED448_GY))
    kA = H.ed_mul(ec, k, A_pt)
    rhs = H.ed_add(ec, R_pt, kA)
    return SB == rhs


def ed448_vectors():
    """Ed448: oracle base rows (RFC 8032 7.4 vectors through the
    reference C library) + non-canonical encodings. Each base row is
    re-verified by the independent pure-int verifier above."""
    out = []
    tid = [70000]

    def case(pub, msg, sig, result, flags, comment, context=b""):
        tid[0] += 1
        d = {"tcId": tid[0], "scheme": "EDDSA", "curve": "ED448",
             "hash": "SHAKE256", "pub": pub.hex(), "msg": msg.hex(),
             "sig": sig.hex(), "result": result, "flags": flags,
             "comment": comment}
        if context:
            d["context"] = context.hex()
        out.append(d)

    rows = _kat_rows("EDDSA448")
    assert rows, "no EDDSA448 oracle rows"
    from libecc_tpu.ref import hostref as H
    ec = H.EdCurve(p=P448, a=1, d=ED448_D % P448, gx=ED448_GX,
                   gy=ED448_GY, q=ED448_Q, h=4)
    base = None
    for d in rows:
        seed = bytes.fromhex(d["priv"])
        msg = bytes.fromhex(d["msg_hex"])
        sig = bytes.fromhex(d["sig"])
        ctx = bytes.fromhex(d["adata_hex"]) if d.get("adata_hex") else b""
        if len(seed) != 57 or len(sig) != 114:
            continue
        # derive A from the seed exactly as RFC 8032 5.2.5 does
        h = _shake256(seed, 114)
        s_int = int.from_bytes(h[:57], "little")
        s_int &= ~3
        s_int &= (1 << 448) - 1
        s_int |= 1 << 447
        Ax, Ay = H.ed_mul(ec, s_int, (ED448_GX, ED448_GY))
        pub = (Ay | ((Ax & 1) << 455)).to_bytes(57, "little")
        ok = _ed448_verify_int(pub, msg, sig, ctx)
        assert ok, f"oracle Ed448 row {d['name']} fails independent verify"
        case(pub, msg, sig, "valid", ["Oracle", "Rfc8032"],
             f"oracle row {d['name']}", context=ctx)
        if base is None and not ctx:
            base = (pub, msg, sig)
    assert base is not None, "no context-free Ed448 base row"
    pub, msg, sig = base
    q = ED448_Q
    S = int.from_bytes(sig[57:], "little")
    # S >= q: q ~ 2^446 so S + q fits 57 bytes -> real malleability probe
    case(pub, msg, sig[:57] + (S + q).to_bytes(57, "little"), "invalid",
         ["SignatureMalleability"], "S' = S + q")
    case(pub, msg, sig[:57] + q.to_bytes(57, "little"), "invalid",
         ["RangeCheck"], "S = q")
    ry = int.from_bytes(sig[:57], "little")
    sbit = (ry >> 455) & 1
    yv = ry & ((1 << 455) - 1)
    if yv + P448 < (1 << 455):
        ncr = ((yv + P448) | (sbit << 455)).to_bytes(57, "little")
        case(pub, msg, ncr + sig[57:], "invalid", ["NonCanonical"],
             "R y encoded as y + p")
    ay = int.from_bytes(pub, "little")
    asb = (ay >> 455) & 1
    ayv = ay & ((1 << 455) - 1)
    if ayv + P448 < (1 << 455):
        nca = ((ayv + P448) | (asb << 455)).to_bytes(57, "little")
        case(nca, msg, sig, "invalid", ["NonCanonical"],
             "A y encoded as y + p")
    flip = bytearray(sig)
    flip[0] ^= 1
    case(pub, msg, bytes(flip), "invalid", ["BitFlip"], "R bit flip")
    case(pub, msg, sig[:-1], "invalid", ["Encoding"], "truncated")
    case(pub, msg + b"\x01", sig, "invalid", ["EdgeCase"],
         "different message")
    # context binding: same bytes under a different dom4 context
    case(pub, msg, sig, "invalid", ["ContextBinding"],
         "valid sig verified under wrong context", context=b"x")
    # reserved-bits abuse in R encoding (bits 448..454 must be zero)
    bad = bytearray(sig)
    bad[56] |= 0x40
    case(pub, msg, bytes(bad), "invalid", ["NonCanonical"],
         "reserved bits set in R encoding")
    return out


# -- ECDH-CDH (SP 800-56A cofactor DH over P-256) ----------------------------

def ecccdh_vectors():
    """ECC-CDH: oracle base rows + peer-point mutations (compressed
    accept, off-curve/out-of-range/invalid reject — the classes of the
    reference's Wycheproof ecdh runner incl. its point decompression,
    libecc_wycheproof.c:498)."""
    from libecc_tpu.ref import hostref as H

    out = []
    tid = [80000]

    def case(curve, priv, peer, result, flags, comment, shared=None):
        tid[0] += 1
        d = {"tcId": tid[0], "scheme": "ECCCDH", "curve": curve,
             "priv": priv, "peer": peer.hex(), "result": result,
             "flags": flags, "comment": comment}
        if shared:
            d["shared"] = shared
        out.append(d)

    with open(KATS) as f:
        rows = [d for d in map(json.loads, f)
                if d.get("ecdh") == "ECCCDH" and d["curve"] == "SECP256R1"]
    assert rows, "no ECCCDH SECP256R1 oracle rows"
    c, wc = _wcurve("SECP256R1")
    p = wc.p
    nb = 32
    for d in rows[:3]:
        priv = int(d["priv"], 16)
        peer = bytes.fromhex(d["peer_pub"])
        px = int.from_bytes(peer[:nb], "big")
        py = int.from_bytes(peer[nb:], "big")
        # independent re-derivation; normalize shared to p-width hex
        S_pt = H.ec_mul(wc, priv * wc.h, (px, py))
        assert S_pt is not None and S_pt[0] == int(d["shared"], 16), (
            f"ECCCDH oracle row {d['name']} host re-derivation mismatch")
        shared = S_pt[0].to_bytes(nb, "big").hex()
        case("SECP256R1", d["priv"], peer, "valid", ["Oracle", "Cavp"],
             f"oracle row {d['name']}", shared)
    d0 = rows[0]
    priv = d0["priv"]
    peer = bytes.fromhex(d0["peer_pub"])
    px = int.from_bytes(peer[:nb], "big")
    py = int.from_bytes(peer[nb:], "big")
    shared = int(d0["shared"], 16).to_bytes(nb, "big").hex()
    # compressed SEC1 encodings of the same peer: must derive the SAME
    # secret (the reference decompresses, libecc_wycheproof.c:498)
    sec1_c = bytes([0x02 | (py & 1)]) + px.to_bytes(nb, "big")
    case("SECP256R1", priv, sec1_c, "valid", ["CompressedPoint"],
         "SEC1 compressed peer (y parity bit)", shared)
    sec1_u = b"\x04" + peer
    case("SECP256R1", priv, sec1_u, "valid", ["Sec1Uncompressed"],
         "SEC1 0x04 uncompressed peer", shared)
    # negated peer: -P has the same x, so x(d*(-P)) = x(d*P) -> same
    # shared secret (a classic "benign malleability" case)
    neg = px.to_bytes(nb, "big") + ((p - py) % p).to_bytes(nb, "big")
    case("SECP256R1", priv, neg, "valid", ["NegatedPoint"],
         "negated peer point (same x of shared point)", shared)
    # invalid peers
    off = px.to_bytes(nb, "big") + ((py + 1) % p).to_bytes(nb, "big")
    case("SECP256R1", priv, off, "invalid", ["PointNotOnCurve"],
         "peer y+1: not on curve (invalid-curve attack probe)")
    case("SECP256R1", priv, p.to_bytes(nb, "big") + py.to_bytes(nb, "big"),
         "invalid", ["RangeCheck"], "peer x = p")
    case("SECP256R1", priv, b"\x00" * 64, "invalid", ["PointAtInfinity"],
         "peer (0,0) not on curve")
    case("SECP256R1", priv, peer[:-1], "invalid", ["Encoding"],
         "truncated peer")
    xb = 5
    while pow((xb ** 3 - 3 * xb + wc.b) % p, (p - 1) // 2, p) == 1:
        xb += 1
    case("SECP256R1", priv, bytes([0x02]) + xb.to_bytes(nb, "big"),
         "invalid", ["CompressedNotOnCurve"],
         "compressed x with no curve point")
    return out


# -- HMAC --------------------------------------------------------------------

def hmac_vectors():
    """HMAC over the SHA-2/SHA-3 family: tags derived from hashlib
    (OpenSSL-backed — independent of this framework), incl. the
    key-length and truncation classes of Wycheproof's hmac_test.json /
    RFC 4231."""
    import hashlib
    import hmac as hm

    out = []
    tid = [90000]

    def case(hashn, key, msg, tag, result, flags, comment):
        tid[0] += 1
        out.append({"tcId": tid[0], "scheme": "HMAC", "hash": hashn,
                    "key": key.hex(), "msg": msg.hex(), "tag": tag.hex(),
                    "result": result, "flags": flags, "comment": comment})

    algs = [("SHA256", hashlib.sha256, 64), ("SHA384", hashlib.sha384, 128),
            ("SHA512", hashlib.sha512, 128), ("SHA3_256", hashlib.sha3_256,
                                              136)]
    for hashn, fn, bs in algs:
        for key, msg, fl in [
                (b"\x0b" * 20, b"Hi There", "Rfc4231Class"),
                (b"Jefe", b"what do ya want for nothing?", "Rfc4231Class"),
                (b"\xaa" * bs, b"Test Using Larger Than Block-Size Key",
                 "BlockSizeKey"),
                (b"\xaa" * (bs + 1), b"key longer than block size",
                 "OverBlockSizeKey"),
                (b"", b"empty key", "EmptyKey"),
                (b"\x01", b"", "EmptyMessage")]:
            tag = hm.new(key, msg, fn).digest()
            case(hashn, key, msg, tag, "valid", [fl], "hashlib-derived")
        key, msg = b"\x0b" * 20, b"Hi There"
        tag = hm.new(key, msg, fn).digest()
        case(hashn, key, msg, tag[:16], "valid", ["Truncated128"],
             "tag truncated to 128 bits (truncation comparison)")
        bad = bytearray(tag)
        bad[0] ^= 1
        case(hashn, key, msg, bytes(bad), "invalid", ["BitFlip"],
             "flipped tag bit")
        # HMAC's documented key-padding ambiguity: a short key and the
        # same key zero-extended (still below block size) are THE SAME
        # key after padding — the tag must verify (Wycheproof's
        # hmac_test.json flags this class; it is a property, not a bug)
        case(hashn, key + b"\x00", msg, tag, "valid",
             ["KeyPaddingAmbiguity"],
             "zero-extended short key == same padded key")
        wrong = bytes([key[0] ^ 0x01]) + key[1:]
        case(hashn, wrong, msg, tag, "invalid", ["WrongKey"],
             "tag computed under a different key (bit-flipped)")
        case(hashn, key, msg, tag[:15], "invalid", ["Encoding"],
             "15-byte truncation (below 128-bit floor)")
    return out


def main():
    vecs = (ecdsa_vectors() + eddsa_vectors() + x25519_vectors()
            + ecdsa_k1_vectors() + bip0340_vectors() + sm2_vectors()
            + x448_vectors() + ed448_vectors() + ecccdh_vectors()
            + hmac_vectors())
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        for v in vecs:
            f.write(json.dumps(v) + "\n")
    counts = {}
    for v in vecs:
        counts[(v["scheme"], v["result"])] = counts.get(
            (v["scheme"], v["result"]), 0) + 1
    print(f"wrote {len(vecs)} vectors -> {OUT}")
    for k in sorted(counts):
        print(f"  {k[0]:8s} {k[1]:10s} {counts[k]}")


if __name__ == "__main__":
    main()
