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


def main():
    vecs = ecdsa_vectors() + eddsa_vectors() + x25519_vectors()
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
