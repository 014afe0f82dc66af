"""RSA: RSAES/RSASSA-PKCS1-v1_5 and RSASSA-PSS — batched TPU modexp core.

Reference: src/examples/sig/rsa/rsa.c (2056 LoC, RFC 8017 subset). The
hot operation (modular exponentiation) runs as a batched fixed-schedule
square-and-multiply device kernel over the same limb tensors as the ECC
stack (the point of the examples tier: the NN layer stands alone,
README_original.md:145-156). Padding/encoding run on host.

Private operations use the CRT form when available (two half-size
exponentiations, like the reference's rsadp_crt).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..hash.registry import get_hash

_JITS: dict = {}


def _modexp_jit(ctx: nn.MontCtx, nbits: int):
    key = (ctx.p_int, nbits)
    if key not in _JITS:
        def f(base, exp):
            return nn.mod_pow(base, exp, ctx, nbits=nbits)
        _JITS[key] = jax.jit(f)
    return _JITS[key]


def modexp_batch(bases: list[int], exps: list[int], modulus: int,
                 exp_bits: int | None = None) -> list[int]:
    """Batched b^e mod m on device (odd m). The RSAEP/RSADP primitive."""
    ctx = nn.MontCtx(modulus, nn.num_limbs(modulus.bit_length()) + 1)
    if exp_bits is None:
        exp_bits = max(e.bit_length() for e in exps)
    kexp = nn.num_limbs(exp_bits)
    b = jnp.asarray(nn.batch_to_limbs([b % modulus for b in bases], ctx.k))
    e = jnp.asarray(nn.batch_to_limbs(exps, kexp))
    out = _modexp_jit(ctx, exp_bits)(b, e)
    return nn.batch_from_limbs(np.asarray(out))


@dataclass
class RsaKeyPair:
    n: int
    e: int
    d: int
    p: int | None = None
    q: int | None = None

    @property
    def bits(self) -> int:
        return self.n.bit_length()

    @property
    def k(self) -> int:
        return (self.bits + 7) // 8


def keygen(bits: int, e: int = 65537, rng=None) -> RsaKeyPair:
    """Host keygen with Miller-Rabin primes (see extras.primes)."""
    from .primes import gen_prime
    rng = rng or os.urandom
    while True:
        p = gen_prime(bits // 2, rng)
        q = gen_prime(bits - bits // 2, rng)
        if p == q:
            continue
        n = p * q
        lam = (p - 1) * (q - 1)
        if n.bit_length() != bits:
            continue
        try:
            d = pow(e, -1, lam)
        except ValueError:
            continue
        return RsaKeyPair(n=n, e=e, d=d, p=p, q=q)


def rsaep_batch(kp: RsaKeyPair, ms: list[int]) -> list[int]:
    return modexp_batch(ms, [kp.e] * len(ms), kp.n)


def rsadp_batch(kp: RsaKeyPair, cs: list[int]) -> list[int]:
    """Private exponentiation; CRT split when p, q available (two
    half-width device exponentiations + host recombination)."""
    if kp.p is None:
        return modexp_batch(cs, [kp.d] * len(cs), kp.n)
    p, q = kp.p, kp.q
    dp, dq = kp.d % (p - 1), kp.d % (q - 1)
    qinv = pow(q, -1, p)
    mp = modexp_batch(cs, [dp] * len(cs), p)
    mq = modexp_batch(cs, [dq] * len(cs), q)
    return [(mq[i] + q * ((qinv * (mp[i] - mq[i])) % p)) % kp.n
            for i in range(len(cs))]


# -- EMSA encodings (host; RFC 8017) ------------------------------------------

DIGEST_INFO = {
    "SHA224": bytes.fromhex("302d300d06096086480165030402040500041c"),
    "SHA256": bytes.fromhex("3031300d060960864801650304020105000420"),
    "SHA384": bytes.fromhex("3041300d060960864801650304020205000430"),
    "SHA512": bytes.fromhex("3051300d060960864801650304020305000440"),
    # legacy digests (RFC 8017 A.2.4 / RFC 2313) — the X.509-compat story
    # the reference keeps examples/hash/ around for (examples/hash/hash.c)
    "MD2": bytes.fromhex("3020300c06082a864886f70d020205000410"),
    "MD4": bytes.fromhex("3020300c06082a864886f70d020405000410"),
    "MD5": bytes.fromhex("3020300c06082a864886f70d020505000410"),
    "SHA1": bytes.fromhex("3021300906052b0e03021a05000414"),
}


def _emsa_pkcs1_v15(m: bytes, em_len: int, hash_name: str) -> bytes:
    alg = get_hash(hash_name)
    t = DIGEST_INFO[hash_name.upper()] + alg.hash(m)
    if em_len < len(t) + 11:
        raise ValueError("intended encoded message length too short")
    return b"\x00\x01" + b"\xff" * (em_len - len(t) - 3) + b"\x00" + t


def mgf1(seed: bytes, length: int, hash_name: str) -> bytes:
    alg = get_hash(hash_name)
    out = b""
    c = 0
    while len(out) < length:
        out += alg.hash(seed + c.to_bytes(4, "big"))
        c += 1
    return out[:length]


def _emsa_pss_encode(m: bytes, em_bits: int, hash_name: str,
                     salt: bytes | None, rng) -> bytes:
    alg = get_hash(hash_name)
    h_len = alg.digest_size
    em_len = (em_bits + 7) // 8
    if salt is None:
        salt = rng(h_len)
    mh = alg.hash(m)
    if em_len < h_len + len(salt) + 2:
        raise ValueError("encoding error")
    h = alg.hash(b"\x00" * 8 + mh + salt)
    ps = b"\x00" * (em_len - len(salt) - h_len - 2)
    db = ps + b"\x01" + salt
    mask = mgf1(h, em_len - h_len - 1, hash_name)
    masked = bytes(a ^ b for a, b in zip(db, mask))
    # clear the leftmost 8*em_len - em_bits bits
    clear = 8 * em_len - em_bits
    masked = bytes([masked[0] & (0xFF >> clear)]) + masked[1:]
    return masked + h + b"\xbc"


def _emsa_pss_verify(m: bytes, em: bytes, em_bits: int, hash_name: str,
                     s_len: int) -> bool:
    alg = get_hash(hash_name)
    h_len = alg.digest_size
    em_len = (em_bits + 7) // 8
    if em_len < h_len + s_len + 2 or em[-1] != 0xBC:
        return False
    masked, h = em[: em_len - h_len - 1], em[em_len - h_len - 1: -1]
    clear = 8 * em_len - em_bits
    if masked[0] & ~(0xFF >> clear) & 0xFF:
        return False
    mask = mgf1(h, em_len - h_len - 1, hash_name)
    db = bytes(a ^ b for a, b in zip(masked, mask))
    db = bytes([db[0] & (0xFF >> clear)]) + db[1:]
    pslen = em_len - h_len - s_len - 2
    if db[:pslen] != b"\x00" * pslen or db[pslen] != 0x01:
        return False
    salt = db[pslen + 1:]
    return alg.hash(b"\x00" * 8 + alg.hash(m) + salt) == h


# -- public API (batched) ------------------------------------------------------

def sign_pkcs1_v15_batch(kp: RsaKeyPair, msgs, hash_name="SHA256"):
    ems = [int.from_bytes(_emsa_pkcs1_v15(m, kp.k, hash_name), "big")
           for m in msgs]
    sigs = rsadp_batch(kp, ems)
    return [s.to_bytes(kp.k, "big") for s in sigs]


def verify_pkcs1_v15_batch(kp: RsaKeyPair, msgs, sigs, hash_name="SHA256"):
    ss = [int.from_bytes(s, "big") for s in sigs]
    ems = rsaep_batch(kp, ss)
    out = []
    for m, em in zip(msgs, ems):
        try:
            expect = _emsa_pkcs1_v15(m, kp.k, hash_name)
        except ValueError:
            out.append(False)
            continue
        out.append(em.to_bytes(kp.k, "big") == expect)
    return np.array(out)


def sign_pss_batch(kp: RsaKeyPair, msgs, hash_name="SHA256", salts=None,
                   rng=None):
    rng = rng or os.urandom
    em_bits = kp.bits - 1
    ems = [int.from_bytes(
        _emsa_pss_encode(m, em_bits, hash_name,
                         salts[i] if salts else None, rng), "big")
        for i, m in enumerate(msgs)]
    sigs = rsadp_batch(kp, ems)
    return [s.to_bytes(kp.k, "big") for s in sigs]


def verify_pss_batch(kp: RsaKeyPair, msgs, sigs, hash_name="SHA256",
                     s_len=None):
    alg = get_hash(hash_name)
    s_len = alg.digest_size if s_len is None else s_len
    em_bits = kp.bits - 1
    em_len = (em_bits + 7) // 8
    ss = [int.from_bytes(s, "big") for s in sigs]
    ems = rsaep_batch(kp, ss)
    return np.array([
        _emsa_pss_verify(m, em.to_bytes(em_len, "big"), em_bits,
                         hash_name, s_len)
        for m, em in zip(msgs, ems)])


def encrypt_pkcs1_v15_batch(kp: RsaKeyPair, msgs, rng=None):
    rng = rng or os.urandom
    out = []
    for m in msgs:
        if len(m) > kp.k - 11:
            raise ValueError("message too long")
        ps = b""
        while len(ps) < kp.k - len(m) - 3:
            b = rng(1)
            if b != b"\x00":
                ps += b
        out.append(int.from_bytes(b"\x00\x02" + ps + b"\x00" + m, "big"))
    cs = rsaep_batch(kp, out)
    return [c.to_bytes(kp.k, "big") for c in cs]


def decrypt_pkcs1_v15_batch(kp: RsaKeyPair, cts):
    cs = [int.from_bytes(c, "big") for c in cts]
    ems = rsadp_batch(kp, cs)
    out = []
    for em in ems:
        b = em.to_bytes(kp.k, "big")
        if b[:2] != b"\x00\x02" or b"\x00" not in b[2:]:
            out.append(None)
            continue
        sep = b.index(0, 2)
        out.append(b[sep + 1:] if sep >= 10 else None)
    return out
