"""RFC 3279 / SEC1 ECParameters DER + PEM import/export.

TPU-native analog of the reference's user-curve-from-file path
(scripts/expand_libecc.py: `--ECfile` accepts RFC3279 DER/PEM curve
parameter files and turns them into registered curves with derived
Montgomery/division constants). Here the derived constants are computed
at registration time by `register_curve`/`FpCtx`, so all this module
needs is the ASN.1 codec:

    ECParameters ::= SEQUENCE {
        version   INTEGER { ecpVer1(1) },
        fieldID   SEQUENCE { fieldType OBJECT IDENTIFIER (prime-field),
                             parameters INTEGER (p) },
        curve     SEQUENCE { a OCTET STRING, b OCTET STRING,
                             seed BIT STRING OPTIONAL },
        base      OCTET STRING   -- SEC1 point (02/03 compressed, 04 full)
        order     INTEGER,
        cofactor  INTEGER OPTIONAL }

The named-curve form (a bare OBJECT IDENTIFIER) resolves against the
registry's stored OIDs. Like the reference, binary (GF(2^m)) fields are
rejected (ec_params.h:46-50: "we only support prime fields").

Pure-host code — runs once per curve load, never in the jitted path.
"""

from __future__ import annotations

import base64
import re

from . import params as _params

_PRIME_FIELD_OID = "1.2.840.10045.1.1"
_CHAR2_FIELD_OID = "1.2.840.10045.1.2"

# --------------------------------------------------------------------------
# Minimal DER codec (only the handful of universal types ECParameters uses)
# --------------------------------------------------------------------------


def _read_tlv(buf: bytes, off: int):
    """Returns (tag, value, next_off). Definite lengths only (DER)."""
    if off + 2 > len(buf):
        raise ValueError("truncated DER")
    tag = buf[off]
    length = buf[off + 1]
    off += 2
    if length & 0x80:
        nlen = length & 0x7F
        if nlen == 0 or nlen > 4 or off + nlen > len(buf):
            raise ValueError("bad DER length")
        length = int.from_bytes(buf[off:off + nlen], "big")
        if length < 0x80:
            raise ValueError("non-minimal DER length")
        off += nlen
    if off + length > len(buf):
        raise ValueError("truncated DER value")
    return tag, buf[off:off + length], off + length


def _der_int(v: bytes) -> int:
    if not v:
        raise ValueError("empty INTEGER")
    if v[0] & 0x80:
        raise ValueError("negative INTEGER in ECParameters")
    if len(v) > 1 and v[0] == 0 and not (v[1] & 0x80):
        raise ValueError("non-minimal INTEGER")
    return int.from_bytes(v, "big")


def _der_oid(v: bytes) -> str:
    if not v:
        raise ValueError("empty OID")
    first = v[0]
    out = [str(first // 40), str(first % 40)]
    acc = 0
    for byte in v[1:]:
        acc = (acc << 7) | (byte & 0x7F)
        if not byte & 0x80:
            out.append(str(acc))
            acc = 0
    if acc:
        raise ValueError("truncated OID arc")
    return ".".join(out)


def _enc_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(raw)]) + raw


def _enc_tlv(tag: int, value: bytes) -> bytes:
    return bytes([tag]) + _enc_len(len(value)) + value


def _enc_int(x: int) -> bytes:
    raw = x.to_bytes((x.bit_length() + 8) // 8 or 1, "big")
    return _enc_tlv(0x02, raw)


def _enc_oid(oid: str) -> bytes:
    arcs = [int(a) for a in oid.split(".")]
    body = bytearray([arcs[0] * 40 + arcs[1]])
    for arc in arcs[2:]:
        chunk = bytearray([arc & 0x7F])
        arc >>= 7
        while arc:
            chunk.append(0x80 | (arc & 0x7F))
            arc >>= 7
        body.extend(reversed(chunk))
    return _enc_tlv(0x06, bytes(body))


# --------------------------------------------------------------------------
# SEC1 point decode (compressed support needs a host modular sqrt)
# --------------------------------------------------------------------------


def _mod_sqrt(n: int, p: int) -> int | None:
    """Tonelli-Shanks on host ints (the device path lives in fp/field.py;
    this runs once per curve file, reference: fp_sqrt.c:107)."""
    n %= p
    if n == 0:
        return 0
    if pow(n, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(n, (p + 1) // 4, p)
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(n, q, p), pow(n, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
            if i == m:
                return None
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


def _decode_point(raw: bytes, p: int, a: int, b: int):
    """SEC1 §2.3.4 octet string -> affine (x, y)."""
    nb = (p.bit_length() + 7) // 8
    if not raw:
        raise ValueError("empty base point")
    if raw[0] == 0x04:
        if len(raw) != 1 + 2 * nb:
            raise ValueError("bad uncompressed point length")
        return (int.from_bytes(raw[1:1 + nb], "big"),
                int.from_bytes(raw[1 + nb:], "big"))
    if raw[0] in (0x02, 0x03):
        if len(raw) != 1 + nb:
            raise ValueError("bad compressed point length")
        x = int.from_bytes(raw[1:], "big")
        y = _mod_sqrt((x * x * x + a * x + b) % p, p)
        if y is None:
            raise ValueError("compressed base point not on curve")
        if y & 1 != raw[0] & 1:
            y = p - y
        return x, y
    raise ValueError(f"unsupported point form 0x{raw[0]:02x}")


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


def parse_ec_parameters(der: bytes) -> dict:
    """DER ECParameters (explicit or named-curve OID form) -> raw params
    dict {name?, p, a, b, gx, gy, q, h}."""
    tag, body, end = _read_tlv(der, 0)
    if end != len(der):
        raise ValueError("trailing bytes after ECParameters")
    if tag == 0x06:                      # named curve form
        oid = _der_oid(body)
        name = _params.find_by_oid(oid)
        if name is None:
            raise ValueError(f"unknown named curve OID {oid}")
        d = dict(_params.raw_params(name))
        d["name"] = name
        return d
    if tag != 0x30:
        raise ValueError("ECParameters must be SEQUENCE or OID")

    off = 0
    tag, v, off = _read_tlv(body, off)
    if tag != 0x02 or _der_int(v) != 1:
        raise ValueError("unsupported ECParameters version")

    tag, fid, off = _read_tlv(body, off)
    if tag != 0x30:
        raise ValueError("bad fieldID")
    t2, foid, o2 = _read_tlv(fid, 0)
    if t2 != 0x06:
        raise ValueError("bad fieldType")
    field_oid = _der_oid(foid)
    if field_oid == _CHAR2_FIELD_OID:
        raise ValueError("binary (GF(2^m)) fields unsupported "
                         "(matches reference, ec_params.h:46-50)")
    if field_oid != _PRIME_FIELD_OID:
        raise ValueError(f"unknown field type {field_oid}")
    t2, pv, _ = _read_tlv(fid, o2)
    if t2 != 0x02:
        raise ValueError("bad prime parameter")
    p = _der_int(pv)

    tag, cur, off = _read_tlv(body, off)
    if tag != 0x30:
        raise ValueError("bad curve SEQUENCE")
    t2, av, o2 = _read_tlv(cur, 0)
    if t2 != 0x04:
        raise ValueError("bad curve.a")
    t2, bv, o2 = _read_tlv(cur, o2)
    if t2 != 0x04:
        raise ValueError("bad curve.b")
    a, b = int.from_bytes(av, "big"), int.from_bytes(bv, "big")
    # optional seed BIT STRING ignored (the reference ignores it too)

    tag, base, off = _read_tlv(body, off)
    if tag != 0x04:
        raise ValueError("bad base point")
    gx, gy = _decode_point(base, p, a, b)

    tag, qv, off = _read_tlv(body, off)
    if tag != 0x02:
        raise ValueError("bad order")
    q = _der_int(qv)

    h = 1
    if off < len(body):
        tag, hv, off = _read_tlv(body, off)
        if tag != 0x02:
            raise ValueError("bad cofactor")
        h = _der_int(hv)
    return dict(p=p, a=a, b=b, gx=gx, gy=gy, q=q, h=h)


_PEM_RE = re.compile(
    rb"-----BEGIN ([A-Z0-9 ]+)-----(.*?)-----END \1-----", re.S)


def pem_to_der(text: bytes) -> bytes:
    m = _PEM_RE.search(text)
    if not m:
        raise ValueError("no PEM block found")
    return base64.b64decode(re.sub(rb"\s+", b"", m.group(2)))


def load_curve_file(data: bytes, name: str | None = None,
                    register: bool = True) -> str:
    """Import a curve from RFC3279 DER or PEM bytes; registers it (the
    expand_libecc.py user-curve flow) and returns the curve name."""
    if b"-----BEGIN" in data:
        data = pem_to_der(data)
    d = parse_ec_parameters(data)
    cname = name or d.pop("name", None) or f"USER_{d['p'] % (1 << 32):08X}"
    d.pop("name", None)
    if register:
        _params.register_curve(cname, **d)
    return cname


def export_ec_parameters(curve_name: str, compressed: bool = False,
                         pem: bool = False) -> bytes:
    """Registered curve -> explicit-form DER (or PEM) ECParameters."""
    d = _params.raw_params(curve_name)
    p, a, b = d["p"], d["a"], d["b"]
    nb = (p.bit_length() + 7) // 8
    if compressed:
        base = bytes([0x02 | (d["gy"] & 1)]) + d["gx"].to_bytes(nb, "big")
    else:
        base = (b"\x04" + d["gx"].to_bytes(nb, "big")
                + d["gy"].to_bytes(nb, "big"))
    body = (_enc_int(1)
            + _enc_tlv(0x30, _enc_oid(_PRIME_FIELD_OID) + _enc_int(p))
            + _enc_tlv(0x30, _enc_tlv(0x04, a.to_bytes(nb, "big"))
                       + _enc_tlv(0x04, b.to_bytes(nb, "big")))
            + _enc_tlv(0x04, base)
            + _enc_int(d["q"])
            + _enc_int(d["h"]))
    der = _enc_tlv(0x30, body)
    if pem:
        b64 = base64.b64encode(der)
        lines = [b64[i:i + 64] for i in range(0, len(b64), 64)]
        return (b"-----BEGIN EC PARAMETERS-----\n"
                + b"\n".join(lines)
                + b"\n-----END EC PARAMETERS-----\n")
    return der
