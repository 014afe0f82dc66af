"""Opcode-stream differential arithmetic tester.

TPU-native analog of the reference's arithmetic test harness
(src/arithmetic_tests/arithmetic_tests_generator.py emits an ASCII opcode
stream with Python-int-computed expected results; arithmetic_tests.c
parses and checks each op against the C library — SURVEY §4.2). Here the
same split holds: `generate()` computes expectations with *Python ints*
(the independent oracle), `run_stream()` replays every op through the
batched JAX/Pallas kernels and compares bit-exactly.

Stream format (one op per line, '#' comments allowed):

    OPNAME [static params...] hex_in... = hex_out...

Ops are grouped by (opcode, static params) and dispatched as ONE batched
kernel call per group — the lane-vectorized replay of what the reference
runs word-serially. Covered opcode families (reference generator
:1310-1896): NN shifts/rotates/bitwise, ADD/SUB, MUL, DIVREM/MOD,
GCD/XGCD, MODINV/MODINV_2EXP/MODINV_WORD, MOD_POW, MUL_REDC1/COEF_REDC1,
FP_ADD/SUB/MUL/MUL_MONTY/POW/SQRT/LEGENDRE. (COEF_DIV has no analog: the
framework replaces reciprocal division with Montgomery reduce_wide,
nn/ops.py module docstring.)
"""

from __future__ import annotations

import random

import numpy as np
import jax.numpy as jnp

from .nn import core as nn
from .nn import ops as nnops
from .nn.core import LIMB_BITS
from .fp import field as fp

# two fixed odd primes: the P-256 prime (special form) and a generic
# 256-bit prime (Brainpool P-256 p) — both public standard constants
_P256 = 0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF
_BP256 = 0xA9FB57DBA1EEA9BC3E660A909D838D726E3BF623D52620282013481D1F6E5377
_PRIMES = (_P256, _BP256)

_W = 256                       # operand width for the NN ops


def _h(x: int) -> str:
    return format(x, "x")


def _rnd(rng, bits):
    return rng.getrandbits(rng.choice([bits // 4, bits // 2, bits])) or 1


def generate(n_per_op: int = 8, seed: int = 0xA17) -> list[str]:
    """Emit the opcode stream; expected results via Python ints only."""
    rng = random.Random(seed)
    out = [f"# libecc_tpu arith stream seed={seed} n={n_per_op} "
           f"limb_bits={LIMB_BITS}"]
    W = _W
    mask = (1 << W) - 1
    for idx in range(n_per_op):
        a, b = _rnd(rng, W), _rnd(rng, W)
        n = rng.choice([1, 13, 15, 64])
        out.append(f"NN_SHIFT_LEFT {W} {n} {_h(a)} = {_h((a << n) & mask)}")
        out.append(f"NN_SHIFT_RIGHT {W} {n} {_h(a)} = {_h(a >> n)}")
        rot = ((a << n) | (a >> (W - n))) & mask
        out.append(f"NN_ROTATE_LEFT {W} {n} {_h(a)} = {_h(rot)}")
        rotr = ((a >> n) | (a << (W - n))) & mask
        out.append(f"NN_ROTATE_RIGHT {W} {n} {_h(a)} = {_h(rotr)}")
        out.append(f"NN_XOR {W} {_h(a)} {_h(b)} = {_h(a ^ b)}")
        out.append(f"NN_OR {W} {_h(a)} {_h(b)} = {_h(a | b)}")
        out.append(f"NN_AND {W} {_h(a)} {_h(b)} = {_h(a & b)}")
        out.append(f"NN_NOT {W} {_h(a)} = {_h((~a) & mask)}")
        out.append(f"NN_ADD {_h(a)} {_h(b)} = {_h(a + b)}")
        hi, lo = max(a, b), min(a, b)
        out.append(f"NN_SUB {_h(hi)} {_h(lo)} = {_h(hi - lo)}")
        out.append(f"NN_MUL {_h(a)} {_h(b)} = {_h(a * b)}")
        out.append(f"NN_DIVREM {_h(a)} {_h(b)} = {_h(a // b)} {_h(a % b)}")
        out.append(f"NN_MOD {_h(a)} {_h(b)} = {_h(a % b)}")
        import math
        out.append(f"NN_GCD {_h(a)} {_h(b)} = {_h(math.gcd(a, b))}")
        g = math.gcd(a, b)
        out.append(f"NN_XGCD {_h(a)} {_h(b)} = {_h(g)}")
        m = _rnd(rng, W) | 1
        if m <= 2:
            m = 5
        am = a % m or 1
        try:
            inv = pow(am, -1, m)
            out.append(f"NN_MODINV {_h(am)} {_h(m)} = {_h(inv)} 1")
        except ValueError:
            out.append(f"NN_MODINV {_h(am)} {_h(m)} = 0 0")
        e2 = rng.choice([17, 128, 255])
        ao = a | 1
        inv2 = pow(ao, -1, 1 << e2)
        out.append(f"NN_MODINV_2EXP {e2} {_h(ao)} = {_h(inv2)}")
        aw = rng.getrandbits(15) | 1
        mw = rng.getrandbits(15) | 1
        while math.gcd(aw, mw) != 1 or mw < 2:
            mw = rng.getrandbits(15) | 1
        out.append(f"NN_MODINV_WORD {_h(aw)} {_h(mw)} = "
                   f"{_h(pow(aw, -1, mw))}")
        # alternate the two primes (special-form vs generic) across ops so
        # both field shapes are covered without doubling kernel compiles
        for p in (_PRIMES[idx % 2],):
            k = nn.num_limbs(p.bit_length())
            R = 1 << (k * LIMB_BITS)
            ap, bp = a % p, b % p
            out.append(f"NN_MUL_REDC1 {_h(p)} {_h(ap)} {_h(bp)} = "
                       f"{_h(ap * bp * pow(R, -1, p) % p)}")
            out.append(f"NN_MOD_POW {_h(p)} {_h(ap)} {_h(bp)} = "
                       f"{_h(pow(ap, bp, p))}")
            out.append(f"FP_ADD {_h(p)} {_h(ap)} {_h(bp)} = "
                       f"{_h((ap + bp) % p)}")
            out.append(f"FP_SUB {_h(p)} {_h(ap)} {_h(bp)} = "
                       f"{_h((ap - bp) % p)}")
            out.append(f"FP_MUL {_h(p)} {_h(ap)} {_h(bp)} = "
                       f"{_h(ap * bp % p)}")
            kf = nn.num_limbs(p.bit_length()) + fp.FpCtx.HEADROOM_LIMBS
            Rf = 1 << (kf * LIMB_BITS)
            out.append(f"FP_MUL_MONTY {_h(p)} {_h(ap)} {_h(bp)} = "
                       f"{_h(ap * bp * pow(Rf, -1, p) % p)}")
            eps = rng.getrandbits(64)
            out.append(f"FP_POW {_h(p)} {_h(ap)} {_h(eps)} = "
                       f"{_h(pow(ap, eps, p))}")
            ls = pow(ap, (p - 1) // 2, p)
            leg = 1 if (ls == 1 or ap == 0) else 0
            out.append(f"FP_LEGENDRE {_h(p)} {_h(ap)} = {leg}")
            sq = ap * ap % p
            r0 = min_sqrt(sq, p)
            out.append(f"FP_SQRT {_h(p)} {_h(sq)} = {_h(r0)} 1")
    # COEF_REDC1: derived Montgomery constants per prime (once each)
    for p in _PRIMES:
        k = nn.num_limbs(p.bit_length())
        R = 1 << (k * LIMB_BITS)
        mpinv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        out.append(f"NN_COEF_REDC1 {_h(p)} = {_h(R % p)} "
                   f"{_h(R * R % p)} {_h(mpinv)}")
    return out


def min_sqrt(sq: int, p: int) -> int:
    """Canonical (smaller) square root via Python pow — oracle side."""
    if sq == 0:
        return 0
    # Tonelli-Shanks on host ints
    if p % 4 == 3:
        r = pow(sq, (p + 1) // 4, p)
    else:
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        m, c, t, r = s, pow(z, q, p), pow(sq, q, p), pow(sq, (q + 1) // 2, p)
        while t != 1:
            i, t2 = 0, t
            while t2 != 1:
                t2 = t2 * t2 % p
                i += 1
            bb = pow(c, 1 << (m - i - 1), p)
            m, c = i, bb * bb % p
            t, r = t * c % p, r * bb % p
    return min(r, p - r)


# ---------------------------------------------------------------------------
# Runner: parse, group, batched dispatch, compare
# ---------------------------------------------------------------------------


_LANE_PAD = 8     # pad group batches to a multiple of this so kernel
                  # shapes are stable across seeds/runs (compile reuse)


def _pack(vals, k):
    vals = list(vals)
    pad = (-len(vals)) % _LANE_PAD
    return jnp.asarray(nn.batch_to_limbs(vals + [vals[0]] * pad, k))


def _ints(arr):
    return nn.batch_from_limbs(np.asarray(arr))


def _fpack(ctx, vals):
    """Montgomery-domain field pack with lane padding (see _pack)."""
    vals = list(vals)
    pad = (-len(vals)) % _LANE_PAD
    return ctx.from_ints(vals + [vals[0]] * pad)


def run_stream(lines, fail_fast: bool = False):
    """Replay an opcode stream through the batched kernels.

    Returns dict(total=..., failures=[(line, got), ...]). One batched
    kernel dispatch per (opcode, static params) group.
    """
    groups: dict[tuple, list[tuple[list[int], list[int], str]]] = {}
    total = 0
    for ln in lines:
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        lhs, rhs = ln.split("=")
        toks = lhs.split()
        op = toks[0]
        nstatic = {"NN_SHIFT_LEFT": 2, "NN_SHIFT_RIGHT": 2,
                   "NN_ROTATE_LEFT": 2, "NN_ROTATE_RIGHT": 2,
                   "NN_XOR": 1, "NN_OR": 1, "NN_AND": 1, "NN_NOT": 1,
                   "NN_MODINV_2EXP": 1}.get(op, 0)
        static = tuple(int(t) for t in toks[1:1 + nstatic])
        ins = [int(t, 16) for t in toks[1 + nstatic:]]
        outs = [int(t, 16) for t in rhs.split()]
        # MUL_REDC1/MOD_POW/FP_*: first operand (the modulus) is static
        if op.startswith("FP_") or op in ("NN_MUL_REDC1", "NN_MOD_POW",
                                          "NN_COEF_REDC1"):
            static = (ins[0],)
            ins = ins[1:]
        groups.setdefault((op, static), []).append((ins, outs, ln))
        total += 1

    failures = []

    def check(lanes, got_lists):
        """got_lists: list per output position of per-lane ints."""
        for i, (_ins, outs, ln) in enumerate(lanes):
            got = [g[i] for g in got_lists]
            if got != outs:
                failures.append((ln, got))
                if fail_fast:
                    raise AssertionError(f"{ln}\n  got {got}")

    _fp_ctxs: dict[int, fp.FpCtx] = {}

    for (op, static), lanes in groups.items():
        ins = [list(col) for col in zip(*[l[0] for l in lanes])]
        if op == "NN_COEF_REDC1":
            p = static[0]
            ctx = nn.MontCtx(p)
            got = [[ctx.r_int] * len(lanes), [ctx.r2_int] * len(lanes),
                   [ctx.mpinv] * len(lanes)]
            check(lanes, got)
            continue
        if op == "NN_MODINV_WORD":
            got = [[nnops.modinv_word(a, m)
                    for a, m in zip(ins[0], ins[1])]]
            check(lanes, got)
            continue

        if op.startswith("FP_") or op in ("NN_MUL_REDC1", "NN_MOD_POW"):
            p = static[0]
            if op in ("NN_MUL_REDC1",):
                ctx = nn.MontCtx(p)
                a = _pack(ins[0], ctx.k)
                b = _pack(ins[1], ctx.k)
                got = [_ints(nn.mont_mul(a, b, ctx))]
            elif op == "NN_MOD_POW":
                ctx = nn.MontCtx(p)
                a = _pack(ins[0], ctx.k)
                e = _pack(ins[1], ctx.k)
                got = [_ints(nn.mod_pow(a, e, ctx))]
            else:
                if p not in _fp_ctxs:
                    _fp_ctxs[p] = fp.FpCtx(p)
                ctx = _fp_ctxs[p]
                if op == "FP_MUL_MONTY":
                    # raw redc semantics: inputs NOT redcified first
                    a = _pack(ins[0], ctx.k)
                    b = _pack(ins[1], ctx.k)
                    got = [ctx.to_ints(fp.mul(a, b, ctx), from_mont=False)]
                else:
                    a = _fpack(ctx, ins[0])
                    if op == "FP_ADD":
                        r = fp.add(a, _fpack(ctx, ins[1]), ctx)
                    elif op == "FP_SUB":
                        r = fp.sub(a, _fpack(ctx, ins[1]), ctx)
                    elif op == "FP_MUL":
                        r = fp.mul(a, _fpack(ctx, ins[1]), ctx)
                    elif op == "FP_POW":
                        e = _pack(ins[1], ctx.k)
                        r = nn.to_mont(
                            nn.mod_pow(_pack(ins[0], ctx.k),
                                       e, ctx, nbits=64), ctx)
                    elif op == "FP_LEGENDRE":
                        leg = fp.legendre_qr_mask(a, ctx)
                        got = [[int(x) for x in np.asarray(leg)]]
                        check(lanes, got)
                        continue
                    elif op == "FP_SQRT":
                        r, ok = fp.sqrt(a, ctx)
                        rv = ctx.to_ints(r)
                        rv = [min(v, p - v) if v else 0 for v in rv]
                        got = [rv, [int(x) for x in np.asarray(ok)]]
                        check(lanes, got)
                        continue
                    else:
                        raise ValueError(op)
                    got = [ctx.to_ints(r)]
            check(lanes, got)
            continue

        # pure NN ops: pin the limb width to the stream's nominal operand
        # width (not the per-group max) so kernel shapes are stable
        maxbits = max((max(v.bit_length() for v in col) if col else 1)
                      for col in ins) or 1
        maxbits = max(maxbits, _W)
        if op in ("NN_SHIFT_LEFT", "NN_ROTATE_LEFT", "NN_ROTATE_RIGHT",
                  "NN_XOR", "NN_OR", "NN_AND", "NN_NOT",
                  "NN_SHIFT_RIGHT"):
            W = static[0]
            k = nn.num_limbs(W)
            a = _pack(ins[0], k)
            if op == "NN_SHIFT_LEFT":
                r = nn.truncate_bits(nnops.lshift(a, static[1], k), W)
            elif op == "NN_SHIFT_RIGHT":
                r = nn.rshift(a, static[1])
            elif op == "NN_ROTATE_LEFT":
                r = nnops.rotate_left(a, static[1], W)
            elif op == "NN_ROTATE_RIGHT":
                r = nnops.rotate_right(a, static[1], W)
            elif op == "NN_NOT":
                r = nn.truncate_bits(nnops.bitwise_not(a), W)
            else:
                b = _pack(ins[1], k)
                r = {"NN_XOR": nnops.bitwise_xor, "NN_OR": nnops.bitwise_or,
                     "NN_AND": nnops.bitwise_and}[op](a, b)
            check(lanes, [_ints(r)])
            continue

        k = nn.num_limbs(maxbits)
        if op == "NN_ADD":
            a, b = _pack(ins[0], k + 1), _pack(ins[1], k + 1)
            s, carry = nn.add(a, b)
            check(lanes, [_ints(s)])
        elif op == "NN_SUB":
            a, b = _pack(ins[0], k), _pack(ins[1], k)
            d, _ = nn.sub(a, b)
            check(lanes, [_ints(d)])
        elif op == "NN_MUL":
            a, b = _pack(ins[0], k), _pack(ins[1], k)
            check(lanes, [_ints(nn.mul(a, b))])
        elif op == "NN_DIVREM":
            a, b = _pack(ins[0], k), _pack(ins[1], k)
            q, r = nnops.divrem(a, b)
            check(lanes, [_ints(q), _ints(r)])
        elif op == "NN_MOD":
            a, b = _pack(ins[0], k), _pack(ins[1], k)
            check(lanes, [_ints(nnops.mod(a, b))])
        elif op == "NN_GCD":
            a, b = _pack(ins[0], k), _pack(ins[1], k)
            check(lanes, [_ints(nnops.gcd(a, b))])
        elif op == "NN_XGCD":
            a, b = _pack(ins[0], k), _pack(ins[1], k)
            g, u, v, pos, ok = nnops.xgcd(a, b)
            gi, ui, vi = _ints(g), _ints(u), _ints(v)
            posm, okm = np.asarray(pos), np.asarray(ok)
            # verify the Bezout identity per lane (u, v are not unique, so
            # the stream only pins g — the identity is the real check)
            for i, (lin, outs, ln) in enumerate(lanes):
                aa, bb = lin
                bez = (ui[i] * aa - vi[i] * bb if posm[i]
                       else vi[i] * bb - ui[i] * aa)
                if not okm[i] or gi[i] != outs[0] or bez != outs[0]:
                    failures.append((ln, [gi[i], ui[i], vi[i]]))
        elif op == "NN_MODINV":
            a, m = _pack(ins[0], k), _pack(ins[1], k)
            inv, ok = nnops.modinv(a, m)
            invi, okm = _ints(inv), np.asarray(ok)
            got = [[invi[i] if okm[i] else 0 for i in range(len(lanes))],
                   [int(x) for x in okm]]
            check(lanes, got)
        elif op == "NN_MODINV_2EXP":
            e2 = static[0]
            a = _pack(ins[0], nn.num_limbs(max(maxbits, e2, _W)))
            inv, ok = nnops.modinv_2exp(a, e2)
            check(lanes, [_ints(inv)])
        else:
            raise ValueError(f"unknown opcode {op}")

    return {"total": total, "failures": failures}
