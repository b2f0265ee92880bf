"""Ed25519 signature-verification AIR ("chip") with bus I/O.

TPU-native equivalent of the reference's starkyx curve25519 STARK
accelerator (SURVEY.md D11). One segment proves one signature:

    [S]B == R + [k512]A

where k512 = SHA512(R||A||M) (full 512-bit value, unreduced — equal to the
RFC-8032 check for prime-order keys; diverges only on adversarial keys
with small-order components, the same gray zone batch verifiers and ZIP215
occupy). The SHA-512 itself is proved by the SHA-512 chip; the challenge
bytes flow CPU -> here over the bus as 16-bit limbs.

Row = one unified twisted-Edwards addition (a = -1, extended coordinates),
9 modular muls over 2^255-19, each with a carry-polynomial identity on
16-bit limbs (all limbs/carries range-checked via the range16/bytes chips):

    u(x)*v(x) - c(x) - q(x)*p(x) = (x - 2^16) * k(x)

Segment layout (SEG = 4 + 2*nbits_a + nbits_b):
  row 0        LOAD_A: decompress pubkey A -> D, ACC <- neutral
  row 1        LOAD_R: decompress R -> REG
  rows 2..     phase A: nbits_a pairs (CADD_A, DBL): ACC += bit_i * D,
               D <- 2D   (computes [k512]A, bits LSB-first)
  row addr     ADDR: REG <- ACC + REG (= [k512]A + R), ACC <- neutral
  rows ..      phase B: nbits_b CADD_B rows with preprocessed [2^i]B
  row final    FINAL: projective equality ACC == REG

Scalar bits are packed 16 per limb and checked against bus-received limbs
at group-end rows. Point decompression enforces canonical encodings
(x < p, y < p, parity == sign bit).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..proof.air import Air, AirBuilder, Elem
from ..tendermint import ed25519 as ed
from . import channels as ch

P25519 = ed.P
BETA = 1 << 16
NLIMB = 16
OFFSET = 1 << 23  # carry-coefficient offset: k + OFFSET = klo + 2^16*khi


def to_limbs(v: int, n: int = NLIMB) -> List[int]:
    return [(v >> (16 * i)) & 0xFFFF for i in range(n)]


PL = to_limbs(P25519)
PM1L = to_limbs(P25519 - 1)
DL = to_limbs(ed.D)
D2L = to_limbs(2 * ed.D % P25519)
THREEP = to_limbs(3 * P25519, 17)
ONEL = to_limbs(1)
ZEROL = to_limbs(0)
TWOL = to_limbs(2)

# ---------------------------------------------------------------------------
# column map
# ---------------------------------------------------------------------------

REG_D = 0     # X, Y, Z, T x 16 limbs
REG_ACC = 64
REG_REG = 128
SLOT0 = 192
SLOT_SIZE = 99  # c16 + q17 + klo33 + khi33
C_OFF, Q_OFF, KLO_OFF, KHI_OFF = 0, 16, 33, 66
N_SLOTS = 9
COL_BIT = SLOT0 + N_SLOTS * SLOT_SIZE  # 1083
COL_PK = COL_BIT + 1
COL_SC = COL_BIT + 2
COL_SGN = COL_BIT + 3
COL_H15 = COL_BIT + 4
COL_M1 = COL_BIT + 5
COL_M2 = COL_BIT + 6
WIDTH = COL_BIT + 7

# preprocessed
T_LOAD_A, T_LOAD_R, T_DBL, T_CADD_A, T_CADD_B, T_ADDR, T_FINAL = range(7)
P_GEND = 7
P_PKZERO = 8
P_GIDX = 9
P_WEIGHT = 10
P_WHICH = 11
P_INST = 12
P_REAL = 13
P_BT = 14  # 48 cols: x, y, t limbs of the B power
PRE_WIDTH = P_BT + 48

# scalar channel "which" ids
WHICH_A, WHICH_R, WHICH_S, WHICH_K = 0, 1, 2, 3

X, Y, Z, T = 0, 1, 2, 3


def slot_col(s: int, off: int) -> int:
    return SLOT0 + s * SLOT_SIZE + off


# ---------------------------------------------------------------------------
# operand specs: (terms, const_limbs) with terms = [(coeff, source)],
# source = ('reg', base_col+coord*16) | ('c', slot) | ('bt', 0..2)
# ---------------------------------------------------------------------------

def _reg(base, coord):
    return ("reg", base + 16 * coord)


def _add_dataflow(p1_base, p2):
    """p2: register base, 'bt' (B table) or 'reg_r'. Returns slot specs."""
    if p2 == "bt":
        x2, y2, t2 = ("bt", 0), ("bt", 1), ("bt", 2)
        z2_terms, z2_const = [], TWOL  # 2*Z2 with Z2 = 1
    else:
        x2, y2, t2 = _reg(p2, X), _reg(p2, Y), _reg(p2, T)
        z2_terms, z2_const = [(2, _reg(p2, Z))], None
    x1, y1, z1, t1 = (_reg(p1_base, c) for c in (X, Y, Z, T))
    E = ([(1, ("c", 1)), (-1, ("c", 0))], THREEP)
    F = ([(1, ("c", 4)), (-1, ("c", 3))], THREEP)
    G = ([(1, ("c", 4)), (1, ("c", 3))], None)
    H = ([(1, ("c", 1)), (1, ("c", 0))], None)
    return {
        0: (([(1, y1), (-1, x1)], THREEP), ([(1, y2), (-1, x2)], THREEP)),
        1: (([(1, y1), (1, x1)], None), ([(1, y2), (1, x2)], None)),
        2: (([(1, t1)], None), ([(1, t2)], None)),
        3: (([(1, ("c", 2))], None), ([], D2L)),  # C * 2d
        4: (([(1, z1)], None), (z2_terms, z2_const)),
        5: (E, F),   # X3
        6: (G, H),   # Y3
        7: (E, H),   # T3
        8: (F, G),   # Z3
    }


SLOTS_BY_TYPE: Dict[int, Dict[int, tuple]] = {
    T_DBL: _add_dataflow(REG_D, REG_D),
    T_CADD_A: _add_dataflow(REG_ACC, REG_D),
    T_CADD_B: _add_dataflow(REG_ACC, "bt"),
    T_ADDR: _add_dataflow(REG_ACC, REG_REG),
    T_LOAD_A: {
        0: (([(1, ("c", 7))], None), ([(1, ("c", 7))], None)),  # y^2
        1: (([(1, ("c", 6))], None), ([(1, ("c", 6))], None)),  # x^2
        2: (([(1, ("c", 0))], None), ([(1, ("c", 1))], None)),  # x^2 y^2
        3: (([(1, ("c", 2))], None), ([], DL)),                 # d x^2 y^2
        5: (([(1, ("c", 6))], None), ([(1, ("c", 7))], None)),  # t = x*y
    },
    T_FINAL: {
        0: (([(1, _reg(REG_ACC, X))], None), ([(1, _reg(REG_REG, Z))], None)),
        1: (([(1, _reg(REG_REG, X))], None), ([(1, _reg(REG_ACC, Z))], None)),
        2: (([(1, _reg(REG_ACC, Y))], None), ([(1, _reg(REG_REG, Z))], None)),
        3: (([(1, _reg(REG_REG, Y))], None), ([(1, _reg(REG_ACC, Z))], None)),
    },
}
SLOTS_BY_TYPE[T_LOAD_R] = SLOTS_BY_TYPE[T_LOAD_A]

# P3 = (X3, Y3, Z3, T3) slots
P3_SLOTS = (5, 6, 8, 7)


@dataclass
class SigInfo:
    """Schedule entry: one signature instance (or a dummy filler)."""

    inst: int
    real: bool = True


class Ed25519Air(Air):
    pre_offsets = (0,)
    row_offsets = (0, 1)
    max_constraint_degree = 6
    width = WIDTH
    pre_width = PRE_WIDTH

    def __init__(self, schedule: List[SigInfo], n_rows: int,
                 nbits_a: int = 512, nbits_b: int = 256):
        assert nbits_a % 16 == 0 and nbits_b % 16 == 0
        self.schedule = schedule
        self.n_rows = n_rows
        self.nbits_a = nbits_a
        self.nbits_b = nbits_b
        self.seg = 4 + 2 * nbits_a + nbits_b
        assert len(schedule) * self.seg <= n_rows
        # affine B powers [2^i]B as (x, y, t) limb arrays
        self.b_powers = []
        pt = ed.BASE
        for _ in range(nbits_b):
            x, y, z, _t = pt
            zi = pow(z, P25519 - 2, P25519)
            xa, ya = x * zi % P25519, y * zi % P25519
            self.b_powers.append((xa, ya, xa * ya % P25519))
            pt = ed.point_add(pt, pt)

    # -- segment row helpers ----------------------------------------------
    def row_type(self, r: int) -> Optional[int]:
        """Row index within a segment -> row type."""
        na, nb = self.nbits_a, self.nbits_b
        if r == 0:
            return T_LOAD_A
        if r == 1:
            return T_LOAD_R
        if r < 2 + 2 * na:
            return T_CADD_A if (r - 2) % 2 == 0 else T_DBL
        if r == 2 + 2 * na:
            return T_ADDR
        if r < 3 + 2 * na + nb:
            return T_CADD_B
        if r == 3 + 2 * na + nb:
            return T_FINAL
        return None

    def preprocessed_columns(self, n: int) -> np.ndarray:
        assert n == self.n_rows
        pre = np.zeros((n, PRE_WIDTH), dtype=np.uint64)
        na, nb = self.nbits_a, self.nbits_b
        addr_r = 2 + 2 * na
        for si, sig in enumerate(self.schedule):
            base = si * self.seg
            for r in range(self.seg):
                row = base + r
                t = self.row_type(r)
                if t is None or not sig.real:
                    continue
                pre[row, t] = 1
                pre[row, P_REAL] = 1
                pre[row, P_INST] = sig.inst
                if t == T_LOAD_A:
                    pre[row, P_WHICH] = WHICH_A
                elif t == T_LOAD_R:
                    pre[row, P_WHICH] = WHICH_R
                if t == T_CADD_A:
                    i = (r - 2) // 2
                    pre[row, P_WEIGHT] = 1 << (i % 16)
                    if i == 0:
                        pre[row, P_PKZERO] = 1
                elif t == T_DBL:
                    i = (r - 3) // 2
                    if i % 16 == 15:  # group-end: check + receive k512 limb
                        pre[row, P_GEND] = 1
                        pre[row, P_GIDX] = i // 16
                        pre[row, P_WHICH] = WHICH_K
                elif t == T_CADD_B:
                    i = r - (addr_r + 1)
                    pre[row, P_WEIGHT] = 1 << (i % 16)
                    if i == 0:
                        pre[row, P_PKZERO] = 1
                    if i % 16 == 0 and i > 0:  # check previous group
                        pre[row, P_GEND] = 1
                        pre[row, P_GIDX] = i // 16 - 1
                        pre[row, P_WHICH] = WHICH_S
                    bx, by, bt = self.b_powers[i]
                    pre[row, P_BT:P_BT + 16] = to_limbs(bx)
                    pre[row, P_BT + 16:P_BT + 32] = to_limbs(by)
                    pre[row, P_BT + 32:P_BT + 48] = to_limbs(bt)
                elif t == T_FINAL:
                    pre[row, P_GEND] = 1
                    pre[row, P_GIDX] = nb // 16 - 1
                    pre[row, P_WHICH] = WHICH_S
        return pre

    # -- constraint construction ------------------------------------------

    def _limbs(self, b: AirBuilder, src, nxt=False) -> List[Elem]:
        kind, arg = src
        if kind == "reg":
            f = b.next if nxt else b.local
            return [f(arg + i) for i in range(16)]
        if kind == "c":
            return [b.local(slot_col(arg, C_OFF) + i) for i in range(16)]
        if kind == "bt":
            return [b.pre_local(P_BT + 16 * arg + i) for i in range(16)]
        raise ValueError(kind)

    def _operand(self, b: AirBuilder, spec) -> List[Elem]:
        terms, const = spec
        n = 17 if const is not None and len(const) > 16 else 16
        out: List[Elem] = [b.const(0)] * n
        for coeff, src in terms:
            limbs = self._limbs(b, src)
            for i in range(16):
                out[i] = out[i] + coeff * limbs[i]
        if const is not None:
            for i, cv in enumerate(const):
                out[i] = out[i] + int(cv)
        return out

    def _carry(self, b: AirBuilder, s: int, j: int) -> Elem:
        klo = b.local(slot_col(s, KLO_OFF) + j)
        khi = b.local(slot_col(s, KHI_OFF) + j)
        return klo + BETA * khi - OFFSET

    def _conv_identity(self, b: AirBuilder, gate: Elem, s: int,
                       a: List[Elem], v: List[Elem]):
        """gate * (a*v - c - q*p - (x - beta) k)_j = 0 for all coefficients."""
        la, lv = len(a), len(v)
        c = [b.local(slot_col(s, C_OFF) + i) for i in range(16)]
        q = [b.local(slot_col(s, Q_OFF) + i) for i in range(17)]
        n_coeff = max(la + lv - 1, 17 + 16)  # uv vs q*p conv length
        for j in range(n_coeff):
            w = b.const(0)
            for i in range(max(0, j - lv + 1), min(la, j + 1)):
                w = w + a[i] * v[j - i]
            if j < 16:
                w = w - c[j]
            for i in range(max(0, j - 15), min(17, j + 1)):
                if PL[j - i]:
                    w = w - PL[j - i] * q[i]
            # (x - beta) * k: coefficient j = k_{j-1} - beta * k_j
            if j > 0:
                w = w - self._carry(b, s, j - 1)
            if j < n_coeff - 1:
                w = w + BETA * self._carry(b, s, j)
            b.assert_zero(gate * w)

    def _linzero(self, b: AirBuilder, gate: Elem, lhs: List[Elem],
                 m: Optional[Elem], carry_slot: int):
        """gate * (lhs - m*p - (x-beta)k)_j = 0 — value of lhs ≡ 0 mod p
        (m omitted: exact zero)."""
        n_coeff = len(lhs)
        for j in range(n_coeff):
            w = lhs[j]
            if m is not None and PL[j]:
                w = w - PL[j] * m
            if j > 0:
                w = w - self._carry(b, carry_slot, j - 1)
            if j < n_coeff - 1:
                w = w + BETA * self._carry(b, carry_slot, j)
            b.assert_zero(gate * w)

    def eval(self, b: AirBuilder):
        gates = {t: b.pre_local(t) for t in range(7)}
        real = b.pre_local(P_REAL)
        gend = b.pre_local(P_GEND)
        add_types = (T_DBL, T_CADD_A, T_CADD_B, T_ADDR)

        # conv identities per row type
        for t, slots in SLOTS_BY_TYPE.items():
            if t == T_LOAD_R:
                continue  # shares the LOAD_A dataflow via combined gate
            gate = gates[t]
            if t == T_LOAD_A:
                gate = gates[T_LOAD_A] + gates[T_LOAD_R]
            for s, (a_spec, v_spec) in slots.items():
                a = self._operand(b, a_spec)
                v = self._operand(b, v_spec)
                self._conv_identity(b, gate, s, a, v)

        load_gate = gates[T_LOAD_A] + gates[T_LOAD_R]
        xl = [b.local(slot_col(6, C_OFF) + i) for i in range(16)]
        yl = [b.local(slot_col(7, C_OFF) + i) for i in range(16)]

        # curve: y^2 - x^2 - 1 - d x^2 y^2 ≡ 0 (mod p); carries in slot 4
        c0 = [b.local(slot_col(0, C_OFF) + i) for i in range(16)]
        c1 = [b.local(slot_col(1, C_OFF) + i) for i in range(16)]
        c3 = [b.local(slot_col(3, C_OFF) + i) for i in range(16)]
        lhs = [c0[i] - c1[i] - c3[i] - (1 if i == 0 else 0) for i in range(16)]
        self._linzero(b, load_gate, lhs, b.local(COL_M1), 4)

        # canonicity x < p: x + z = p - 1 with z = slot8.c; carries slot 8
        z8 = [b.local(slot_col(8, C_OFF) + i) for i in range(16)]
        self._linzero(
            b, load_gate, [xl[i] + z8[i] - PM1L[i] for i in range(16)], None, 8
        )
        # canonicity y < p: z2 = slot6.q[0:16]; carries slot 6
        z6 = [b.local(slot_col(6, Q_OFF) + i) for i in range(16)]
        self._linzero(
            b, load_gate, [yl[i] + z6[i] - PM1L[i] for i in range(16)], None, 6
        )
        # parity: x_0 = 2*h + sign
        b.assert_zero(load_gate * (xl[0] - 2 * b.local(COL_H15) - b.local(COL_SGN)))
        sgn = b.local(COL_SGN)
        b.assert_zero(load_gate * sgn * (sgn - 1))

        # FINAL: projective equality, carries slots 4 (x) and 5 (y)
        fc = {s: [b.local(slot_col(s, C_OFF) + i) for i in range(16)] for s in range(4)}
        self._linzero(b, gates[T_FINAL],
                      [fc[0][i] - fc[1][i] for i in range(16)], b.local(COL_M1), 4)
        self._linzero(b, gates[T_FINAL],
                      [fc[2][i] - fc[3][i] for i in range(16)], b.local(COL_M2), 5)

        # -- register updates (next row) ----------------------------------
        def reg_limbs(base, coord, nxt=False):
            return self._limbs(b, ("reg", base + 16 * coord), nxt=nxt)

        def bind(gate, base, coord, expr_limbs):
            cur = reg_limbs(base, coord, nxt=True)
            for i in range(16):
                b.assert_zero(gate * (cur[i] - expr_limbs[i]))

        def passthrough(gate, base):
            for coord in range(4):
                bind(gate, base, coord,
                     reg_limbs(base, coord))

        const_limbs = lambda limbs: [b.const(int(v)) for v in limbs]
        neutral = [const_limbs(ZEROL), const_limbs(ONEL), const_limbs(ONEL),
                   const_limbs(ZEROL)]
        p3 = [
            [b.local(slot_col(s, C_OFF) + i) for i in range(16)]
            for s in P3_SLOTS
        ]

        # LOAD_A: D <- (x, y, 1, t), ACC <- neutral
        t5 = [b.local(slot_col(5, C_OFF) + i) for i in range(16)]
        for coord, limbs in zip(range(4), [xl, yl, const_limbs(ONEL), t5]):
            bind(gates[T_LOAD_A], REG_D, coord, limbs)
        for coord in range(4):
            bind(gates[T_LOAD_A], REG_ACC, coord, neutral[coord])
        # LOAD_R: REG <- (x, y, 1, t); D, ACC pass
        for coord, limbs in zip(range(4), [xl, yl, const_limbs(ONEL), t5]):
            bind(gates[T_LOAD_R], REG_REG, coord, limbs)
        passthrough(gates[T_LOAD_R], REG_D)
        passthrough(gates[T_LOAD_R], REG_ACC)
        # DBL: D <- P3; ACC, REG pass
        for coord in range(4):
            bind(gates[T_DBL], REG_D, coord, p3[coord])
        passthrough(gates[T_DBL], REG_ACC)
        passthrough(gates[T_DBL], REG_REG)
        # CADD: ACC <- bit ? P3 : ACC ; D, REG pass
        cadd = gates[T_CADD_A] + gates[T_CADD_B]
        bit = b.local(COL_BIT)
        b.assert_zero(cadd * bit * (bit - 1))
        for coord in range(4):
            acc = reg_limbs(REG_ACC, coord)
            nxt = reg_limbs(REG_ACC, coord, nxt=True)
            for i in range(16):
                b.assert_zero(
                    cadd * (nxt[i] - (bit * (p3[coord][i] - acc[i]) + acc[i]))
                )
        passthrough(cadd, REG_D)
        passthrough(cadd, REG_REG)
        # ADDR: REG <- P3, ACC <- neutral
        for coord in range(4):
            bind(gates[T_ADDR], REG_REG, coord, p3[coord])
            bind(gates[T_ADDR], REG_ACC, coord, neutral[coord])

        # -- scalar packing ------------------------------------------------
        pk = b.local(COL_PK)
        pk_next = b.next(COL_PK)
        w = b.pre_local(P_WEIGHT)  # zero on DBL rows
        upd_gate = gates[T_DBL] + cadd
        b.assert_zero(upd_gate * (pk_next - (1 - gend) * pk - w * bit))
        b.assert_zero(gend * (pk - b.local(COL_SC)))
        b.assert_zero(b.pre_local(P_PKZERO) * pk)

        # -- bus -----------------------------------------------------------
        inst = b.pre_local(P_INST)
        which = b.pre_local(P_WHICH)
        for j in range(16):
            b.receive(ch.ED_POINT, [inst, which, b.const(j), yl[j]], load_gate)
        b.receive(ch.ED_POINT, [inst, which, b.const(16), sgn], load_gate)
        b.receive(ch.ED_SCALAR,
                  [inst, which, b.pre_local(P_GIDX), b.local(COL_SC)], gend)
        # range checks
        for s in range(N_SLOTS):
            for i in range(16):
                b.send(ch.RANGE16, [b.local(slot_col(s, C_OFF) + i)], real)
            for i in range(17):
                b.send(ch.RANGE16, [b.local(slot_col(s, Q_OFF) + i)], real)
            for i in range(33):
                b.send(ch.RANGE16, [b.local(slot_col(s, KLO_OFF) + i)], real)
                b.send(ch.RANGE8, [b.local(slot_col(s, KHI_OFF) + i)], real)
        h15 = b.local(COL_H15)
        b.send(ch.RANGE16, [h15], load_gate)
        b.send(ch.RANGE16, [2 * h15], load_gate)
        b.send(ch.RANGE8, [b.local(COL_M1) + 8], load_gate + gates[T_FINAL])
        b.send(ch.RANGE8, [b.local(COL_M2) + 8], gates[T_FINAL])


# ---------------------------------------------------------------------------
# witness generation
# ---------------------------------------------------------------------------

def _operand_value(spec, regs, slot_c, bt) -> List[int]:
    terms, const = spec
    n = 17 if const is not None and len(const) > 16 else 16
    out = [0] * n
    for coeff, (kind, arg) in terms:
        if kind == "reg":
            limbs = regs[arg // 64][(arg % 64) // 16]
        elif kind == "c":
            limbs = slot_c[arg]
        else:
            limbs = bt[arg]
        for i in range(16):
            out[i] += coeff * limbs[i]
    if const is not None:
        for i, cv in enumerate(const):
            out[i] += int(cv)
    return out


def _limb_val(limbs: Sequence[int]) -> int:
    return sum(int(v) << (16 * i) for i, v in enumerate(limbs))


def _conv_witness(a: List[int], v: List[int]) -> Tuple[List[int], List[int], List[int]]:
    """(c, q, k) limb/coefficient arrays for the conv identity."""
    av = _limb_val(a) * _limb_val(v)
    cval = av % P25519
    qval = (av - cval) // P25519
    c = to_limbs(cval)
    q = to_limbs(qval, 17)
    la, lv = len(a), len(v)
    n_coeff = max(la + lv - 1, 33)
    w = [0] * n_coeff
    for i in range(la):
        if a[i]:
            for j in range(lv):
                w[i + j] += a[i] * v[j]
    for j in range(16):
        w[j] -= c[j]
    for i in range(17):
        if q[i]:
            for j in range(16):
                w[i + j] -= q[i] * PL[j]
    k = [0] * (n_coeff - 1)
    prev = 0
    for j in range(n_coeff - 1):
        num = prev - w[j]
        assert num % BETA == 0, "conv identity violated"
        k[j] = num // BETA
        prev = k[j]
    assert prev == w[n_coeff - 1], "conv identity tail violated"
    return c, q, k


def _linzero_witness(lhs: List[int], m: int) -> List[int]:
    w = [lhs[j] - m * PL[j] for j in range(16)]
    k = [0] * 15
    prev = 0
    for j in range(15):
        num = prev - w[j]
        assert num % BETA == 0
        k[j] = num // BETA
        prev = k[j]
    assert prev == w[15], "linzero tail violated"
    return k


def _write_carries(row: np.ndarray, s: int, k: List[int]):
    for j, kv in enumerate(k):
        off = kv + OFFSET
        assert 0 <= off < (1 << 24), f"carry out of range: {kv}"
        row[slot_col(s, KLO_OFF) + j] = off & 0xFFFF
        row[slot_col(s, KHI_OFF) + j] = off >> 16


def _write_conv(row: np.ndarray, s: int, a, v):
    c, q, k = _conv_witness(a, v)
    for i in range(16):
        row[slot_col(s, C_OFF) + i] = c[i]
    for i in range(17):
        row[slot_col(s, Q_OFF) + i] = q[i]
    _write_carries(row, s, k)
    return c


@dataclass
class SigWitness:
    """Native inputs for one proved signature."""

    pubkey: bytes
    msg: bytes
    signature: bytes

    def k512(self) -> int:
        import hashlib

        h = hashlib.sha512(self.signature[:32] + self.pubkey + self.msg).digest()
        return int.from_bytes(h, "little")

    def s_int(self) -> int:
        return int.from_bytes(self.signature[32:], "little")


def build_trace(air: Ed25519Air, sigs: List[SigWitness]) -> np.ndarray:
    trace = np.zeros((air.n_rows, WIDTH), dtype=np.uint64)
    na, nb = air.nbits_a, air.nbits_b
    addr_r = 2 + 2 * na
    sig_i = 0
    for si, entry in enumerate(air.schedule):
        if not entry.real:
            continue
        sig = sigs[sig_i]
        sig_i += 1
        base = si * air.seg
        A = ed.decompress(sig.pubkey)
        R = ed.decompress(sig.signature[:32])
        assert A is not None and R is not None, "non-canonical point"
        k512 = sig.k512() % (1 << na)
        s_scalar = sig.s_int() % (1 << nb)

        # register state entering each row (limb arrays [D, ACC, REG][coord])
        def pt_limbs(p):
            x, y, z, t = p
            return [to_limbs(x), to_limbs(y), to_limbs(z), to_limbs(t)]

        zero_pt = [to_limbs(0)] * 4
        neutral_pt = pt_limbs(ed.IDENTITY)
        regs = [zero_pt, zero_pt, zero_pt]  # D, ACC, REG at row 0

        pk_acc = 0
        for r in range(air.seg):
            row = trace[base + r]
            t = air.row_type(r)
            if t is None:
                continue
            for ri in range(3):
                for coord in range(4):
                    for i in range(16):
                        row[REG_D + 64 * ri + 16 * coord + i] = regs[ri][coord][i]
            row[COL_PK] = pk_acc

            bt = None
            if t == T_CADD_B:
                i_bit = r - (addr_r + 1)
                bx, by, btv = air.b_powers[i_bit]
                bt = [to_limbs(bx), to_limbs(by), to_limbs(btv)]

            slot_c: Dict[int, List[int]] = {}
            if t in (T_LOAD_A, T_LOAD_R):
                pt = A if t == T_LOAD_A else R
                xv, yv = pt[0], pt[1]
                comp = sig.pubkey if t == T_LOAD_A else sig.signature[:32]
                sign = comp[31] >> 7
                xlimbs, ylimbs = to_limbs(xv), to_limbs(yv)
                slot_c[6] = xlimbs
                slot_c[7] = ylimbs
                for i in range(16):
                    row[slot_col(6, C_OFF) + i] = xlimbs[i]
                    row[slot_col(7, C_OFF) + i] = ylimbs[i]
                for s in (0, 1, 2, 3, 5):
                    a_spec, v_spec = SLOTS_BY_TYPE[T_LOAD_A][s]
                    a = _operand_value(a_spec, regs, slot_c, bt)
                    v = _operand_value(v_spec, regs, slot_c, bt)
                    slot_c[s] = _write_conv(row, s, a, v)
                # curve identity carries (slot 4) + m
                u, v2, dw = (_limb_val(slot_c[0]), _limb_val(slot_c[1]),
                             _limb_val(slot_c[3]))
                m = (u - v2 - 1 - dw) // P25519
                row[COL_M1] = m % gl_p()
                lhs = [slot_c[0][i] - slot_c[1][i] - slot_c[3][i]
                       - (1 if i == 0 else 0) for i in range(16)]
                _write_carries(row, 4, _linzero_witness(lhs, m))
                # x < p (slot 8), y < p (slot 6 q)
                z8 = to_limbs(P25519 - 1 - xv)
                for i in range(16):
                    row[slot_col(8, C_OFF) + i] = z8[i]
                _write_carries(row, 8, _linzero_witness(
                    [xlimbs[i] + z8[i] - PM1L[i] for i in range(16)], 0))
                z6 = to_limbs(P25519 - 1 - yv)
                for i in range(16):
                    row[slot_col(6, Q_OFF) + i] = z6[i]
                _write_carries(row, 6, _linzero_witness(
                    [ylimbs[i] + z6[i] - PM1L[i] for i in range(16)], 0))
                row[COL_SGN] = sign
                row[COL_H15] = (xlimbs[0] - sign) // 2
                nregs = [list(rr) for rr in regs]
                tl = slot_c[5]
                if t == T_LOAD_A:
                    nregs[0] = [xlimbs, ylimbs, to_limbs(1), tl]
                    nregs[1] = neutral_pt
                else:
                    nregs[2] = [xlimbs, ylimbs, to_limbs(1), tl]
                regs = nregs
            elif t in (T_DBL, T_CADD_A, T_CADD_B, T_ADDR):
                for s in range(9):
                    a_spec, v_spec = SLOTS_BY_TYPE[t][s]
                    a = _operand_value(a_spec, regs, slot_c, bt)
                    v = _operand_value(v_spec, regs, slot_c, bt)
                    slot_c[s] = _write_conv(row, s, a, v)
                p3 = [slot_c[s] for s in P3_SLOTS]
                nregs = [list(rr) for rr in regs]
                if t == T_DBL:
                    nregs[0] = p3
                    i_bit = (r - 3) // 2
                    if i_bit % 16 == 15:
                        limb = (k512 >> (16 * (i_bit // 16))) & 0xFFFF
                        row[COL_SC] = limb
                        assert pk_acc == limb
                        pk_acc = 0
                elif t in (T_CADD_A, T_CADD_B):
                    if t == T_CADD_A:
                        i_bit = (r - 2) // 2
                        bitv = (k512 >> i_bit) & 1
                    else:
                        i_bit = r - (addr_r + 1)
                        bitv = (s_scalar >> i_bit) & 1
                        if i_bit % 16 == 0 and i_bit > 0:
                            limb = (s_scalar >> (16 * (i_bit // 16 - 1))) & 0xFFFF
                            row[COL_SC] = limb
                            assert pk_acc == limb
                            pk_acc = 0
                    row[COL_BIT] = bitv
                    if bitv:
                        nregs[1] = p3
                    pk_acc += bitv << (i_bit % 16)
                else:  # ADDR
                    nregs[2] = p3
                    nregs[1] = neutral_pt
                regs = nregs
            elif t == T_FINAL:
                limb = (s_scalar >> (16 * (nb // 16 - 1))) & 0xFFFF
                row[COL_SC] = limb
                assert pk_acc == limb
                pk_acc = 0
                for s in range(4):
                    a_spec, v_spec = SLOTS_BY_TYPE[T_FINAL][s]
                    a = _operand_value(a_spec, regs, slot_c, bt)
                    v = _operand_value(v_spec, regs, slot_c, bt)
                    slot_c[s] = _write_conv(row, s, a, v)
                dx = _limb_val(slot_c[0]) - _limb_val(slot_c[1])
                dy = _limb_val(slot_c[2]) - _limb_val(slot_c[3])
                assert dx % P25519 == 0 and dy % P25519 == 0, "sig invalid"
                m1, m2 = dx // P25519, dy // P25519
                row[COL_M1] = m1 % gl_p()
                row[COL_M2] = m2 % gl_p()
                _write_carries(row, 4, _linzero_witness(
                    [slot_c[0][i] - slot_c[1][i] for i in range(16)], m1))
                _write_carries(row, 5, _linzero_witness(
                    [slot_c[2][i] - slot_c[3][i] for i in range(16)], m2))
    return trace


def gl_p() -> int:
    from ..field import goldilocks as gl

    return gl.P


def range_counts(air: Ed25519Air, trace: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(range16_counts, range8_counts) matching the chip's send mults."""
    r16 = np.zeros(1 << 16, dtype=np.uint64)
    r8 = np.zeros(256, dtype=np.uint64)
    pre = air.preprocessed_columns(air.n_rows)
    for row in range(air.n_rows):
        if not pre[row, P_REAL]:
            continue
        tr = trace[row]
        for s in range(N_SLOTS):
            for i in range(16):
                r16[int(tr[slot_col(s, C_OFF) + i])] += 1
            for i in range(17):
                r16[int(tr[slot_col(s, Q_OFF) + i])] += 1
            for i in range(33):
                r16[int(tr[slot_col(s, KLO_OFF) + i])] += 1
                r8[int(tr[slot_col(s, KHI_OFF) + i])] += 1
        is_load = pre[row, T_LOAD_A] or pre[row, T_LOAD_R]
        is_final = pre[row, T_FINAL]
        if is_load:
            h = int(tr[COL_H15])
            r16[h] += 1
            r16[2 * h] += 1
        if is_load or is_final:
            r8[(int(tr[COL_M1]) + 8) % gl_p() % 256] += 1
        if is_final:
            r8[(int(tr[COL_M2]) + 8) % gl_p() % 256] += 1
    return r16, r8


def public_messages_for(air: Ed25519Air, sigs: List[SigWitness]):
    """Bus messages a stand-alone verifier contributes (the CPU's role)."""
    pubs = []
    real = [e for e in air.schedule if e.real]
    for entry, sig in zip(real, sigs):
        inst = entry.inst
        for which, comp in ((WHICH_A, sig.pubkey), (WHICH_R, sig.signature[:32])):
            y = int.from_bytes(comp, "little") & ((1 << 255) - 1)
            for j in range(16):
                pubs.append((ch.ED_POINT, [inst, which, j, (y >> (16 * j)) & 0xFFFF], +1))
            pubs.append((ch.ED_POINT, [inst, which, 16, comp[31] >> 7], +1))
        k512 = sig.k512() % (1 << air.nbits_a)
        for g in range(air.nbits_a // 16):
            pubs.append((ch.ED_SCALAR, [inst, WHICH_K, g, (k512 >> (16 * g)) & 0xFFFF], +1))
        s_val = sig.s_int() % (1 << air.nbits_b)
        for g in range(air.nbits_b // 16):
            pubs.append((ch.ED_SCALAR, [inst, WHICH_S, g, (s_val >> (16 * g)) & 0xFFFF], +1))
    return pubs
