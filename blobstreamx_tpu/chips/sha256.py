"""SHA-256 compression AIR ("chip").

The TPU-native equivalent of the reference's Curta SHA-256 STARK
accelerator (SURVEY.md D10; reference plonky2x ``builder.sha256`` /
starkyx). One 68-row segment proves one compression:

  row r=0..3   loading: (A,E) hold (d_in,h_in),(c_in,g_in),(b_in,f_in),(a_in,e_in)
  row r=3+t    working state (a,e) entering round t, t = 0..64
  row r=64     digest: out_j = si_j + final_state_j (mod 2^32)

Working values b,c,d / f,g,h are *not* stored: they equal a/e at earlier
rows, read through the row-offset window. The message schedule lives in
the same rows (w for round t at row t+3) with its recurrence checked at
offsets +1/+9/+14/+16. Round constants and all segment-position selectors
are preprocessed columns (built once per trace height — the analogue of
the reference's circuit build step).

Column layout (width 123):
  0..31   a bits      32..63  e bits      64..95  w bits
  96 carry_a  97 carry_e  98 carry_w
  99..106 si (chaining input words, copied through the segment)
  107..114 out (digest words, defined at r=64)
  115..122 co (digest carry bools)
"""

from __future__ import annotations

import numpy as np

from ..field import goldilocks as gl
from ..ops import sha256 as sha
from ..proof.air import Air, AirBuilder, Elem

SEGMENT = 68
ROUNDS = 64

COL_A = 0
COL_E = 32
COL_W = 64
COL_CA = 96
COL_CE = 97
COL_CW = 98
COL_SI = 99
COL_OUT = 107
COL_CO = 115
WIDTH = 123

# preprocessed column indices
P_K = 0
P_SR = 1  # round anchor selector (r in 0..63)
P_SW = 2  # schedule anchor selector (r in 3..50)
P_OUT = 3  # digest row selector (r == 64)
P_L0, P_L1, P_L2, P_L3 = 4, 5, 6, 7
P_SICOPY = 8
PRE_WIDTH = 9


def _xor2(x: Elem, y: Elem) -> Elem:
    return x + y - 2 * (x * y)


def _xor3(x: Elem, y: Elem, z: Elem) -> Elem:
    xy = x * y
    return x + y + z - 2 * (xy + y * z + x * z) + 4 * (xy * z)


class Sha256Air(Air):
    width = WIDTH
    pre_width = PRE_WIDTH
    row_offsets = (0, 1, 2, 3, 4, 9, 14, 16)
    pre_offsets = (0,)
    max_constraint_degree = 8

    def preprocessed_columns(self, n: int) -> np.ndarray:
        pre = np.zeros((n, PRE_WIDTH), dtype=np.uint64)
        n_seg = n // SEGMENT
        for s in range(n_seg):
            base = s * SEGMENT
            for r in range(SEGMENT):
                row = base + r
                if r < ROUNDS:
                    pre[row, P_K] = int(sha.K[r])
                    pre[row, P_SR] = 1
                if 3 <= r <= 50:
                    pre[row, P_SW] = 1
                if r == 64:
                    pre[row, P_OUT] = 1
                if r < 4:
                    pre[row, P_L0 + r] = 1
                if r <= 66:
                    pre[row, P_SICOPY] = 1
        return pre

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _word(b: AirBuilder, off: int, col_base: int) -> Elem:
        acc = None
        for i in range(32):
            term = (1 << i) * b.row(off, col_base + i)
            acc = term if acc is None else acc + term
        return acc

    @staticmethod
    def _sigma_big(b, off, col_base, r1, r2, r3) -> Elem:
        """Sum_i 2^i (bit[(i+r1)%32] ^ bit[(i+r2)%32] ^ bit[(i+r3)%32])."""
        acc = None
        for i in range(32):
            x = b.row(off, col_base + (i + r1) % 32)
            y = b.row(off, col_base + (i + r2) % 32)
            z = b.row(off, col_base + (i + r3) % 32)
            term = (1 << i) * _xor3(x, y, z)
            acc = term if acc is None else acc + term
        return acc

    @staticmethod
    def _sigma_small(b, off, r1, r2, shift) -> Elem:
        """rotr r1 ^ rotr r2 ^ shr shift over the w word at offset `off`."""
        acc = None
        for i in range(32):
            x = b.row(off, COL_W + (i + r1) % 32)
            y = b.row(off, COL_W + (i + r2) % 32)
            if i + shift < 32:
                z = b.row(off, COL_W + i + shift)
                bit = _xor3(x, y, z)
            else:
                bit = _xor2(x, y)
            term = (1 << i) * bit
            acc = term if acc is None else acc + term
        return acc

    @staticmethod
    def _range_check(b, e: Elem, hi: int, scope=None):
        acc = e
        for j in range(1, hi + 1):
            acc = acc * (e - j)
        b.assert_zero(acc)

    # -- constraints --------------------------------------------------------

    def eval(self, b: AirBuilder):
        # bit columns boolean
        for c in range(COL_A, COL_W + 32):
            b.assert_bool(b.local(c))
        for j in range(8):
            b.assert_bool(b.local(COL_CO + j))
        # carry ranges (witness zeros outside anchors keep these in range)
        self._range_check(b, b.local(COL_CA), 7)
        self._range_check(b, b.local(COL_CE), 7)
        self._range_check(b, b.local(COL_CW), 3)

        sr = b.pre_local(P_SR)
        sw = b.pre_local(P_SW)
        out_sel = b.pre_local(P_OUT)
        si_copy = b.pre_local(P_SICOPY)
        k_const = b.pre_local(P_K)

        # loading rows bind (A, E) to the chaining input copies
        for j in range(4):
            lj = b.pre_local(P_L0 + j)
            a_val = self._word(b, 0, COL_A)
            e_val = self._word(b, 0, COL_E)
            b.assert_zero(lj * (a_val - b.local(COL_SI + 3 - j)))
            b.assert_zero(lj * (e_val - b.local(COL_SI + 7 - j)))

        # si copies within the segment
        for j in range(8):
            b.assert_zero(si_copy * (b.next(COL_SI + j) - b.local(COL_SI + j)))

        # round function, anchored at v (round t = r(v)):
        #   rows v..v+3 hold (d,h),(c,g),(b,f),(a,e); v+4 gets the new (a,e)
        s1 = self._sigma_big(b, 3, COL_E, 6, 11, 25)
        ch = None
        for i in range(32):
            e_i = b.row(3, COL_E + i)
            f_i = b.row(2, COL_E + i)
            g_i = b.row(1, COL_E + i)
            term = (1 << i) * (e_i * f_i + g_i - e_i * g_i)
            ch = term if ch is None else ch + term
        w_t = self._word(b, 3, COL_W)
        h_val = self._word(b, 0, COL_E)
        d_val = self._word(b, 0, COL_A)
        t1 = h_val + s1 + ch + k_const + w_t
        e_new = self._word(b, 4, COL_E)
        b.assert_zero(sr * (e_new + (1 << 32) * b.local(COL_CE) - (d_val + t1)))

        s0 = self._sigma_big(b, 3, COL_A, 2, 13, 22)
        maj = None
        for i in range(32):
            a_i = b.row(3, COL_A + i)
            b_i = b.row(2, COL_A + i)
            c_i = b.row(1, COL_A + i)
            ab = a_i * b_i
            term = (1 << i) * (ab + a_i * c_i + b_i * c_i - 2 * (ab * c_i))
            maj = term if maj is None else maj + term
        a_new = self._word(b, 4, COL_A)
        b.assert_zero(sr * (a_new + (1 << 32) * b.local(COL_CA) - (t1 + s0 + maj)))

        # message schedule, anchored at v' (w_t at row t+3):
        #   w(v'+16) = w(v') + sigma0(w(v'+1)) + w(v'+9) + sigma1(w(v'+14))
        w0 = self._word(b, 0, COL_W)
        sig0 = self._sigma_small(b, 1, 7, 18, 3)
        w9 = self._word(b, 9, COL_W)
        sig1 = self._sigma_small(b, 14, 17, 19, 10)
        w16 = self._word(b, 16, COL_W)
        b.assert_zero(
            sw * (w16 + (1 << 32) * b.local(COL_CW) - (w0 + sig0 + w9 + sig1))
        )

        # digest at r=64: out_j = si_j + final_state_j
        for j in range(4):
            fin = self._word(b, 3 - j, COL_A)
            b.assert_zero(
                out_sel
                * (
                    b.local(COL_OUT + j)
                    + (1 << 32) * b.local(COL_CO + j)
                    - (b.local(COL_SI + j) + fin)
                )
            )
            fin_e = self._word(b, 3 - j, COL_E)
            b.assert_zero(
                out_sel
                * (
                    b.local(COL_OUT + 4 + j)
                    + (1 << 32) * b.local(COL_CO + 4 + j)
                    - (b.local(COL_SI + 4 + j) + fin_e)
                )
            )


# ---------------------------------------------------------------------------
# witness generation
# ---------------------------------------------------------------------------

def num_segments(n_rows: int) -> int:
    return n_rows // SEGMENT


def build_trace(instances, n_rows: int) -> np.ndarray:
    """instances: list of (state_in uint32[8], block uint32[16]).

    Pads with dummy compressions (H0 state, zero block) to fill every
    segment; tail rows beyond the last segment stay zero (all selectors
    are zero there).
    """
    n_seg = num_segments(n_rows)
    assert len(instances) <= n_seg, "trace too small for instance count"
    inst = list(instances) + [
        (sha.H0.copy(), np.zeros(16, dtype=np.uint32))
        for _ in range(n_seg - len(instances))
    ]
    B = len(inst)
    state_in = np.stack([np.asarray(si, dtype=np.uint32) for si, _ in inst])
    blocks = np.stack([np.asarray(blk, dtype=np.uint32) for _, blk in inst])
    state_out, tr = sha.compress_blocks(blocks, state_in, trace=True)
    states = tr["state"].astype(np.uint64)  # (B, 65, 8)
    w = tr["w"].astype(np.uint64)  # (B, 64)

    trace = np.zeros((n_rows, WIDTH), dtype=np.uint64)

    # values per segment row
    a_vals = np.zeros((B, SEGMENT), dtype=np.uint64)
    e_vals = np.zeros((B, SEGMENT), dtype=np.uint64)
    w_vals = np.zeros((B, SEGMENT), dtype=np.uint64)
    a_vals[:, 0] = state_in[:, 3]
    a_vals[:, 1] = state_in[:, 2]
    a_vals[:, 2] = state_in[:, 1]
    e_vals[:, 0] = state_in[:, 7]
    e_vals[:, 1] = state_in[:, 6]
    e_vals[:, 2] = state_in[:, 5]
    a_vals[:, 3:] = states[:, :, 0]
    e_vals[:, 3:] = states[:, :, 4]
    w_vals[:, 3:67] = w

    # carries for round anchors v = t (t in 0..63)
    S1 = np.zeros((B, 64), dtype=np.uint64)
    CH = np.zeros((B, 64), dtype=np.uint64)
    S0 = np.zeros((B, 64), dtype=np.uint64)
    MAJ = np.zeros((B, 64), dtype=np.uint64)
    a = states[:, :, 0].astype(np.uint32)
    e = states[:, :, 4].astype(np.uint32)
    for t in range(64):
        et = e[:, t]
        ft = states[:, t, 5].astype(np.uint32)
        gt = states[:, t, 6].astype(np.uint32)
        at = a[:, t]
        bt = states[:, t, 1].astype(np.uint32)
        ct = states[:, t, 2].astype(np.uint32)
        S1[:, t] = (
            ((et >> 6) | (et << 26)) ^ ((et >> 11) | (et << 21)) ^ ((et >> 25) | (et << 7))
        ).astype(np.uint64)
        CH[:, t] = ((et & ft) ^ (~et & gt)).astype(np.uint64)
        S0[:, t] = (
            ((at >> 2) | (at << 30)) ^ ((at >> 13) | (at << 19)) ^ ((at >> 22) | (at << 10))
        ).astype(np.uint64)
        MAJ[:, t] = ((at & bt) ^ (at & ct) ^ (bt & ct)).astype(np.uint64)

    h_arr = states[:, :64, 7]
    d_arr = states[:, :64, 3]
    k_arr = sha.K.astype(np.uint64)[None, :]
    w64 = w
    t1_full = h_arr + S1 + CH + k_arr + w64
    e_new_full = d_arr + t1_full
    carry_e = e_new_full >> 32
    a_new_full = t1_full + S0 + MAJ
    carry_a = a_new_full >> 32
    # sanity vs recorded next state
    assert np.array_equal(e_new_full & 0xFFFFFFFF, states[:, 1:, 4])
    assert np.array_equal(a_new_full & 0xFFFFFFFF, states[:, 1:, 0])

    # schedule carries at anchor rows v' = 3..50 (t' = r - 3 in 0..47)
    carry_w = np.zeros((B, SEGMENT), dtype=np.uint64)
    for r in range(3, 51):
        tm16 = w[:, r - 3]
        tm15 = w[:, r - 2]
        tm7 = w[:, r + 6]
        tm2 = w[:, r + 11]
        x15 = tm15.astype(np.uint32)
        x2 = tm2.astype(np.uint32)
        s0 = (((x15 >> 7) | (x15 << 25)) ^ ((x15 >> 18) | (x15 << 14)) ^ (x15 >> 3)).astype(np.uint64)
        s1 = (((x2 >> 17) | (x2 << 15)) ^ ((x2 >> 19) | (x2 << 13)) ^ (x2 >> 10)).astype(np.uint64)
        full = tm16 + s0 + tm7 + s1
        assert np.array_equal(full & 0xFFFFFFFF, w[:, r + 13])
        carry_w[:, r] = full >> 32

    out = (state_in.astype(np.uint64) + states[:, 64, :])
    co = out >> 32
    out &= 0xFFFFFFFF
    assert np.array_equal(out.astype(np.uint32), state_out)

    # scatter into the trace
    for s in range(B):
        base = s * SEGMENT
        rows = slice(base, base + SEGMENT)
        for i in range(32):
            trace[rows, COL_A + i] = (a_vals[s] >> i) & 1
            trace[rows, COL_E + i] = (e_vals[s] >> i) & 1
            trace[rows, COL_W + i] = (w_vals[s] >> i) & 1
        trace[base:base + 64, COL_CA] = carry_a[s]
        trace[base:base + 64, COL_CE] = carry_e[s]
        trace[rows, COL_CW] = carry_w[s]
        for j in range(8):
            trace[rows, COL_SI + j] = state_in[s, j]
        trace[base + 64, COL_OUT:COL_OUT + 8] = out[s]
        trace[base + 64, COL_CO:COL_CO + 8] = co[s]
    return trace


def digest_rows(trace: np.ndarray, n_instances: int):
    """Extract digest words from the witness (row r=64 per segment)."""
    outs = []
    for s in range(n_instances):
        row = trace[s * SEGMENT + 64]
        outs.append([int(v) for v in row[COL_OUT:COL_OUT + 8]])
    return outs
