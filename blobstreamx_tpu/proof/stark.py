"""Uniform-AIR STARK prover/verifier over Goldilocks with FRI openings.

Capability parity with the reference's prover core (SURVEY.md D6: constraint
system + quotient + opening proof; plonky2's PLONK-with-gates becomes a
columnar AIR here — the TPU-first redesign). Pipeline per table:

  trace columns --iNTT/NTT--> coset LDE --Poseidon--> Merkle cap
  constraints (vectorized over LDE rows) --combine(alpha)--> quotient
  quotient chunks committed; openings at zeta/zeta*g; DEEP composition;
  FRI low-degree proof; query rounds open all oracles at shared indices.

Every heavy step is a batched jnp program (NTT stages, Poseidon trees, the
constraint sweep); transcript and verification replay on host ints.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import ntt as nttmod
from ..field import extension as ext
from . import merkle_cap
from . import fri
from .air import (
    Air,
    AirBuilder,
    BaseLdeBackend,
    ExtPointBackend,
    EVERYWHERE,
    FIRST_ROW,
    LAST_ROW,
    TRANSITION,
)
from .transcript import Transcript


@dataclass
class StarkConfig:
    rate_bits: int = 3
    cap_height: int = 2
    num_query_rounds: int = 28
    pow_bits: int = 8
    final_poly_bits: int = 3

    def fri(self) -> fri.FriConfig:
        return fri.FriConfig(
            rate_bits=self.rate_bits,
            cap_height=self.cap_height,
            num_query_rounds=self.num_query_rounds,
            pow_bits=self.pow_bits,
            final_poly_bits=self.final_poly_bits,
        )


@dataclass
class OpenedRow:
    values: list  # python ints (base field), row of the oracle leaf
    siblings: list  # list of 4-int digests per level


@dataclass
class StarkProof:
    n_rows: int
    main_cap: list
    aux_cap: Optional[list]
    quotient_cap: list
    # out-of-domain openings (extension pairs)
    main_zeta: list
    main_zeta_next: list
    aux_zeta: list
    aux_zeta_next: list
    quotient_zeta: list  # per chunk
    fri_proof: fri.FriProof
    # per FRI query round: opened oracle rows (main, aux?, quotient)
    query_openings: list


# ---------------------------------------------------------------------------
# cached domain tables (host ints; numpy outputs)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _lde_points(log_n: int, rate_bits: int) -> np.ndarray:
    N = 1 << (log_n + rate_bits)
    w = gl.primitive_root_of_unity(log_n + rate_bits)
    pts = np.empty(N, dtype=np.uint64)
    acc = gl.GENERATOR % gl.P
    for i in range(N):
        pts[i] = acc
        acc = (acc * w) % gl.P
    return pts


def _batch_inverse(vals: List[int]) -> List[int]:
    """Montgomery batch inversion over python ints."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = (prefix[i] * v) % gl.P
    inv_all = pow(prefix[n], gl.P - 2, gl.P)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = (prefix[i] * inv_all) % gl.P
        inv_all = (inv_all * vals[i]) % gl.P
    return out


@functools.lru_cache(maxsize=None)
def _selector_tables(log_n: int, rate_bits: int):
    """(zh_inv, sel_first, sel_last, sel_trans) as (N,2) uint32 numpy."""
    n = 1 << log_n
    N = n << rate_bits
    pts = _lde_points(log_n, rate_bits)
    g_n = gl.primitive_root_of_unity(log_n)
    g_last = pow(g_n, n - 1, gl.P)
    n_inv = pow(n, gl.P - 2, gl.P)

    # Z_H(x) = x^n - 1 has only `blowup` distinct values on the coset.
    zh = [(pow(int(pts[i]), n, gl.P) - 1) % gl.P for i in range(1 << rate_bits)]
    zh_inv_small = _batch_inverse(zh)
    zh_inv = np.tile(np.array(zh_inv_small, dtype=np.uint64), n)

    x_min_1 = [(int(x) - 1) % gl.P for x in pts]
    x_min_g = [(int(x) - g_last) % gl.P for x in pts]
    inv1 = _batch_inverse(x_min_1)
    invg = _batch_inverse(x_min_g)
    sf = np.empty(N, dtype=np.uint64)
    sl = np.empty(N, dtype=np.uint64)
    st = np.empty(N, dtype=np.uint64)
    for i in range(N):
        zh_i = (pow(int(pts[i]), n, gl.P) - 1) % gl.P
        sf[i] = zh_i * n_inv % gl.P * inv1[i] % gl.P
        sl[i] = zh_i * n_inv % gl.P * g_last % gl.P * invg[i] % gl.P
        st[i] = x_min_g[i]
    return (
        gl.from_int_np(zh_inv),
        gl.from_int_np(sf),
        gl.from_int_np(sl),
        gl.from_int_np(st),
    )


def _selectors_at_point(z, log_n: int):
    """Selector values at an extension point (host ints)."""
    F2 = ext.GFp2
    n = 1 << log_n
    g_n = gl.primitive_root_of_unity(log_n)
    g_last = pow(g_n, n - 1, gl.P)
    n_inv = pow(n, gl.P - 2, gl.P)
    zn = (1, 0)
    zpow = z
    e = n
    # z^n by square-and-multiply
    base = z
    while e:
        if e & 1:
            zn = F2.mul(zn, base)
        base = F2.mul(base, base)
        e >>= 1
    zh = F2.sub(zn, (1, 0))
    sel_first = F2.mul(F2.mul(zh, (n_inv, 0)), F2.inv(F2.sub(z, (1, 0))))
    sel_last = F2.mul(
        F2.mul(F2.mul(zh, (n_inv, 0)), (g_last, 0)), F2.inv(F2.sub(z, (g_last, 0)))
    )
    sel_trans = F2.sub(z, (g_last, 0))
    return zh, sel_first, sel_last, sel_trans


# ---------------------------------------------------------------------------
# device helpers
# ---------------------------------------------------------------------------

def _commit_matrix(cols: jnp.ndarray, rate_bits: int, cap_height: int):
    """cols: (c, n, 2) subgroup evals -> (coeffs, lde_rows_np, tree)."""
    coeffs = nttmod.ntt(cols, inverse=True)
    n = cols.shape[1]
    N = n << rate_bits
    padded = jnp.pad(coeffs, [(0, 0), (0, N - n), (0, 0)])
    shifted = nttmod.coset_shift(padded, gl.GENERATOR)
    lde = nttmod.ntt(shifted)  # (c, N, 2)
    rows = jnp.moveaxis(lde, 0, 1)  # (N, c, 2)
    tree = merkle_cap.build_tree(rows, cap_height)
    return coeffs, np.asarray(rows), tree


def _ext_powers(z, n: int) -> jnp.ndarray:
    """(n, 2, 2) powers z^0..z^(n-1) by doubling."""
    pows = ext.ones((1,))
    zk = jnp.reshape(z, (1, 2, 2))
    while pows.shape[0] < n:
        shifted = ext.mul(pows, jnp.broadcast_to(zk, pows.shape))
        pows = jnp.concatenate([pows, shifted], axis=0)
        zk = ext.mul(zk, zk)
    return pows[:n]


def _tree_sum_ext(x: jnp.ndarray, axis_len: int) -> jnp.ndarray:
    """Sum over axis -3 (length power of two) via halving adds."""
    k = axis_len
    while k > 1:
        k //= 2
        x = ext.add(x[..., :k, :, :], x[..., k:2 * k, :, :])
    return x[..., 0, :, :]


def _eval_cols_at(coeffs: jnp.ndarray, z_pair) -> List[Tuple[int, int]]:
    """Evaluate base-coeff columns (c, n, 2) at extension point (int pair)."""
    c, n, _ = coeffs.shape
    z = ext.from_int_pair(z_pair[0], z_pair[1])
    pows = _ext_powers(z, n)  # (n, 2, 2)
    terms = ext.scalar_mul(jnp.broadcast_to(pows, (c, n, 2, 2)), coeffs)
    vals = _tree_sum_ext(terms, n)  # (c, 2, 2)
    arr = np.asarray(vals)
    out = []
    for i in range(c):
        out.append((int(gl.to_int(arr[i, 0])), int(gl.to_int(arr[i, 1]))))
    return out


def _ext_const_vec(pair, n: int) -> jnp.ndarray:
    return jnp.broadcast_to(ext.from_int_pair(pair[0], pair[1]), (n, 2, 2))


def _combine_constraints(builder: AirBuilder, alpha, sels, n_points: int):
    """sum_i alpha^i * sel_i * c_i -> (N, 2, 2) extension values."""
    zh_inv, sel_first, sel_last, sel_trans = sels
    acc = ext.zeros((n_points,))
    alpha_vec = _ext_const_vec(alpha, n_points)
    first = True
    for con in builder.constraints:
        c = con.expr  # (N, 2) base
        if con.scope == FIRST_ROW:
            c = gl.mul(c, jnp.asarray(sel_first))
        elif con.scope == LAST_ROW:
            c = gl.mul(c, jnp.asarray(sel_last))
        elif con.scope == TRANSITION:
            c = gl.mul(c, jnp.asarray(sel_trans))
        if first:
            acc = ext.from_base(c)
            first = False
        else:
            acc = ext.add(ext.mul(acc, alpha_vec), ext.from_base(c))
    return acc


def _combine_constraints_at_point(builder: AirBuilder, alpha, sels_pt):
    F2 = ext.GFp2
    _, sel_first, sel_last, sel_trans = sels_pt
    acc = (0, 0)
    first = True
    for con in builder.constraints:
        c = con.expr  # GFp2 pair
        if con.scope == FIRST_ROW:
            c = F2.mul(c, sel_first)
        elif con.scope == LAST_ROW:
            c = F2.mul(c, sel_last)
        elif con.scope == TRANSITION:
            c = F2.mul(c, sel_trans)
        if first:
            acc = c
            first = False
        else:
            acc = F2.add(F2.mul(acc, alpha), c)
    return acc


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------

def _observe_preamble(transcript: Transcript, air: Air, n: int, publics):
    transcript.observe_element(air.width % gl.P)
    transcript.observe_element(n % gl.P)
    transcript.observe_elements([p % gl.P for p in publics])


def _rows_local_next(rows: jnp.ndarray, rate_bits: int):
    """LDE rows (N, c, 2) -> per-column local/next (lists of (N,2))."""
    N = rows.shape[0]
    blowup = 1 << rate_bits
    nxt = jnp.roll(rows, -blowup, axis=0)
    local = [rows[:, i, :] for i in range(rows.shape[1])]
    nxt_cols = [nxt[:, i, :] for i in range(rows.shape[1])]
    return local, nxt_cols


def prove(
    air: Air,
    trace: np.ndarray,
    publics: Sequence[int],
    cfg: StarkConfig = StarkConfig(),
) -> StarkProof:
    """trace: (n, width) uint64 numpy (row-major witness)."""
    n, width = trace.shape
    assert width == air.width
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    N = n << cfg.rate_bits
    blowup = 1 << cfg.rate_bits
    # constraint degree bound: C = sel*c must be faithfully represented by
    # its N LDE samples: deg <= D*(n-1) + 1 <= N - 1
    assert air.max_constraint_degree * (n - 1) + 1 <= N - 1

    transcript = Transcript()
    _observe_preamble(transcript, air, n, publics)

    cols = jnp.moveaxis(gl.from_int(trace), 0, 1)  # (width, n, 2)
    main_coeffs, main_rows_np, main_tree = _commit_matrix(
        cols, cfg.rate_bits, cfg.cap_height
    )
    transcript.observe_cap(main_tree.cap_ints())

    challenges = []
    aux_coeffs = aux_rows_np = aux_tree = None
    if air.aux_width:
        challenges = transcript.get_n_challenges(air.num_challenges)
        aux = air.build_aux(trace, challenges)
        aux_cols = jnp.moveaxis(gl.from_int(aux), 0, 1)
        aux_coeffs, aux_rows_np, aux_tree = _commit_matrix(
            aux_cols, cfg.rate_bits, cfg.cap_height
        )
        transcript.observe_cap(aux_tree.cap_ints())

    alpha = transcript.get_extension_challenge()

    # constraint evaluation over the LDE domain
    main_rows = jnp.asarray(main_rows_np)
    local, nxt = _rows_local_next(main_rows, cfg.rate_bits)
    aux_local = aux_next = None
    if air.aux_width:
        aux_rows = jnp.asarray(aux_rows_np)
        aux_local, aux_next = _rows_local_next(aux_rows, cfg.rate_bits)
    builder = AirBuilder(
        BaseLdeBackend(N), local, nxt, list(publics), aux_local, aux_next, challenges
    )
    air.eval(builder)
    sels = _selector_tables(log_n, cfg.rate_bits)
    combined = _combine_constraints(builder, alpha, sels, N)
    zh_inv_vec = jnp.asarray(sels[0])
    quotient = ext.scalar_mul(combined, zh_inv_vec)  # (N, 2, 2)

    # quotient -> blowup chunks of degree < n, as 2*blowup base columns
    q_base = jnp.moveaxis(quotient, -2, 0)  # (2, N, 2)
    # iNTT on the coset: undo the coset shift after the subgroup iNTT
    q_coeffs_shifted = nttmod.ntt(q_base, inverse=True)
    q_coeffs_full = nttmod.coset_shift(
        q_coeffs_shifted, pow(gl.GENERATOR, gl.P - 2, gl.P)
    )
    chunks = []
    for k in range(blowup):
        chunk = q_coeffs_full[:, k * n:(k + 1) * n, :]  # (2, n, 2)
        chunks.append(chunk)
    q_cols_coeffs = jnp.concatenate(chunks, axis=0)  # (2*blowup, n, 2)
    # commit: NTT to subgroup evals then standard commit path
    q_cols = nttmod.ntt(q_cols_coeffs)
    q_coeffs, q_rows_np, q_tree = _commit_matrix(q_cols, cfg.rate_bits, cfg.cap_height)
    transcript.observe_cap(q_tree.cap_ints())

    zeta = transcript.get_extension_challenge()
    g_n = gl.primitive_root_of_unity(log_n)
    zeta_next = ext.GFp2.mul(zeta, (g_n, 0))

    main_zeta = _eval_cols_at(main_coeffs, zeta)
    main_zeta_next = _eval_cols_at(main_coeffs, zeta_next)
    aux_zeta = aux_zeta_next = []
    if air.aux_width:
        aux_zeta = _eval_cols_at(aux_coeffs, zeta)
        aux_zeta_next = _eval_cols_at(aux_coeffs, zeta_next)
    q_zeta_pairs = _eval_cols_at(q_coeffs, zeta)  # 2*blowup base-col evals

    for v in main_zeta + main_zeta_next + aux_zeta + aux_zeta_next + q_zeta_pairs:
        transcript.observe_extension(v)

    alpha2 = transcript.get_extension_challenge()

    # DEEP composition on the LDE domain
    pts = _lde_points(log_n, cfg.rate_bits)
    x_vec = ext.from_base(gl.from_int(pts))  # (N, 2, 2)
    inv_x_zeta = ext.inv(ext.sub(x_vec, _ext_const_vec(zeta, N)))
    inv_x_zeta_next = ext.inv(ext.sub(x_vec, _ext_const_vec(zeta_next, N)))

    alpha2_vec = _ext_const_vec(alpha2, N)
    acc = ext.zeros((N,))
    first = True

    def add_term(acc, first, col_vals_base, y_pair, inv_vec):
        term = ext.sub(ext.from_base(col_vals_base), _ext_const_vec(y_pair, N))
        term = ext.mul(term, inv_vec)
        if first:
            return term, False
        return ext.add(ext.mul(acc, alpha2_vec), term), False

    all_cols_zeta = []  # (base col values (N,2), y, which inverse)
    for i in range(width):
        all_cols_zeta.append((main_rows[:, i, :], main_zeta[i], inv_x_zeta))
    if air.aux_width:
        for i in range(air.aux_width):
            all_cols_zeta.append((aux_rows[:, i, :], aux_zeta[i], inv_x_zeta))
    q_rows = jnp.asarray(q_rows_np)
    for i in range(2 * blowup):
        all_cols_zeta.append((q_rows[:, i, :], q_zeta_pairs[i], inv_x_zeta))
    for i in range(width):
        all_cols_zeta.append((main_rows[:, i, :], main_zeta_next[i], inv_x_zeta_next))
    if air.aux_width:
        for i in range(air.aux_width):
            all_cols_zeta.append((aux_rows[:, i, :], aux_zeta_next[i], inv_x_zeta_next))

    for col_vals, y, inv_vec in all_cols_zeta:
        acc, first = add_term(acc, first, col_vals, y, inv_vec)

    fri_proof, indices = fri.fri_prove(acc, transcript, cfg.fri())

    query_openings = []
    for q in indices:
        entry = {
            "main": OpenedRow(
                values=[int(v) for v in gl.to_int(main_rows_np[q])],
                siblings=[s.tolist() for s in main_tree.open(q)],
            ),
            "quotient": OpenedRow(
                values=[int(v) for v in gl.to_int(q_rows_np[q])],
                siblings=[s.tolist() for s in q_tree.open(q)],
            ),
        }
        if air.aux_width:
            entry["aux"] = OpenedRow(
                values=[int(v) for v in gl.to_int(aux_rows_np[q])],
                siblings=[s.tolist() for s in aux_tree.open(q)],
            )
        query_openings.append(entry)

    return StarkProof(
        n_rows=n,
        main_cap=main_tree.cap_ints(),
        aux_cap=aux_tree.cap_ints() if air.aux_width else None,
        quotient_cap=q_tree.cap_ints(),
        main_zeta=main_zeta,
        main_zeta_next=main_zeta_next,
        aux_zeta=aux_zeta,
        aux_zeta_next=aux_zeta_next,
        quotient_zeta=q_zeta_pairs,
        fri_proof=fri_proof,
        query_openings=query_openings,
    )


# ---------------------------------------------------------------------------
# verifier
# ---------------------------------------------------------------------------

def _verify_row_path(values: List[int], index: int, siblings, cap) -> bool:
    from ..ops import poseidon as pos

    digest = pos.hash_no_pad_ref(values)
    idx = index
    for sib in siblings:
        # siblings stored as nested [[lo,hi]*4] uint32 lists
        s = [int(pair[0]) | (int(pair[1]) << 32) for pair in sib]
        if idx & 1:
            digest = pos.hash_two_to_one_ref(s, digest)
        else:
            digest = pos.hash_two_to_one_ref(digest, s)
        idx >>= 1
    return digest == [int(v) for v in cap[idx]]


def verify(
    air: Air,
    proof: StarkProof,
    publics: Sequence[int],
    cfg: StarkConfig = StarkConfig(),
) -> bool:
    F2 = ext.GFp2
    n = proof.n_rows
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        return False
    N = n << cfg.rate_bits
    blowup = 1 << cfg.rate_bits

    transcript = Transcript()
    _observe_preamble(transcript, air, n, publics)
    transcript.observe_cap(proof.main_cap)
    challenges = []
    if air.aux_width:
        challenges = transcript.get_n_challenges(air.num_challenges)
        transcript.observe_cap(proof.aux_cap)
    alpha = transcript.get_extension_challenge()
    transcript.observe_cap(proof.quotient_cap)
    zeta = transcript.get_extension_challenge()
    g_n = gl.primitive_root_of_unity(log_n)
    zeta_next = F2.mul(zeta, (g_n, 0))

    if len(proof.main_zeta) != air.width or len(proof.main_zeta_next) != air.width:
        return False
    if len(proof.quotient_zeta) != 2 * blowup:
        return False

    for v in (
        proof.main_zeta
        + proof.main_zeta_next
        + proof.aux_zeta
        + proof.aux_zeta_next
        + proof.quotient_zeta
    ):
        transcript.observe_extension(v)
    alpha2 = transcript.get_extension_challenge()

    # --- constraint identity at zeta -------------------------------------
    builder = AirBuilder(
        ExtPointBackend(),
        [tuple(v) for v in proof.main_zeta],
        [tuple(v) for v in proof.main_zeta_next],
        list(publics),
        [tuple(v) for v in proof.aux_zeta] if air.aux_width else None,
        [tuple(v) for v in proof.aux_zeta_next] if air.aux_width else None,
        challenges,
    )
    air.eval(builder)
    sels_pt = _selectors_at_point(zeta, log_n)
    combined = _combine_constraints_at_point(builder, alpha, sels_pt)
    zh = sels_pt[0]
    # quotient(zeta) = sum_k zeta^(k*n) * (q_2k + t*q_2k+1)(zeta)
    zn = (1, 0)
    base = zeta
    e = n
    while e:
        if e & 1:
            zn = F2.mul(zn, base)
        base = F2.mul(base, base)
        e >>= 1
    q_at_zeta = (0, 0)
    zkn = (1, 0)
    for k in range(blowup):
        c0 = tuple(proof.quotient_zeta[2 * k])
        c1 = tuple(proof.quotient_zeta[2 * k + 1])
        chunk = F2.add(c0, F2.mul(c1, (0, 1)))
        q_at_zeta = F2.add(q_at_zeta, F2.mul(zkn, chunk))
        zkn = F2.mul(zkn, zn)
    if combined != F2.mul(zh, q_at_zeta):
        return False

    # --- FRI ---------------------------------------------------------------
    pts = _lde_points(log_n, cfg.rate_bits)

    def eval_at_index(round_i: int, q: int):
        entry = proof.query_openings[round_i]
        main = entry["main"]
        quot = entry["quotient"]
        if len(main.values) != air.width or len(quot.values) != 2 * blowup:
            return None
        if not _verify_row_path(main.values, q, main.siblings, proof.main_cap):
            return None
        if not _verify_row_path(quot.values, q, quot.siblings, proof.quotient_cap):
            return None
        aux_vals = []
        if air.aux_width:
            aux = entry["aux"]
            if len(aux.values) != air.aux_width:
                return None
            if not _verify_row_path(aux.values, q, aux.siblings, proof.aux_cap):
                return None
            aux_vals = aux.values
        x = (int(pts[q]), 0)
        inv_z = F2.inv(F2.sub(x, zeta))
        inv_zn = F2.inv(F2.sub(x, zeta_next))
        terms = []
        for i in range(air.width):
            terms.append((main.values[i], proof.main_zeta[i], inv_z))
        for i in range(len(aux_vals)):
            terms.append((aux_vals[i], proof.aux_zeta[i], inv_z))
        for i in range(2 * blowup):
            terms.append((quot.values[i], proof.quotient_zeta[i], inv_z))
        for i in range(air.width):
            terms.append((main.values[i], proof.main_zeta_next[i], inv_zn))
        for i in range(len(aux_vals)):
            terms.append((aux_vals[i], proof.aux_zeta_next[i], inv_zn))
        acc = (0, 0)
        first = True
        for v, y, inv in terms:
            t = F2.mul(F2.sub((int(v), 0), tuple(y)), inv)
            if first:
                acc = t
                first = False
            else:
                acc = F2.add(F2.mul(acc, alpha2), t)
        return acc

    log_N = log_n + cfg.rate_bits
    return fri.fri_verify(
        proof.fri_proof, log_N, transcript, cfg.fri(), eval_at_index
    )
