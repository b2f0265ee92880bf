"""Multi-table proof system: shared transcript + LogUp bus across AIRs.

The TPU-native equivalent of the reference's plonky2x + starkyx split
(SURVEY.md D9/D10): the circuit "CPU" table and accelerator chips (SHA-256,
later Ed25519) are separate uniform AIRs connected by a LogUp bus — every
table sends/receives fingerprinted messages, one extension inverse column
per interaction plus a running sum, and the verifier checks the grand total
balances to the claimed public messages.

Protocol (single Fiat-Shamir transcript):
  1. observe per-table preamble + preprocessed caps
  2. commit every table's main trace            -> caps observed
  3. draw bus challenges gamma (fingerprint), delta (denominator)
  4. per table: build LogUp aux columns, commit  -> caps + totals observed
  5. draw alpha; per table: quotient commit      -> caps observed
  6. draw zeta; per table: openings              -> observed
  7. draw alpha2; per table: DEEP + FRI (sequential)
  8. verifier: sum of table totals == sum of public-message terms
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import ntt as nttmod
from ..field import extension as ext
from . import fri
from . import merkle_cap
from .air import (
    Air,
    AirBuilder,
    BaseLdeBackend,
    ExtPointBackend,
    Elem,
    ExtElem,
)
from .stark import (
    OpenedRow,
    ProverKey,
    StarkConfig,
    StarkProof,
    VerifierKey,
    _commit_matrix,
    _combine_constraints_lde,
    _combine_constraints_point,
    _eval_cols_at,
    _eval_cols_at_points,
    _ext_const_vec,
    _ext_pow,
    _lde_points,
    _observe_preamble,
    _offset_rows,
    _periodic_at_point,
    _periodic_cache,
    _selector_tables,
    _selectors_at_point,
    _verify_row_path,
    build,
)
from .transcript import Transcript

F2 = ext.GFp2


@dataclass
class TableSpec:
    name: str
    air: Air
    trace: np.ndarray
    publics: Sequence[int]
    pk: Optional[ProverKey] = None


@dataclass
class SystemProof:
    table_proofs: List[StarkProof]
    bus_totals: List[Optional[Tuple[int, int]]]


# ---------------------------------------------------------------------------
# LogUp helpers
# ---------------------------------------------------------------------------

def introspect_interactions(air: Air) -> int:
    """Count the AIR's bus interactions (runs eval with dummy values)."""
    zero = (0, 0)
    dummy_rows = {k: [zero] * air.width for k in air.row_offsets}
    aux = None
    pre = None
    if air.pre_width:
        pre = {k: [zero] * air.pre_width for k in air.pre_offsets}
    b = AirBuilder(
        ExtPointBackend(),
        rows=dummy_rows,
        publics=[0] * 64,
        aux_rows={0: [zero] * 1024, 1: [zero] * 1024},
        challenges=[(1, 1), (1, 1)],
        periodic=[zero] * len(air.periodic_columns),
        pre_rows=pre,
    )
    air.eval(b)
    return len(b.interactions)


def bus_aux_width(air: Air) -> int:
    n_inter = introspect_interactions(air)
    return 2 * (n_inter + 1) if n_inter else 0


def _fingerprint(builder: AirBuilder, inter, gamma_pair) -> ExtElem:
    """channel + gamma*arg0 + gamma^2*arg1 + ... as an ExtElem.

    gamma_pair is an int pair on the native prover/verifier (fast path:
    gamma powers fold into host constants) or a pair of backend handles
    inside the recursive verifier (proof/recursion.py), where the powers
    must be computed in-circuit."""
    acc = ExtElem.from_base(builder.const(inter.channel))
    if isinstance(gamma_pair[0], int):
        gp = (1, 0)
        for a in inter.args:
            gp = F2.mul(gp, gamma_pair)
            acc = acc + builder.ext_const(gp) * a
    else:
        gamma = ExtElem(builder.const(gamma_pair[0]),
                        builder.const(gamma_pair[1]))
        gp = builder.ext_const((1, 0))
        for a in inter.args:
            gp = gp * gamma
            acc = acc + gp * a
    return acc


def message_term(channel: int, args: Sequence[int], gamma, delta) -> Tuple[int, int]:
    """Host-side 1/(delta + fingerprint) for a public message."""
    f = (channel % gl.P, 0)
    gp = (1, 0)
    for a in args:
        gp = F2.mul(gp, gamma)
        f = F2.add(f, F2.mul(gp, (int(a) % gl.P, 0)))
    return F2.inv(F2.add(delta, f))


def _emit_logup_constraints(builder: AirBuilder, total_pair) -> None:
    """Append the LogUp constraints after air.eval registered interactions.

    Aux layout: cols (2i, 2i+1) = inv_i (extension), last pair = running sum.
    """
    inters = builder.interactions
    n_i = len(inters)
    gamma = builder._challenges[0]
    delta = builder._challenges[1]
    for i, inter in enumerate(inters):
        inv = builder.aux_local_ext(i)
        f = _fingerprint(builder, inter, gamma)
        den = builder.ext_const(delta) + f
        builder.assert_zero_ext(inv * den - inter.mult)

    def signed_sum(get):
        acc = None
        for i, inter in enumerate(inters):
            term = get(i)
            if inter.sign < 0:
                term = ExtElem(builder.const(0) - term.c0, builder.const(0) - term.c1)
            acc = term if acc is None else acc + term
        return acc

    s_local = builder.aux_local_ext(n_i)
    s_next = builder.aux_next_ext(n_i)
    first_sum = signed_sum(builder.aux_local_ext)
    builder.assert_zero_ext(
        ExtElem(s_local.c0 - first_sum.c0, s_local.c1 - first_sum.c1), "first_row"
    )
    next_sum = signed_sum(builder.aux_next_ext)
    builder.assert_zero_ext(
        ExtElem(
            s_next.c0 - s_local.c0 - next_sum.c0,
            s_next.c1 - s_local.c1 - next_sum.c1,
        ),
        "transition",
    )
    total = builder.ext_const(total_pair)
    builder.assert_zero_ext(
        ExtElem(s_local.c0 - total.c0, s_local.c1 - total.c1), "last_row"
    )


def _build_logup_aux(
    air: Air,
    trace: np.ndarray,
    pre_trace: Optional[np.ndarray],
    challenges,
    publics: Sequence[int] = (),
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Evaluate interactions over the raw trace (device, vectorized) and
    build the aux columns [inv_0 .. inv_I-1, running_sum] (base pairs)."""
    n = trace.shape[0]
    cols = gl.from_int(trace)  # (n, width, 2)

    def rolled(offsets, mat):
        out = {}
        for k in offsets:
            m = jnp.roll(mat, -k, axis=0) if k else mat
            out[k] = [m[:, i, :] for i in range(m.shape[1])]
        return out

    rows = rolled(air.row_offsets, cols)
    pre_rows = None
    if air.pre_width:
        pre_cols = gl.from_int(pre_trace)
        pre_rows = rolled(air.pre_offsets, pre_cols)
    periodic = []
    for vals in air.periodic_columns:
        tiled = np.tile(np.asarray(vals, dtype=np.uint64), n // len(vals))
        periodic.append(gl.from_int(tiled))
    builder = AirBuilder(
        BaseLdeBackend(n),
        rows=rows,
        publics=list(publics) + [0] * 64,
        aux_rows=None,
        challenges=challenges,
        periodic=periodic,
        pre_rows=pre_rows,
    )
    air.eval(builder)
    inters = builder.interactions
    gamma, delta = challenges[0], challenges[1]
    delta_vec = _ext_const_vec(delta, n)

    aux_cols = []
    signed_terms = None
    for inter in inters:
        f = _fingerprint(builder, inter, gamma)
        f_arr = jnp.stack([f.c0.v, f.c1.v], axis=-2)  # (n, 2, 2)
        den = ext.add(delta_vec, f_arr)
        inv = ext.inv(den)
        mult = inter.mult.v if isinstance(inter.mult, Elem) else inter.mult
        inv = ext.scalar_mul(inv, mult)
        aux_cols.append(inv)
        st = inv if inter.sign > 0 else ext.neg(inv)
        signed_terms = st if signed_terms is None else ext.add(signed_terms, st)

    run = jax.lax.associative_scan(ext.add, signed_terms, axis=0)  # (n, 2, 2)
    aux_cols.append(run)

    aux = np.zeros((n, 2 * len(aux_cols)), dtype=np.uint64)
    for i, colv in enumerate(aux_cols):
        arr = np.asarray(colv)
        aux[:, 2 * i] = gl.to_int(arr[:, 0, :])
        aux[:, 2 * i + 1] = gl.to_int(arr[:, 1, :])
    total_arr = np.asarray(run[-1])
    total = (int(gl.to_int(total_arr[0])), int(gl.to_int(total_arr[1])))
    return aux, total


def check_bus_balance(specs: List[TableSpec],
                      public_messages=None,
                      challenges=None) -> bool:
    """Fast witness-level check: with random bus challenges, the LogUp
    totals of all tables plus the public-message terms must sum to zero.
    Catches chip wiring mismatches in seconds without proving."""
    challenges = challenges or [(12345, 67890), (54321, 9876)]
    total = (0, 0)
    for spec in specs:
        air = spec.air
        if not introspect_interactions(air):
            continue
        pre_trace = air.preprocessed_columns(spec.trace.shape[0]) if air.pre_width else None
        _, t = _build_logup_aux(air, spec.trace, pre_trace, challenges, spec.publics)
        total = F2.add(total, t)
    gamma, delta = challenges
    for channel, args, sign in public_messages or []:
        term = message_term(channel, args, gamma, delta)
        if sign < 0:
            term = F2.sub((0, 0), term)
        total = F2.add(total, term)
    return total == (0, 0)


# ---------------------------------------------------------------------------
# system prover
# ---------------------------------------------------------------------------

def prove_system(
    specs: List[TableSpec],
    cfg: StarkConfig = StarkConfig(),
) -> SystemProof:
    from ..utils import timing

    _ph = timing.phases("prove_system")
    _ph.mark("preamble")
    transcript = Transcript()
    states = []
    any_bus = False

    for spec in specs:
        air, trace = spec.air, spec.trace
        n, width = trace.shape
        assert width == air.width
        log_n = n.bit_length() - 1
        assert 1 << log_n == n
        N = n << cfg.rate_bits
        assert air.max_constraint_degree * (n - 1) + 1 <= N - 1
        pk = spec.pk
        if air.pre_width and pk is None:
            pk, _ = build(air, n, cfg)
        _observe_preamble(transcript, air, n, spec.publics)
        if air.pre_width:
            transcript.observe_cap(pk.pre_tree.cap_ints())
        n_inter = introspect_interactions(air)
        any_bus = any_bus or n_inter > 0
        states.append(
            dict(
                spec=spec, air=air, n=n, log_n=log_n, N=N, pk=pk, n_inter=n_inter
            )
        )

    # 2. main commits
    _ph.mark("main_commits")
    for st in states:
        cols = jnp.moveaxis(gl.from_int(st["spec"].trace), 0, 1)
        st["main_coeffs"], st["main_rows_np"], st["main_tree"] = _commit_matrix(
            cols, cfg.rate_bits, cfg.cap_height
        )
        transcript.observe_cap(st["main_tree"].cap_ints())

    # 3. bus challenges
    challenges = []
    if any_bus:
        challenges = [transcript.get_extension_challenge() for _ in range(2)]

    # 4. aux commits (LogUp or legacy build_aux)
    _ph.mark("aux_commits")
    for st in states:
        air = st["air"]
        if st["n_inter"]:
            pre_np = st["pk"].pre_rows_np if air.pre_width else None
            # NOTE: aux build evaluates on the raw trace; pre trace values
            # are the preprocessed_columns matrix, not its LDE
            pre_trace = air.preprocessed_columns(st["n"]) if air.pre_width else None
            aux, total = _build_logup_aux(
                air, st["spec"].trace, pre_trace, challenges, st["spec"].publics
            )
            st["aux_np"] = aux
            st["bus_total"] = total
            st["aux_width"] = aux.shape[1]
            st["challenges"] = challenges
        elif air.aux_width:
            ch = [transcript.get_extension_challenge() for _ in range(air.num_challenges)]
            st["challenges"] = ch
            st["aux_np"] = air.build_aux(st["spec"].trace, ch)
            st["bus_total"] = None
            st["aux_width"] = air.aux_width
        else:
            st["aux_np"] = None
            st["bus_total"] = None
            st["aux_width"] = 0
            st["challenges"] = challenges if any_bus else []
        if st["aux_np"] is not None:
            aux_cols = jnp.moveaxis(gl.from_int(st["aux_np"]), 0, 1)
            st["aux_coeffs"], st["aux_rows_np"], st["aux_tree"] = _commit_matrix(
                aux_cols, cfg.rate_bits, cfg.cap_height
            )
            transcript.observe_cap(st["aux_tree"].cap_ints())
            if st["bus_total"] is not None:
                transcript.observe_element(st["bus_total"][0])
                transcript.observe_element(st["bus_total"][1])

    # 5. quotients
    _ph.mark("quotients")
    alpha = transcript.get_extension_challenge()
    for st in states:
        air, n, N, log_n = st["air"], st["n"], st["N"], st["log_n"]
        blowup = 1 << cfg.rate_bits
        main_rows = jnp.asarray(st["main_rows_np"])
        st["main_rows"] = main_rows
        main_by_offset = _offset_rows(main_rows, tuple(air.row_offsets), cfg.rate_bits)
        aux_by_offset = None
        if st["aux_width"]:
            aux_rows = jnp.asarray(st["aux_rows_np"])
            st["aux_rows"] = aux_rows
            aux_by_offset = _offset_rows(aux_rows, (0, 1), cfg.rate_bits)
        periodic_lde = [
            jnp.asarray(_periodic_cache(tuple(int(v) for v in vals), log_n, cfg.rate_bits))
            for vals in air.periodic_columns
        ]
        pre_by_offset = None
        if air.pre_width:
            pre_rows = jnp.asarray(st["pk"].pre_rows_np)
            st["pre_rows"] = pre_rows
            pre_by_offset = _offset_rows(pre_rows, tuple(air.pre_offsets), cfg.rate_bits)
        builder = AirBuilder(
            BaseLdeBackend(N),
            rows=main_by_offset,
            publics=list(st["spec"].publics),
            aux_rows=aux_by_offset,
            challenges=st["challenges"],
            periodic=periodic_lde,
            pre_rows=pre_by_offset,
        )
        air.eval(builder)
        if st["n_inter"]:
            _emit_logup_constraints(builder, st["bus_total"])
        sels = _selector_tables(log_n, cfg.rate_bits)
        combined = _combine_constraints_lde(builder, alpha, sels, N)
        quotient = ext.scalar_mul(combined, jnp.asarray(sels[0]))
        q_base = jnp.moveaxis(quotient, -2, 0)
        q_coeffs_shifted = nttmod.ntt(q_base, inverse=True)
        q_coeffs_full = nttmod.coset_shift(
            q_coeffs_shifted, pow(gl.GENERATOR, gl.P - 2, gl.P)
        )
        chunks = [q_coeffs_full[:, k * n:(k + 1) * n, :] for k in range(blowup)]
        q_cols = nttmod.ntt(jnp.concatenate(chunks, axis=0))
        st["q_coeffs"], st["q_rows_np"], st["q_tree"] = _commit_matrix(
            q_cols, cfg.rate_bits, cfg.cap_height
        )
        transcript.observe_cap(st["q_tree"].cap_ints())

    # 6. openings
    _ph.mark("openings")
    zeta = transcript.get_extension_challenge()
    for st in states:
        air, log_n = st["air"], st["log_n"]
        g_n = gl.primitive_root_of_unity(log_n)

        def zs_for(ks):
            return [F2.mul(zeta, (pow(g_n, k, gl.P), 0)) for k in ks]

        offsets = tuple(air.row_offsets)
        st["main_openings"] = dict(
            zip(offsets, _eval_cols_at_points(st["main_coeffs"], zs_for(offsets)))
        )
        aux_offsets = (0, 1) if st["aux_width"] else ()
        st["aux_offsets"] = aux_offsets
        st["aux_openings"] = {}
        if st["aux_width"]:
            st["aux_openings"] = dict(
                zip(aux_offsets, _eval_cols_at_points(st["aux_coeffs"], zs_for(aux_offsets)))
            )
        pre_off = tuple(air.pre_offsets) if air.pre_width else ()
        st["pre_off"] = pre_off
        st["pre_openings"] = {}
        if air.pre_width:
            st["pre_openings"] = dict(
                zip(pre_off, _eval_cols_at_points(st["pk"].pre_coeffs, zs_for(pre_off)))
            )
        st["q_zeta_pairs"] = _eval_cols_at(st["q_coeffs"], zeta)
        for k in offsets:
            for v in st["main_openings"][k]:
                transcript.observe_extension(v)
        for k in aux_offsets:
            for v in st["aux_openings"][k]:
                transcript.observe_extension(v)
        for k in pre_off:
            for v in st["pre_openings"][k]:
                transcript.observe_extension(v)
        for v in st["q_zeta_pairs"]:
            transcript.observe_extension(v)

    # 7. DEEP + FRI per table
    _ph.mark("deep_fri")
    alpha2 = transcript.get_extension_challenge()
    table_proofs = []
    for st in states:
        air, n, N, log_n = st["air"], st["n"], st["N"], st["log_n"]
        blowup = 1 << cfg.rate_bits
        g_n = gl.primitive_root_of_unity(log_n)
        offsets = tuple(air.row_offsets)
        aux_offsets = st["aux_offsets"]
        pre_off = st["pre_off"]
        pts = _lde_points(log_n, cfg.rate_bits)
        x_vec = ext.from_base(gl.from_int(pts))
        inv_by_offset = {}
        for k in sorted(set(offsets) | set(aux_offsets) | set(pre_off)):
            zk = F2.mul(zeta, (pow(g_n, k, gl.P), 0))
            inv_by_offset[k] = ext.inv(ext.sub(x_vec, _ext_const_vec(zk, N)))

        q_rows = jnp.asarray(st["q_rows_np"])
        col_parts = []
        y_list = []
        inv_idx = []
        for k in offsets:
            col_parts.append(jnp.moveaxis(st["main_rows"], 1, 0))
            y_list.extend(st["main_openings"][k])
            inv_idx.extend([k] * air.width)
        for k in aux_offsets:
            col_parts.append(jnp.moveaxis(st["aux_rows"], 1, 0))
            y_list.extend(st["aux_openings"][k])
            inv_idx.extend([k] * st["aux_width"])
        if air.pre_width:
            for k in pre_off:
                col_parts.append(jnp.moveaxis(st["pre_rows"], 1, 0))
                y_list.extend(st["pre_openings"][k])
                inv_idx.extend([k] * air.pre_width)
        col_parts.append(jnp.moveaxis(q_rows, 1, 0))
        y_list.extend(st["q_zeta_pairs"])
        inv_idx.extend([0] * (2 * blowup))

        col_stack = jnp.concatenate(col_parts, axis=0)
        T = col_stack.shape[0]
        y_stack = ext.from_int_pair(
            np.array([y[0] for y in y_list], dtype=np.uint64),
            np.array([y[1] for y in y_list], dtype=np.uint64),
        )
        inv_stack = jnp.stack([inv_by_offset[k] for k in inv_idx])
        w_c0 = np.empty(T, dtype=np.uint64)
        w_c1 = np.empty(T, dtype=np.uint64)
        wcur = (1, 0)
        for j in range(T - 1, -1, -1):
            w_c0[j], w_c1[j] = wcur
            wcur = F2.mul(wcur, alpha2)
        w_stack = ext.from_int_pair(w_c0, w_c1)
        vals = ext.from_base(col_stack)
        terms_v = ext.mul(ext.sub(vals, y_stack[:, None]), inv_stack)
        weighted = ext.mul(terms_v, w_stack[:, None])
        Tp = 1 << (T - 1).bit_length()
        if Tp != T:
            weighted = jnp.pad(weighted, [(0, Tp - T), (0, 0), (0, 0), (0, 0)])
        k2 = Tp
        while k2 > 1:
            k2 //= 2
            weighted = ext.add(weighted[:k2], weighted[k2:2 * k2])
        acc = weighted[0]

        fri_proof, indices = fri.fri_prove(acc, transcript, cfg.fri())

        query_openings = []
        for q in indices:
            entry = {
                "main": OpenedRow(
                    values=[int(v) for v in gl.to_int(st["main_rows_np"][q])],
                    siblings=[s.tolist() for s in st["main_tree"].open(q)],
                ),
                "quotient": OpenedRow(
                    values=[int(v) for v in gl.to_int(st["q_rows_np"][q])],
                    siblings=[s.tolist() for s in st["q_tree"].open(q)],
                ),
            }
            if st["aux_width"]:
                entry["aux"] = OpenedRow(
                    values=[int(v) for v in gl.to_int(st["aux_rows_np"][q])],
                    siblings=[s.tolist() for s in st["aux_tree"].open(q)],
                )
            if air.pre_width:
                entry["pre"] = OpenedRow(
                    values=[int(v) for v in gl.to_int(st["pk"].pre_rows_np[q])],
                    siblings=[s.tolist() for s in st["pk"].pre_tree.open(q)],
                )
            query_openings.append(entry)

        table_proofs.append(
            StarkProof(
                n_rows=n,
                main_cap=st["main_tree"].cap_ints(),
                aux_cap=st["aux_tree"].cap_ints() if st["aux_width"] else None,
                quotient_cap=st["q_tree"].cap_ints(),
                main_openings=st["main_openings"],
                aux_openings=st["aux_openings"],
                pre_openings=st["pre_openings"],
                quotient_zeta=st["q_zeta_pairs"],
                fri_proof=fri_proof,
                query_openings=query_openings,
            )
        )

    _ph.end()
    return SystemProof(
        table_proofs=table_proofs,
        bus_totals=[st["bus_total"] for st in states],
    )


# ---------------------------------------------------------------------------
# system verifier
# ---------------------------------------------------------------------------

def verify_system(
    airs: List[Air],
    publics_list: List[Sequence[int]],
    proof: SystemProof,
    cfg: StarkConfig = StarkConfig(),
    vks: Optional[List[Optional[VerifierKey]]] = None,
    public_messages: Optional[List[Tuple[int, Sequence[int], int]]] = None,
) -> bool:
    """public_messages: (channel, args, sign) tuples contributed by the
    verifier as a virtual bus participant (sign +1 = the verifier sends the
    message the tables receive). Balance: sum(table totals) + sum(public
    terms) == 0."""
    n_tables = len(airs)
    if len(proof.table_proofs) != n_tables or len(proof.bus_totals) != n_tables:
        return False
    transcript = Transcript()
    metas = []
    any_bus = False
    for i, air in enumerate(airs):
        p = proof.table_proofs[i]
        n = p.n_rows
        log_n = n.bit_length() - 1
        if 1 << log_n != n:
            return False
        vk = vks[i] if vks else None
        if air.pre_width and vk is None:
            _, vk = build(air, n, cfg)
        _observe_preamble(transcript, air, n, publics_list[i])
        if air.pre_width:
            transcript.observe_cap(vk.pre_cap)
        n_inter = introspect_interactions(air)
        any_bus = any_bus or n_inter > 0
        metas.append(dict(air=air, n=n, log_n=log_n, vk=vk, n_inter=n_inter))

    for i, m in enumerate(metas):
        transcript.observe_cap(proof.table_proofs[i].main_cap)

    challenges = []
    if any_bus:
        challenges = [transcript.get_extension_challenge() for _ in range(2)]

    for i, m in enumerate(metas):
        air = m["air"]
        p = proof.table_proofs[i]
        if m["n_inter"]:
            m["aux_width"] = 2 * (m["n_inter"] + 1)
            m["challenges"] = challenges
            if p.aux_cap is None or proof.bus_totals[i] is None:
                return False
            transcript.observe_cap(p.aux_cap)
            transcript.observe_element(proof.bus_totals[i][0] % gl.P)
            transcript.observe_element(proof.bus_totals[i][1] % gl.P)
        elif air.aux_width:
            ch = [transcript.get_extension_challenge() for _ in range(air.num_challenges)]
            m["challenges"] = ch
            m["aux_width"] = air.aux_width
            transcript.observe_cap(p.aux_cap)
        else:
            m["aux_width"] = 0
            m["challenges"] = challenges if any_bus else []

    alpha = transcript.get_extension_challenge()
    for i, m in enumerate(metas):
        transcript.observe_cap(proof.table_proofs[i].quotient_cap)
    zeta = transcript.get_extension_challenge()

    blowup = 1 << cfg.rate_bits
    for i, m in enumerate(metas):
        air = m["air"]
        p = proof.table_proofs[i]
        offsets = tuple(air.row_offsets)
        aux_offsets = (0, 1) if m["aux_width"] else ()
        pre_off = tuple(air.pre_offsets) if air.pre_width else ()
        m["offsets"], m["aux_offsets"], m["pre_off"] = offsets, aux_offsets, pre_off
        for k in offsets:
            if k not in p.main_openings or len(p.main_openings[k]) != air.width:
                return False
        for k in aux_offsets:
            if k not in p.aux_openings or len(p.aux_openings[k]) != m["aux_width"]:
                return False
        for k in pre_off:
            if k not in p.pre_openings or len(p.pre_openings[k]) != air.pre_width:
                return False
        if len(p.quotient_zeta) != 2 * blowup:
            return False
        for k in offsets:
            for v in p.main_openings[k]:
                transcript.observe_extension(v)
        for k in aux_offsets:
            for v in p.aux_openings[k]:
                transcript.observe_extension(v)
        for k in pre_off:
            for v in p.pre_openings[k]:
                transcript.observe_extension(v)
        for v in p.quotient_zeta:
            transcript.observe_extension(v)

    alpha2 = transcript.get_extension_challenge()

    # constraint identity + FRI per table
    for i, m in enumerate(metas):
        air = m["air"]
        p = proof.table_proofs[i]
        n, log_n = m["n"], m["log_n"]
        g_n = gl.primitive_root_of_unity(log_n)
        offsets, aux_offsets, pre_off = m["offsets"], m["aux_offsets"], m["pre_off"]

        rows_at_zeta = {k: [tuple(v) for v in p.main_openings[k]] for k in offsets}
        aux_at_zeta = (
            {k: [tuple(v) for v in p.aux_openings[k]] for k in aux_offsets}
            if m["aux_width"]
            else None
        )
        periodic_at = [
            _periodic_at_point([int(v) for v in vals], zeta, log_n)
            for vals in air.periodic_columns
        ]
        pre_at_zeta = (
            {k: [tuple(v) for v in p.pre_openings[k]] for k in pre_off}
            if air.pre_width
            else None
        )
        builder = AirBuilder(
            ExtPointBackend(),
            rows=rows_at_zeta,
            publics=list(publics_list[i]),
            aux_rows=aux_at_zeta,
            challenges=m["challenges"],
            periodic=periodic_at,
            pre_rows=pre_at_zeta,
        )
        air.eval(builder)
        if m["n_inter"]:
            _emit_logup_constraints(builder, proof.bus_totals[i])
        sels_pt = _selectors_at_point(zeta, log_n)
        combined = _combine_constraints_point(builder, alpha, sels_pt)
        zh = sels_pt[0]
        zn = _ext_pow(zeta, n)
        q_at_zeta = (0, 0)
        zkn = (1, 0)
        for k in range(blowup):
            c0 = tuple(p.quotient_zeta[2 * k])
            c1 = tuple(p.quotient_zeta[2 * k + 1])
            chunk = F2.add(c0, F2.mul(c1, (0, 1)))
            q_at_zeta = F2.add(q_at_zeta, F2.mul(zkn, chunk))
            zkn = F2.mul(zkn, zn)
        if combined != F2.mul(zh, q_at_zeta):
            return False

        pts = _lde_points(log_n, cfg.rate_bits)
        zeta_by_offset = {
            k: F2.mul(zeta, (pow(g_n, k, gl.P), 0))
            for k in sorted(set(offsets) | set(aux_offsets) | set(pre_off))
        }

        def eval_at_index(round_i: int, q: int, p=p, air=air, m=m,
                          offsets=offsets, aux_offsets=aux_offsets,
                          pre_off=pre_off, pts=pts, zeta_by_offset=zeta_by_offset):
            entry = p.query_openings[round_i]
            main = entry["main"]
            quot = entry["quotient"]
            if len(main.values) != air.width or len(quot.values) != 2 * blowup:
                return None
            if not _verify_row_path(main.values, q, main.siblings, p.main_cap):
                return None
            if not _verify_row_path(quot.values, q, quot.siblings, p.quotient_cap):
                return None
            aux_vals = []
            if m["aux_width"]:
                aux = entry["aux"]
                if len(aux.values) != m["aux_width"]:
                    return None
                if not _verify_row_path(aux.values, q, aux.siblings, p.aux_cap):
                    return None
                aux_vals = aux.values
            pre_vals = []
            if air.pre_width:
                pre = entry["pre"]
                if len(pre.values) != air.pre_width:
                    return None
                if not _verify_row_path(pre.values, q, pre.siblings, m["vk"].pre_cap):
                    return None
                pre_vals = pre.values
            x = (int(pts[q]), 0)
            inv_at = {k: F2.inv(F2.sub(x, zk)) for k, zk in zeta_by_offset.items()}
            terms = []
            for k in offsets:
                for j in range(air.width):
                    terms.append((main.values[j], p.main_openings[k][j], inv_at[k]))
            for k in aux_offsets:
                for j in range(m["aux_width"]):
                    terms.append((aux_vals[j], p.aux_openings[k][j], inv_at[k]))
            for k in pre_off:
                for j in range(air.pre_width):
                    terms.append((pre_vals[j], p.pre_openings[k][j], inv_at[k]))
            for j in range(2 * blowup):
                terms.append((quot.values[j], p.quotient_zeta[j], inv_at[0]))
            acc = None
            for v, y, inv in terms:
                t = F2.mul(F2.sub((int(v), 0), tuple(y)), inv)
                acc = t if acc is None else F2.add(F2.mul(acc, alpha2), t)
            return acc

        log_N = log_n + cfg.rate_bits
        if not fri.fri_verify(p.fri_proof, log_N, transcript, cfg.fri(), eval_at_index):
            return False

    # bus balance
    if any_bus:
        gamma, delta = challenges
        total = (0, 0)
        for t in proof.bus_totals:
            if t is not None:
                total = F2.add(total, (t[0] % gl.P, t[1] % gl.P))
        for channel, args, sign in public_messages or []:
            term = message_term(channel, args, gamma, delta)
            if sign < 0:
                term = F2.sub((0, 0), term)
            total = F2.add(total, term)
        if total != (0, 0):
            return False
    return True
