"""Witness-level soundness checker: evaluate every table's constraints on
the raw trace domain plus the LogUp bus balance, without proving.

This is exactly the statement the STARK enforces (the quotient must vanish
on the trace domain and the bus must balance), evaluated directly — a
malicious witness that fails here cannot yield a verifying proof, and an
honest witness that passes will. Used by adversarial tests (forged vote,
broken quorum, bad linkage must fail) and as a fast preflight in debugging.

Runs on a numpy host backend (field/goldilocks_host.py): AIR evaluation
here is dispatch-bound (thousands of tiny ops), where per-op jnp dispatch
costs ~1000x a fused numpy sweep.

Reference counterpart: the prove-then-verify oracle of every reference test
(SURVEY.md section 4) — this is its seconds-fast approximation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..field import goldilocks_host as glh
from ..field.goldilocks import P
from ..field.extension import W
from .air import (
    AirBuilder, EVERYWHERE, FIRST_ROW, LAST_ROW, TRANSITION,
)

_U64 = np.uint64


class HostBackend:
    """AirBuilder backend over numpy uint64 arrays (trace-domain eval)."""

    def __init__(self, n: int):
        self.n = n

    def const(self, c: int):
        return np.full(self.n, _U64(int(c) % P), dtype=_U64)

    add = staticmethod(glh.add)
    sub = staticmethod(glh.sub)
    mul = staticmethod(glh.mul)

    def stack(self, handles):
        return np.stack(list(handles), axis=0)

    def gather(self, h, indices):
        return h[np.asarray(list(indices), dtype=np.int64)]

    def fold(self, h, weights):
        acc = None
        for k, w in enumerate(weights):
            t = glh.mul(h[k], np.full(h.shape[1], _U64(int(w) % P), dtype=_U64))
            acc = t if acc is None else glh.add(acc, t)
        return acc

    @staticmethod
    def is_stacked(h):
        return h.ndim == 2


def _rolled_host(offsets, mat: np.ndarray):
    out = {}
    for k in offsets:
        m = np.roll(mat, -k, axis=0) if k else mat
        out[k] = [m[:, i] for i in range(m.shape[1])]
    return out


def _host_builder(air, trace: np.ndarray, publics=(), challenges=None,
                  aux: Optional[np.ndarray] = None) -> AirBuilder:
    n = trace.shape[0]
    mat = trace.astype(_U64) % _U64(P)
    rows = _rolled_host(air.row_offsets, mat)
    aux_rows = _rolled_host((0, 1), aux.astype(_U64)) if aux is not None else None
    pre_rows = None
    if air.pre_width:
        pre_rows = _rolled_host(air.pre_offsets,
                                air.preprocessed_columns(n).astype(_U64))
    periodic = [
        np.tile(np.asarray(vals, dtype=_U64), n // len(vals))
        for vals in air.periodic_columns
    ]
    b = AirBuilder(
        HostBackend(n), rows=rows, publics=list(publics),
        aux_rows=aux_rows, challenges=challenges or [],
        periodic=periodic, pre_rows=pre_rows,
    )
    air.eval(b)
    return b


def check_air_on_trace(air, trace: np.ndarray, publics=(), challenges=None,
                       aux: np.ndarray = None) -> list:
    """Returns [(constraint_idx, scope, bad_row_indices)] for failures."""
    n = trace.shape[0]
    b = _host_builder(air, trace, publics, challenges, aux)
    failures = []
    for ci, con in enumerate(b.constraints):
        ints = np.asarray(con.expr)
        if ints.ndim == 1:
            ints = ints[None]
        bad = set()
        for lane in ints:
            nz = np.nonzero(lane)[0]
            if con.scope == FIRST_ROW:
                nz = nz[nz == 0]
            elif con.scope == LAST_ROW:
                nz = nz[nz == n - 1]
            elif con.scope == TRANSITION:
                nz = nz[nz != n - 1]
            bad.update(int(x) for x in nz)
        if bad:
            failures.append((ci, con.scope, sorted(bad)[:10]))
    return failures


# -- host GF(p^2) vector helpers ---------------------------------------------

def _f2v_add(a, b):
    return (glh.add(a[0], b[0]), glh.add(a[1], b[1]))


def _f2v_mul(a, b):
    w = np.full_like(a[0], _U64(W))
    return (
        glh.add(glh.mul(a[0], b[0]), glh.mul(w, glh.mul(a[1], b[1]))),
        glh.add(glh.mul(a[0], b[1]), glh.mul(a[1], b[0])),
    )


def _f2v_inv(a):
    w = np.full_like(a[0], _U64(W))
    norm = glh.sub(glh.mul(a[0], a[0]), glh.mul(w, glh.mul(a[1], a[1])))
    ninv = glh.inv_or_zero(norm)
    return (glh.mul(a[0], ninv), glh.mul(glh.neg(a[1]), ninv))


def bus_total_host(air, trace: np.ndarray, challenges,
                   publics=()) -> Tuple[int, int]:
    """Table's LogUp total under the given challenges (host numpy)."""
    n = trace.shape[0]
    b = _host_builder(air, trace, publics, challenges)
    gamma, delta = challenges
    g = (np.full(n, _U64(gamma[0])), np.full(n, _U64(gamma[1])))
    d = (np.full(n, _U64(delta[0])), np.full(n, _U64(delta[1])))
    total = (np.zeros(n, dtype=_U64), np.zeros(n, dtype=_U64))
    for inter in b.interactions:
        f = (np.full(n, _U64(inter.channel % P)), np.zeros(n, dtype=_U64))
        gp = (np.ones(n, dtype=_U64), np.zeros(n, dtype=_U64))
        for a in inter.args:
            gp = _f2v_mul(gp, g)
            av = a.v if hasattr(a, "v") else a
            f = _f2v_add(f, _f2v_mul(gp, (av, np.zeros(n, dtype=_U64))))
        inv = _f2v_inv(_f2v_add(d, f))
        mult = inter.mult.v if hasattr(inter.mult, "v") else inter.mult
        term = (glh.mul(inv[0], mult), glh.mul(inv[1], mult))
        if inter.sign < 0:
            term = (glh.neg(term[0]), glh.neg(term[1]))
        total = _f2v_add(total, term)
    return (
        int(sum(int(v) for v in total[0]) % P),
        int(sum(int(v) for v in total[1]) % P),
    )


def _message_term(channel, args, gamma, delta):
    from ..field.extension import GFp2 as F2

    f = (channel % P, 0)
    gp = (1, 0)
    for a in args:
        gp = F2.mul(gp, gamma)
        f = F2.add(f, F2.mul(gp, (int(a) % P, 0)))
    return F2.inv(F2.add(delta, f))


def _derive_challenges(traces: dict, publics) -> List[list]:
    """Fiat-Shamir-style bus challenges bound to the witness itself: a
    crafted witness cannot target them (they move whenever any trace cell
    or public byte moves). Two independent (gamma, delta) pairs are sampled
    so a single accidental collision cannot mask an unbalanced bus. Real
    soundness still comes from prove+verify, where the challenges are drawn
    from the transcript after commitment."""
    import hashlib

    h = hashlib.sha256()
    for name in sorted(traces):
        h.update(name.encode())
        arr = np.ascontiguousarray(np.asarray(traces[name], dtype=_U64))
        h.update(arr.tobytes())
    h.update(bytes(int(v) % 256 for v in publics))
    seed = h.digest()
    out = []
    for i in range(2):
        hi = hashlib.sha256(seed + bytes([i])).digest()
        vals = [int.from_bytes(hi[8 * j:8 * j + 8], "big") % P
                for j in range(4)]
        out.append([(vals[0], vals[1]), (vals[2], vals[3])])
    return out


def witness_check(compiled, public_inputs: Dict[int, int],
                  verbose: bool = False) -> bool:
    """Full-system witness check for a CompiledCircuit: generate the
    witness, build every table trace, evaluate all constraints on the trace
    domain, and check the bus balances against the public byte stream.

    Returns True iff the witness satisfies everything a verifier would
    enforce. Witness-generation exceptions propagate (callers treating any
    failure as 'rejected' should also catch those)."""
    from ..field.extension import GFp2 as F2

    vals = compiled.generate_witness(public_inputs)
    traces = compiled.traces(vals)
    names = compiled._table_names()
    airs = compiled.airs()
    ok = True
    for name, air in zip(names, airs):
        fails = check_air_on_trace(air, traces[name])
        if fails:
            ok = False
            if verbose:
                print(f"[witness_check] table {name}: "
                      f"{len(fails)} failing constraints, first {fails[:3]}")
            else:
                return False
    publics = compiled.public_values(vals)
    for challenges in _derive_challenges(traces, publics):
        total = (0, 0)
        for name, air in zip(names, airs):
            total = F2.add(total, bus_total_host(air, traces[name],
                                                 challenges))
        gamma, delta = challenges
        for channel, args, sign in compiled.public_messages(publics):
            term = _message_term(channel, args, gamma, delta)
            if sign < 0:
                term = F2.sub((0, 0), term)
            total = F2.add(total, term)
        if total != (0, 0):
            if verbose:
                print("[witness_check] bus balance failed")
            return False
    return ok
