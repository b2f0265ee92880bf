"""Proof (de)serialization — parity with the reference's artifact model
(SURVEY.md D17: build/prove CLI artifacts; §4 serializer round-trips).

Proofs serialize to pure-JSON structures (ints/lists/strings only) so a
verifier in any language can consume them; prover/verifier keys serialize
with numpy (the preprocessed oracles are large tables).
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from . import fri, stark, system


# -- FRI ---------------------------------------------------------------------

def _fri_proof_to_json(p: fri.FriProof) -> dict:
    return {
        "caps": p.caps,
        "final_coeffs": [list(c) for c in p.final_coeffs],
        "pow_nonce": p.pow_nonce,
        "query_rounds": [
            [
                {
                    "pair_values": np.asarray(s.pair_values).tolist(),
                    "siblings": [np.asarray(x).tolist() for x in s.siblings],
                }
                for s in round_
            ]
            for round_ in p.query_rounds
        ],
    }


def _fri_proof_from_json(d: dict) -> fri.FriProof:
    return fri.FriProof(
        caps=d["caps"],
        final_coeffs=[tuple(c) for c in d["final_coeffs"]],
        pow_nonce=d["pow_nonce"],
        query_rounds=[
            [
                fri.FriQueryStep(
                    pair_values=np.asarray(s["pair_values"], dtype=np.uint32),
                    siblings=[np.asarray(x, dtype=np.uint32) for x in s["siblings"]],
                )
                for s in round_
            ]
            for round_ in d["query_rounds"]
        ],
    )


# -- STARK -------------------------------------------------------------------

def _opened_row_to_json(r: stark.OpenedRow) -> dict:
    return {"values": r.values, "siblings": r.siblings}


def _opened_row_from_json(d: dict) -> stark.OpenedRow:
    return stark.OpenedRow(values=d["values"], siblings=d["siblings"])


def _openings_to_json(openings) -> dict:
    return {str(k): [list(v) for v in vals] for k, vals in openings.items()}


def _openings_from_json(d: dict) -> dict:
    return {int(k): [tuple(v) for v in vals] for k, vals in d.items()}


def stark_proof_to_json(p: stark.StarkProof) -> dict:
    return {
        "n_rows": p.n_rows,
        "main_cap": p.main_cap,
        "aux_cap": p.aux_cap,
        "quotient_cap": p.quotient_cap,
        "main_openings": _openings_to_json(p.main_openings),
        "aux_openings": _openings_to_json(p.aux_openings),
        "pre_openings": _openings_to_json(p.pre_openings),
        "quotient_zeta": [list(v) for v in p.quotient_zeta],
        "fri_proof": _fri_proof_to_json(p.fri_proof),
        "query_openings": [
            {k: _opened_row_to_json(v) for k, v in entry.items()}
            for entry in p.query_openings
        ],
    }


def stark_proof_from_json(d: dict) -> stark.StarkProof:
    return stark.StarkProof(
        n_rows=d["n_rows"],
        main_cap=d["main_cap"],
        aux_cap=d["aux_cap"],
        quotient_cap=d["quotient_cap"],
        main_openings=_openings_from_json(d["main_openings"]),
        aux_openings=_openings_from_json(d["aux_openings"]),
        pre_openings=_openings_from_json(d["pre_openings"]),
        quotient_zeta=[tuple(v) for v in d["quotient_zeta"]],
        fri_proof=_fri_proof_from_json(d["fri_proof"]),
        query_openings=[
            {k: _opened_row_from_json(v) for k, v in entry.items()}
            for entry in d["query_openings"]
        ],
    )


# -- system ------------------------------------------------------------------

def system_proof_to_json(p: system.SystemProof) -> dict:
    return {
        "table_proofs": [stark_proof_to_json(tp) for tp in p.table_proofs],
        "bus_totals": [list(t) if t is not None else None for t in p.bus_totals],
    }


def system_proof_from_json(d: dict) -> system.SystemProof:
    return system.SystemProof(
        table_proofs=[stark_proof_from_json(tp) for tp in d["table_proofs"]],
        bus_totals=[tuple(t) if t is not None else None for t in d["bus_totals"]],
    )


def dumps(p: system.SystemProof) -> str:
    return json.dumps(system_proof_to_json(p))


def loads(s: str) -> system.SystemProof:
    return system_proof_from_json(json.loads(s))


# -- keys --------------------------------------------------------------------

def save_keys(path: str, pks, vks):
    """Persist build artifacts (preprocessed oracles + verifier caps)."""
    import pickle

    from . import merkle_cap

    blob = []
    for pk, vk in zip(pks, vks):
        if pk.pre_rows_np is None:
            blob.append(None)
        else:
            blob.append({
                "pre_rows": np.asarray(pk.pre_rows_np),
                "pre_coeffs": np.asarray(pk.pre_coeffs),
                "tree_levels": [np.asarray(l) for l in pk.pre_tree.layers],
                "cap_height": pk.pre_tree.cap_height,
                "vk_cap": vk.pre_cap,
            })
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_keys(path: str):
    import pickle

    import jax.numpy as jnp

    from . import merkle_cap
    from .stark import ProverKey, VerifierKey

    with open(path, "rb") as f:
        blob = pickle.load(f)
    pks, vks = [], []
    for entry in blob:
        if entry is None:
            pks.append(ProverKey(None, None, None))
            vks.append(VerifierKey(None))
            continue
        tree = merkle_cap.MerkleTree(
            layers=[np.asarray(l) for l in entry["tree_levels"]],
            cap_height=entry["cap_height"],
        )
        pks.append(ProverKey(
            entry["pre_rows"], jnp.asarray(entry["pre_coeffs"]), tree
        ))
        vks.append(VerifierKey(entry["vk_cap"]))
    return pks, vks
