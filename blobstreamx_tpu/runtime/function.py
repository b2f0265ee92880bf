"""Function CLI — parity with the reference's Plonky2xFunction entrypoint
(SURVEY.md D17; reference bin/header_range_1024.rs:10-16, succinct.json).

Each circuit entrypoint exposes:
  build                — construct the circuit, build the preprocessed
                         oracles/verifier keys, write them to build/
  prove <input.json>   — read {"data": {"input": "0x..."}} ABI-packed bytes,
                         run the prover, write output.json with the proof
                         and ABI-packed output bytes

Artifact formats mirror the reference platform contract: input/output hex
byte strings plus a JSON proof.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Callable

from ..proof import serde, stark


def entrypoint(circuit_factory: Callable[[], object], name: str,
               argv=None, cfg: stark.StarkConfig = None,
               build_dir: str = "build"):
    """Run the build/prove CLI for a circuit entrypoint.

    circuit_factory() -> object with .circuit (CompiledCircuit); the
    public output bytes are everything written after the public inputs.
    """
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in ("build", "prove"):
        print(f"usage: {name} build | prove <input.json>")
        return 2
    os.makedirs(build_dir, exist_ok=True)
    key_path = os.path.join(build_dir, f"{name}.keys")
    if argv[0] == "build":
        t0 = time.time()
        circ = circuit_factory()
        if hasattr(circ, "build_function_keys"):
            # orchestrated multi-proof entrypoint (e.g. HeaderRangeSuccinct:
            # skip + map + reduce tree + join): one keys file per stage
            tables = circ.build_function_keys(build_dir, name, cfg)
        else:
            pks, vks = circ.circuit.build_keys(cfg)
            serde.save_keys(key_path, pks, vks)
            tables = circ.circuit._table_names()
        meta = {
            "name": name,
            "n_public_inputs": _n_inputs(circ),
            "tables": tables,
        }
        with open(os.path.join(build_dir, f"{name}.json"), "w") as f:
            json.dump(meta, f)
        print(f"built {name} in {time.time() - t0:.1f}s -> {key_path}")
        return 0

    # prove
    with open(argv[1]) as f:
        req = json.load(f)
    input_hex = req["data"]["input"]
    input_bytes = bytes.fromhex(input_hex[2:] if input_hex.startswith("0x") else input_hex)
    circ = circuit_factory()
    t0 = time.time()
    if hasattr(circ, "prove_function"):
        proof, publics = circ.prove_function(input_bytes, cfg=cfg,
                                             build_dir=build_dir, name=name)
    else:
        pks = None
        if os.path.exists(key_path):
            pks, _ = serde.load_keys(key_path)
        pub_in = {i: v for i, v in enumerate(input_bytes)}
        proof, publics = circ.circuit.prove(pub_in, cfg, pks)
    n_in = len(input_bytes)
    output_bytes = bytes(publics[n_in:])
    out = {
        "type": "res_bytes",
        "data": {
            "input": "0x" + input_bytes.hex(),
            "output": "0x" + output_bytes.hex(),
            "proof": serde.system_proof_to_json(proof),
            "prove_seconds": time.time() - t0,
        },
    }
    with open("output.json", "w") as f:
        json.dump(out, f)
    print(f"proved {name} in {time.time() - t0:.1f}s -> output.json")
    return 0


def _n_inputs(circ) -> int:
    """Public input byte count (inputs precede outputs in the stream) —
    tracked by the builder's evm_read_* calls (frontend/builder.py)."""
    return circ.circuit.n_public_inputs
