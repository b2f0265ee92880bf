"""Local prover service — parity with the succinct-client request path
(SURVEY.md D18: SuccinctClient::{submit_request, relay_proof}) in local
prove/relay mode (reference .env.example LOCAL_PROVE_MODE/LOCAL_RELAY_MODE).

Requests are keyed by function id; the service routes the ABI-packed input
bytes to the registered circuit, proves (or witness-executes in mock mode),
and stores the result for relay. On TPU pods this is where proof jobs are
scheduled across hosts; the scheduling itself is in parallel/mapreduce.py.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple


@dataclass
class ProofRequest:
    request_id: str
    function_id: bytes
    input_bytes: bytes
    status: str = "pending"  # pending | success | failure
    output_bytes: Optional[bytes] = None
    proof: Optional[object] = None
    error: Optional[str] = None
    wall_seconds: float = 0.0


@dataclass
class RegisteredFunction:
    """One proved function (the reference's per-entrypoint binary)."""

    name: str
    circuit: object            # has .circuit (CompiledCircuit)
    decode_output: Callable    # publics -> output bytes


class LocalProverService:
    """In-process prover service; `mock=True` runs witness generation only
    (output bytes without the STARK proof) for operator-loop tests, mirroring
    how the reference operator never proves in-process (SURVEY.md 3.1)."""

    def __init__(self, mock: bool = False, cfg=None):
        self.functions: Dict[bytes, RegisteredFunction] = {}
        self.requests: Dict[str, ProofRequest] = {}
        self.mock = mock
        self.cfg = cfg

    def register(self, function_id: bytes, func: RegisteredFunction):
        self.functions[function_id] = func

    def submit_request(self, function_id: bytes, input_bytes: bytes) -> str:
        rid = hashlib.sha256(
            function_id + input_bytes + str(len(self.requests)).encode()
        ).hexdigest()[:16]
        req = ProofRequest(rid, function_id, input_bytes)
        self.requests[rid] = req
        self._run(req)
        return rid

    def _run(self, req: ProofRequest):
        t0 = time.time()
        func = self.functions.get(req.function_id)
        if func is None:
            req.status, req.error = "failure", "unknown function id"
            return
        try:
            pub_in = {i: v for i, v in enumerate(req.input_bytes)}
            compiled = func.circuit.circuit
            if self.mock:
                vals = compiled.generate_witness(pub_in)
                publics = compiled.public_values(vals)
            else:
                proof, publics = compiled.prove(pub_in, self.cfg)
                req.proof = proof
            req.output_bytes = func.decode_output(publics)
            req.status = "success"
        except Exception as e:  # surfaced to the operator, not raised
            req.status, req.error = "failure", repr(e)
        req.wall_seconds = time.time() - t0

    def get_request(self, request_id: str) -> ProofRequest:
        return self.requests[request_id]
