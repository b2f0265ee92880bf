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


class SubprocessProverService:
    """Process-isolated prover service — the hosted platform's model: each
    proof request runs in its own prover process (reference succinct.json
    per-entrypoint binaries + `PROVE_BINARY_0x<id>` env routing,
    .env.example:24-25), so a crashed or OOM'd prove never takes the
    operator down, and requests run concurrently across processes/hosts.

    Each registered function id maps to an entrypoint name; a request
    writes `input.json`, launches `python -m
    blobstreamx_tpu.runtime.entrypoints <name> prove input.json` in a
    scratch directory (env: BLOBSTREAMX_SCALE / BLOBSTREAMX_CFG /
    BLOBSTREAMX_BUILD_DIR forwarded), and `get_request` reaps the
    process and parses `output.json`. `command` can be overridden per
    registration (the reference's PROVE_BINARY override)."""

    def __init__(self, workdir: Optional[str] = None,
                 env: Optional[Dict[str, str]] = None):
        import os
        import tempfile

        self.workdir = workdir or tempfile.mkdtemp(prefix="bsx-prover-")
        self.env = dict(env or {})
        self.entrypoints: Dict[bytes, Tuple[str, Optional[List[str]]]] = {}
        self.requests: Dict[str, ProofRequest] = {}
        self._procs: Dict[str, object] = {}
        self._dirs: Dict[str, str] = {}
        os.makedirs(self.workdir, exist_ok=True)

    def register(self, function_id: bytes, entrypoint: str,
                 command: Optional[List[str]] = None):
        """command: argv prefix run as `command prove input.json`; defaults
        to this interpreter's entrypoints CLI for `entrypoint`."""
        self.entrypoints[function_id] = (entrypoint, command)

    def submit_request(self, function_id: bytes, input_bytes: bytes) -> str:
        import json
        import os
        import subprocess
        import sys

        rid = hashlib.sha256(
            function_id + input_bytes + str(len(self.requests)).encode()
        ).hexdigest()[:16]
        req = ProofRequest(rid, function_id, input_bytes)
        self.requests[rid] = req
        ent = self.entrypoints.get(function_id)
        if ent is None:
            req.status, req.error = "failure", "unknown function id"
            return rid
        name, command = ent
        rdir = os.path.join(self.workdir, rid)
        os.makedirs(rdir, exist_ok=True)
        with open(os.path.join(rdir, "input.json"), "w") as fh:
            json.dump({"data": {"input": "0x" + input_bytes.hex()}}, fh)
        argv = list(command) if command else [
            sys.executable, "-m", "blobstreamx_tpu.runtime.entrypoints", name]
        env = {**os.environ, **self.env}
        req.status = "pending"
        self._dirs[rid] = rdir
        self._procs[rid] = subprocess.Popen(
            argv + ["prove", "input.json"], cwd=rdir, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
        req.wall_seconds = time.time()
        return rid

    def get_request(self, request_id: str,
                    timeout: Optional[float] = None) -> ProofRequest:
        """Reap the prover process (blocking up to `timeout`) and parse
        output.json. Safe to call repeatedly; terminal states stick."""
        import json
        import os

        req = self.requests[request_id]
        proc = self._procs.get(request_id)
        if req.status != "pending" or proc is None:
            return req
        try:
            rc = proc.wait(timeout=timeout)
        except Exception:
            return req  # still running
        req.wall_seconds = time.time() - req.wall_seconds
        out_path = os.path.join(self._dirs[request_id], "output.json")
        if rc != 0 or not os.path.exists(out_path):
            err = proc.stderr.read().decode(errors="replace")[-2000:]
            req.status, req.error = "failure", f"rc={rc}: {err}"
            return req
        with open(out_path) as fh:
            out = json.load(fh)
        hexs = out["data"]["output"]
        req.output_bytes = bytes.fromhex(
            hexs[2:] if hexs.startswith("0x") else hexs)
        req.proof = out["data"].get("proof")
        req.status = "success"
        return req
