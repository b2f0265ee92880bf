"""EVM wrapper: package a SystemProof for on-chain fulfillment (D17's
missing half — reference WRAPPER_BINARY, .env.example:26, wrapping the
final proof for ISuccinctGateway.verifiedCall,
contracts/src/BlobstreamX.sol:149-152).

Stage 1 (this module + contracts/src/StarkGateway.sol): the proof is
content-addressed — `proof_root` is a Poseidon sponge over the canonical
serialization of the proof, and the on-chain commitment binds
(function_id, input, output, proof_root). Anyone can fetch the proof blob
by its root and re-verify it off-chain against the exact on-chain
statement; the gateway trusts an allowlisted relayer for liveness only,
with attributable fraud. Stage 2 (docs/EVM_VERIFICATION.md) swaps the
allowlist for an on-chain verifier of the recursively-aggregated proof
(proof/recursion.py) without changing this artifact format.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import List

from ..field import goldilocks as gl
from ..ops import poseidon as pos
from . import serde


@dataclass
class WrappedProof:
    function_id: bytes      # 32
    input_bytes: bytes
    output_bytes: bytes
    proof_root: bytes       # 32: Poseidon digest of the serialized proof
    proof_blob: bytes       # canonical JSON serialization
    commitment: bytes       # 32: the on-chain binding

    def to_json(self) -> dict:
        return {
            "function_id": "0x" + self.function_id.hex(),
            "input": "0x" + self.input_bytes.hex(),
            "output": "0x" + self.output_bytes.hex(),
            "proof_root": "0x" + self.proof_root.hex(),
            "commitment": "0x" + self.commitment.hex(),
            "proof": json.loads(self.proof_blob),
        }


def _poseidon_root(blob: bytes) -> bytes:
    """Poseidon sponge over the blob packed into field elements (7 bytes
    per element keeps values < p)."""
    elems: List[int] = []
    for off in range(0, len(blob), 7):
        elems.append(int.from_bytes(blob[off:off + 7], "big"))
    elems.append(len(blob))
    digest = pos.hash_no_pad_ref(elems)
    out = b"".join(int(v).to_bytes(8, "big") for v in digest)
    return out


def commitment_of(function_id: bytes, input_bytes: bytes,
                  output_bytes: bytes, proof_root: bytes) -> bytes:
    """Mirrors StarkGateway.fulfill's binding."""
    return hashlib.sha256(
        function_id
        + hashlib.sha256(input_bytes).digest()
        + hashlib.sha256(output_bytes).digest()
        + proof_root
    ).digest()


def wrap(function_id: bytes, input_bytes: bytes, output_bytes: bytes,
         proof) -> WrappedProof:
    """proof: a SystemProof (proof/system.py)."""
    blob = json.dumps(serde.system_proof_to_json(proof),
                      sort_keys=True, separators=(",", ":")).encode()
    root = _poseidon_root(blob)
    return WrappedProof(
        function_id=function_id,
        input_bytes=bytes(input_bytes),
        output_bytes=bytes(output_bytes),
        proof_root=root,
        proof_blob=blob,
        commitment=commitment_of(function_id, input_bytes, output_bytes,
                                 root),
    )


def unwrap_and_check(w: WrappedProof) -> bool:
    """Auditor side: the blob matches the root and the commitment binds."""
    if _poseidon_root(w.proof_blob) != w.proof_root:
        return False
    return commitment_of(w.function_id, w.input_bytes, w.output_bytes,
                         w.proof_root) == w.commitment
