"""Python behavioral model of contracts/src/StarkGateway.sol — the proof
gateway serving ISuccinctGateway.verifiedCall to the light client
(reference: the external SuccinctGateway behind
/root/reference/contracts/src/BlobstreamX.sol:149-152).

Mirrors the Solidity semantics statement-for-statement (allowlist,
write-once fulfillments keyed by (functionId, sha256(input)), owner-only
revoke) so the gateway flow is testable next to the BlobstreamXContract
model (runtime/contract.py).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


class GatewayError(Exception):
    pass


@dataclass
class Fulfillment:
    output_hash: bytes
    proof_commitment: bytes
    output: bytes


@dataclass
class StarkGatewayModel:
    owner: str = "owner"
    allowed_provers: Dict[str, bool] = field(default_factory=dict)
    fulfillments: Dict[Tuple[bytes, bytes], Fulfillment] = field(
        default_factory=dict)
    events: List[tuple] = field(default_factory=list)

    def __post_init__(self):
        self.allowed_provers[self.owner] = True

    def set_prover(self, sender: str, prover: str, allowed: bool):
        if sender != self.owner:
            raise GatewayError("NotAllowed")
        self.allowed_provers[prover] = allowed

    def fulfill(self, sender: str, function_id: bytes, input_bytes: bytes,
                output: bytes, proof_root: bytes) -> bytes:
        """StarkGateway.fulfill: allowlisted + write-once."""
        if not self.allowed_provers.get(sender):
            raise GatewayError("NotAllowed")
        input_hash = hashlib.sha256(input_bytes).digest()
        key = (function_id, input_hash)
        if key in self.fulfillments:
            raise GatewayError("AlreadyFulfilled")
        output_hash = hashlib.sha256(output).digest()
        commitment = hashlib.sha256(
            function_id + input_hash + output_hash + proof_root).digest()
        self.fulfillments[key] = Fulfillment(output_hash, commitment,
                                             bytes(output))
        self.events.append(("ProofFulfilled", function_id, input_hash,
                            output_hash, commitment))
        return commitment

    def revoke(self, sender: str, function_id: bytes, input_hash: bytes):
        if sender != self.owner:
            raise GatewayError("NotAllowed")
        self.fulfillments.pop((function_id, input_hash), None)

    def verified_call(self, function_id: bytes, input_bytes: bytes) -> bytes:
        input_hash = hashlib.sha256(input_bytes).digest()
        f = self.fulfillments.get((function_id, input_hash))
        if f is None:
            raise GatewayError("NotFulfilled")
        return f.output

    def proof_commitment_of(self, function_id: bytes,
                            input_bytes: bytes) -> Optional[bytes]:
        input_hash = hashlib.sha256(input_bytes).digest()
        f = self.fulfillments.get((function_id, input_hash))
        return f.proof_commitment if f else None
