"""BlobstreamX contract state machine — parity with reference
contracts/src/BlobstreamX.sol (R14), modeled natively so the operator loop
and attestation path can run end-to-end without an EVM.

The Solidity source in contracts/ mirrors this logic for on-chain
deployment; this model is the behavioral spec the tests drive
(commitHeaderRange: BlobstreamX.sol:131-182, commitNextHeader: :205-250,
verifyAttestation: :255-281).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..tendermint import merkle
from ..tendermint.header import encode_data_root_tuple


class ContractError(Exception):
    pass


@dataclass
class DataRootTuple:
    height: int
    data_root: bytes

    def abi_encode(self) -> bytes:
        return encode_data_root_tuple(self.height, self.data_root)


@dataclass
class BinaryMerkleProof:
    side_nodes: List[bytes]
    key: int
    num_leaves: int


@dataclass
class BlobstreamXContract:
    """Reference BlobstreamX.sol storage layout (:13-38)."""

    genesis_height: int
    genesis_header: bytes
    data_commitment_max: int = 10000
    latest_block: int = 0
    state_proof_nonce: int = 1
    block_height_to_header_hash: Dict[int, bytes] = field(default_factory=dict)
    state_data_commitments: Dict[int, bytes] = field(default_factory=dict)
    frozen: bool = False
    events: List[Tuple] = field(default_factory=list)

    def __post_init__(self):
        self.latest_block = self.genesis_height
        self.block_height_to_header_hash[self.genesis_height] = self.genesis_header

    def _not_frozen(self):
        if self.frozen:
            raise ContractError("ContractFrozen")

    # -- guardian ops (:71-96) -------------------------------------------
    def update_freeze(self, frozen: bool):
        self.frozen = frozen

    def update_genesis_state(self, height: int, header: bytes):
        self.block_height_to_header_hash[height] = header
        self.latest_block = height
        self.state_proof_nonce = 1
        self.state_data_commitments.clear()

    # -- commits (:131-182, :205-250) -------------------------------------
    def commit_header_range(self, trusted_block: int, target_block: int,
                            target_header: bytes, data_commitment: bytes):
        self._not_frozen()
        if trusted_block != self.latest_block:
            raise ContractError("TrustedHeaderMismatch")
        trusted_header = self.block_height_to_header_hash.get(trusted_block)
        if trusted_header is None:
            raise ContractError("TrustedHeaderNotFound")
        if not (trusted_block < target_block
                <= trusted_block + self.data_commitment_max):
            raise ContractError("TargetBlockNotInRange")
        self.block_height_to_header_hash[target_block] = target_header
        self.state_data_commitments[self.state_proof_nonce] = data_commitment
        self.events.append(
            ("HeadUpdate", target_block, target_header)
        )
        self.events.append(
            ("DataCommitmentStored", self.state_proof_nonce, trusted_block,
             target_block, data_commitment)
        )
        self.state_proof_nonce += 1
        self.latest_block = target_block

    def commit_next_header(self, trusted_block: int, next_header: bytes,
                           data_commitment: bytes):
        self._not_frozen()
        if trusted_block != self.latest_block:
            raise ContractError("TrustedHeaderMismatch")
        if self.block_height_to_header_hash.get(trusted_block) is None:
            raise ContractError("TrustedHeaderNotFound")
        next_block = trusted_block + 1
        self.block_height_to_header_hash[next_block] = next_header
        self.state_data_commitments[self.state_proof_nonce] = data_commitment
        self.events.append(("HeadUpdate", next_block, next_header))
        self.events.append(
            ("DataCommitmentStored", self.state_proof_nonce, trusted_block,
             next_block, data_commitment)
        )
        self.state_proof_nonce += 1
        self.latest_block = next_block

    # -- consumer query (:255-281) ----------------------------------------
    def verify_attestation(self, proof_nonce: int, tuple_: DataRootTuple,
                           proof: BinaryMerkleProof) -> bool:
        if self.frozen:
            raise ContractError("ContractFrozen")
        if proof_nonce == 0 or proof_nonce >= self.state_proof_nonce:
            return False
        root = self.state_data_commitments[proof_nonce]
        return _binary_merkle_verify(
            root, proof, tuple_.abi_encode()
        )


def _binary_merkle_verify(root: bytes, proof: BinaryMerkleProof,
                          data: bytes) -> bool:
    """celestiaorg BinaryMerkleTree.verify semantics over RFC-6962 trees
    with arbitrary (non-power-of-two) leaf counts."""
    if proof.key >= proof.num_leaves:
        return False
    node = merkle.leaf_hash(data)
    key, num = proof.key, proof.num_leaves
    i = 0
    # reconstruct following the recursive split used at build time
    def climb(key: int, num: int) -> Optional[bytes]:
        nonlocal i
        if num == 1:
            return merkle.leaf_hash(data)
        k = merkle.split_point(num)
        if key < k:
            left = climb(key, k)
            if i >= len(proof.side_nodes):
                return None
            right = proof.side_nodes[i]
            i += 1
            return merkle.inner_hash(left, right) if left else None
        else:
            sub = climb(key - k, num - k)
            if i >= len(proof.side_nodes):
                return None
            left = proof.side_nodes[i]
            i += 1
            return merkle.inner_hash(left, sub) if sub else None

    got = climb(key, num)
    return got == root and i == len(proof.side_nodes)


def data_root_inclusion_proof(tuples: List[DataRootTuple], index: int
                              ) -> BinaryMerkleProof:
    """Build the BinaryMerkleProof a rollup submits to verifyAttestation."""
    items = [t.abi_encode() for t in tuples]
    _, proofs = merkle.proofs_from_byte_slices(items)
    # proofs_from_byte_slices returns aunts leaf->root; the contract's
    # verify walks root->leaf recursion, consuming in that order
    aunts = proofs[index]
    return BinaryMerkleProof(
        side_nodes=list(aunts), key=index, num_leaves=len(items)
    )
