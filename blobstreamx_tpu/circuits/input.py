"""Witness input layer — parity with reference circuits/input.rs (R6) and the
tendermintx InputDataFetcher it extends (D16). Fixture mode reads the same
JSON formats as the reference (`{fixture_path}/{height}/header.json`,
`{fixture_path}/{start}-{end}/data_commitment.json`).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from ..tendermint.header import Header
from . import consts

DEFAULT_FIXTURES = "/root/reference/circuits/fixtures/mocha-4"


@dataclass
class DataCommitmentInputs:
    start_header_hash: bytes
    end_header_hash: bytes
    data_hash_proofs: List[Tuple[bytes, List[bytes]]]  # (leaf, aunts)
    last_block_id_proofs: List[Tuple[bytes, List[bytes]]]
    expected_data_commitment: Optional[bytes]


class InputDataFetcher:
    """Fixture/RPC witness acquisition. RPC mode lives in runtime/rpc.py;
    this class covers the deterministic fixture path used by tests."""

    def __init__(self, fixture_path: str = DEFAULT_FIXTURES):
        self.fixture_path = fixture_path
        self._header_cache: Dict[int, Header] = {}

    def get_header(self, height: int) -> Header:
        if height not in self._header_cache:
            with open(os.path.join(self.fixture_path, str(height), "header.json")) as f:
                data = json.load(f)["result"]["header"]
            self._header_cache[height] = Header.from_json(data)
        return self._header_cache[height]

    def get_data_commitment(self, start: int, end: int) -> Optional[bytes]:
        path = os.path.join(
            self.fixture_path, f"{start}-{end}", "data_commitment.json"
        )
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return bytes.fromhex(json.load(f)["result"]["data_commitment"])

    def get_data_commitment_inputs(
        self, start_block: int, end_block: int, max_leaves: int
    ) -> DataCommitmentInputs:
        """Reference circuits/input.rs:149-271 (fixture branch): data-hash
        proofs for [start, end-1], last-block-id proofs for [start+1, end],
        zero-padded to max_leaves."""
        assert end_block - start_block <= max_leaves
        if end_block <= start_block:
            zero32 = bytes(32)
            dummy = [
                (bytes(consts.PROTOBUF_HASH_SIZE_BYTES), [zero32] * consts.HEADER_PROOF_DEPTH)
                for _ in range(max_leaves)
            ]
            dummy2 = [
                (bytes(consts.PROTOBUF_BLOCK_ID_SIZE_BYTES), [zero32] * consts.HEADER_PROOF_DEPTH)
                for _ in range(max_leaves)
            ]
            return DataCommitmentInputs(zero32, zero32, dummy, dummy2, None)
        data_hash_proofs = []
        last_block_id_proofs = []
        for h in range(start_block, end_block):
            data_hash_proofs.append(self.get_header(h).data_hash_proof())
        for h in range(start_block + 1, end_block + 1):
            last_block_id_proofs.append(self.get_header(h).last_block_id_proof())
        zero32 = bytes(32)
        while len(data_hash_proofs) < max_leaves:
            data_hash_proofs.append(
                (bytes(consts.PROTOBUF_HASH_SIZE_BYTES), [zero32] * consts.HEADER_PROOF_DEPTH)
            )
            last_block_id_proofs.append(
                (bytes(consts.PROTOBUF_BLOCK_ID_SIZE_BYTES), [zero32] * consts.HEADER_PROOF_DEPTH)
            )
        start_header = self.get_header(start_block).hash()
        end_header = self.get_header(end_block).hash()
        return DataCommitmentInputs(
            start_header_hash=start_header,
            end_header_hash=end_header,
            data_hash_proofs=data_hash_proofs,
            last_block_id_proofs=last_block_id_proofs,
            expected_data_commitment=self.get_data_commitment(start_block, end_block),
        )


def flatten_inputs(inp: DataCommitmentInputs) -> List[int]:
    """Byte list matching vars.proof_wires fill order."""
    out = list(inp.start_header_hash) + list(inp.end_header_hash)
    for leaf, aunts in inp.data_hash_proofs:
        out += list(leaf)
        for a in aunts:
            out += list(a)
    for leaf, aunts in inp.last_block_id_proofs:
        out += list(leaf)
        for a in aunts:
            out += list(a)
    return out
