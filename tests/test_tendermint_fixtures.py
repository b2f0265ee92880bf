"""Bit-exact parity with the reference fixtures (/root/reference, read-only).

These are the golden public-output tests demanded by SURVEY.md section 4:
header hashes, header-chain linkage, and data-commitment roots must equal
the recorded mocha-4 chain data exactly.
"""

import json
import os

import pytest

from blobstreamx_tpu.tendermint import merkle
from blobstreamx_tpu.tendermint.header import (
    Header,
    data_commitment_root,
    encode_data_root_tuple,
)

from blobstreamx_tpu.circuits.input import DEFAULT_FIXTURES as FIXTURES

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not mounted"
)


def load_header(h: int) -> Header:
    with open(f"{FIXTURES}/{h}/header.json") as f:
        return Header.from_json(json.load(f)["result"]["header"])


def load_signed(h: int) -> dict:
    with open(f"{FIXTURES}/{h}/signed_block.json") as f:
        return json.load(f)["result"]


def test_header_hash_chain():
    for h in [10001, 10002, 10003, 10004]:
        prev = load_header(h - 1)
        want = load_signed(h)["header"]["last_block_id"]["hash"]
        assert prev.hash().hex().upper() == want


def test_commit_block_id_matches_header_hash():
    for h in [10000, 10001, 10004]:
        sb = load_signed(h)
        hdr = Header.from_json(sb["header"])
        assert hdr.hash().hex().upper() == sb["commit"]["block_id"]["hash"]


@pytest.mark.parametrize(
    "rng", ["10000-10001", "10000-10002", "10000-10004", "10002-10004"]
)
def test_data_commitment_roots(rng):
    s, e = map(int, rng.split("-"))
    dhs = [load_header(h).data_hash for h in range(s, e)]
    root = data_commitment_root(s, dhs).hex().upper()
    with open(f"{FIXTURES}/{rng}/data_commitment.json") as f:
        want = json.load(f)["result"]["data_commitment"]
    assert root == want


def test_inclusion_proofs():
    h0, h1 = load_header(10000), load_header(10001)
    leaf, aunts = h0.data_hash_proof()
    assert len(leaf) == 34 and len(aunts) == 4
    assert leaf[2:34] == h0.data_hash
    assert merkle.verify_inclusion(h0.hash(), leaf, 6, aunts)
    leaf2, aunts2 = h1.last_block_id_proof()
    assert len(leaf2) == 72
    assert leaf2[2:34] == h0.hash()  # chain linkage through the leaf bytes
    assert merkle.verify_inclusion(h1.hash(), leaf2, 4, aunts2)


def test_encode_data_root_tuple():
    enc = encode_data_root_tuple(256, b"\xff" * 32)
    assert enc == bytes(30) + b"\x01\x00" + b"\xff" * 32


def test_root_from_enabled_leaves_equals_rfc6962():
    leaves = [bytes([i]) * 64 for i in range(8)]
    for n in range(1, 9):
        assert merkle.root_from_enabled_leaves(leaves, n) == merkle.hash_from_byte_slices(
            leaves[:n]
        )
