"""Native Tendermint crypto layer vs reference fixtures (SURVEY.md D11/D13-D15).

Validator-set hashing, canonical-vote sign-bytes and Ed25519 verification
must be bit-exact against the recorded mocha-4 signed blocks.
"""

import json
import os

import pytest

from blobstreamx_tpu.tendermint import ed25519, header as hdr, vote

from blobstreamx_tpu.circuits.input import DEFAULT_FIXTURES as FIXTURES
pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not mounted"
)


def load_block(height: int) -> dict:
    with open(f"{FIXTURES}/{height}/signed_block.json") as f:
        return json.load(f)["result"]


@pytest.mark.parametrize("height", [10000, 10001, 10002, 10003, 10004])
def test_validator_set_hash_matches_header(height):
    d = load_block(height)
    vals = [vote.Validator.from_json(v) for v in d["validator_set"]["validators"]]
    assert vote.validator_set_hash(vals).hex().upper() == d["header"]["validators_hash"]


@pytest.mark.parametrize("height", [10000, 10002, 10004])
def test_commit_signatures_verify(height):
    d = load_block(height)
    commit = vote.Commit.from_json(d["commit"])
    vals = [vote.Validator.from_json(v) for v in d["validator_set"]["validators"]]
    assert commit.block_id_hash == hdr.Header.from_json(d["header"]).hash()
    results = vote.verify_commit(commit, vals, d["header"]["chain_id"])
    assert all(results) and len(results) == len(commit.signatures)


def test_forged_signature_rejected():
    d = load_block(10000)
    commit = vote.Commit.from_json(d["commit"])
    vals = [vote.Validator.from_json(v) for v in d["validator_set"]["validators"]]
    sig = bytearray(commit.signatures[0].signature)
    sig[5] ^= 1
    commit.signatures[0].signature = bytes(sig)
    assert not vote.verify_commit(commit, vals, d["header"]["chain_id"])[0]


def test_wrong_message_rejected():
    d = load_block(10000)
    commit = vote.Commit.from_json(d["commit"])
    vals = [vote.Validator.from_json(v) for v in d["validator_set"]["validators"]]
    commit.signatures[0].time_nanos ^= 1  # message differs -> sig invalid
    assert not vote.verify_commit(commit, vals, d["header"]["chain_id"])[0]


def test_is_valid_skip_thresholds():
    d = load_block(10004)
    commit = vote.Commit.from_json(d["commit"])
    trusted = [vote.Validator.from_json(v) for v in load_block(10000)["validator_set"]["validators"]]
    assert vote.is_valid_skip(trusted, commit, d["header"]["chain_id"])


def test_ed25519_rfc8032_vector():
    # RFC 8032 test vector 2 (1-byte message)
    pk = bytes.fromhex(
        "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c"
    )
    msg = bytes.fromhex("72")
    sig = bytes.fromhex(
        "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da"
        "085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00"
    )
    assert ed25519.verify(pk, msg, sig)
    assert not ed25519.verify(pk, msg + b"x", sig)
    bad = bytearray(sig)
    bad[0] ^= 1
    assert not ed25519.verify(pk, msg, bytes(bad))


def test_scalar_mul_matches_double_and_add_shape():
    # witness helper consistency: [s]B == R + [k]A for a real signature
    d = load_block(10000)
    commit = vote.Commit.from_json(d["commit"])
    vals = [vote.Validator.from_json(v) for v in d["validator_set"]["validators"]]
    by_addr = {v.address: v for v in vals}
    s0 = commit.signatures[0]
    v = by_addr[s0.validator_address]
    msg = commit.vote_sign_bytes(d["header"]["chain_id"], 0)
    w = ed25519.verify_witness(v.pub_key, msg, s0.signature)
    assert w.valid
    assert w.k == w.k512 % ed25519.L
