"""End-to-end: DataCommitmentCircuit witness + full 3-table proof vs fixtures.

This is the round-1 "minimum end-to-end slice" gate from SURVEY.md section 7
item 5: circuit root == reference data_commitment.json bit-exactly and the
proof self-verifies.
"""

import os

import pytest

from blobstreamx_tpu.circuits.data_commitment import DataCommitmentCircuit
from blobstreamx_tpu.proof import stark

from blobstreamx_tpu.circuits.input import DEFAULT_FIXTURES as FIXTURES
pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not mounted"
)

CFG = stark.StarkConfig(
    rate_bits=3, cap_height=1, num_query_rounds=8, pow_bits=4, final_poly_bits=2
)


@pytest.fixture(scope="module")
def circuit():
    return DataCommitmentCircuit(max_leaves=2)


def test_witness_root_matches_fixture(circuit):
    c = circuit
    f = c.fetcher
    sh, eh = f.get_header(10000).hash(), f.get_header(10002).hash()
    pub_in = c.make_public_inputs(10000, sh, 10002, eh)
    vals = c.circuit.generate_witness(pub_in)
    root = bytes(c.circuit.public_values(vals)[80:112])
    assert root == f.get_data_commitment(10000, 10002)


def test_witness_partial_range(circuit):
    """Range shorter than max_leaves (enabled-leaf logic)."""
    c = circuit
    f = c.fetcher
    sh, eh = f.get_header(10000).hash(), f.get_header(10001).hash()
    pub_in = c.make_public_inputs(10000, sh, 10001, eh)
    vals = c.circuit.generate_witness(pub_in)
    root = bytes(c.circuit.public_values(vals)[80:112])
    assert root == f.get_data_commitment(10000, 10001)


@pytest.mark.slow
def test_full_proof_roundtrip(circuit):
    c = circuit
    proof, publics, root = c.prove(10000, 10002, CFG)
    assert root == c.fetcher.get_data_commitment(10000, 10002)
    assert c.verify(proof, publics, CFG)
    # forged root must fail
    bad = list(publics)
    bad[80] = (bad[80] + 1) % 256
    assert not c.verify(proof, bad, CFG)
