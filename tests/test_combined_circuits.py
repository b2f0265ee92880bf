"""End-to-end prove+verify of the flagship combined circuits (R8/R9) with
the full table set (cpu, sha, sha512, ed, range16, pos?, bytes) — the
reference's prove-then-verify test templates
(reference circuits/next_header.rs:130-179, header_range.rs:193-266).

Witness-exactness (hashes/commitments vs fixtures) runs in the fast tier;
the full STARK roundtrips are @slow (minutes of JAX compile on CPU hosts).
"""

import pytest

from blobstreamx_tpu.circuits.header_range import HeaderRangeCircuit
from blobstreamx_tpu.circuits.next_header import NextHeaderCircuit
from blobstreamx_tpu.proof import stark

CFG = stark.StarkConfig(
    rate_bits=3, cap_height=1, num_query_rounds=8, pow_bits=4, final_poly_bits=2
)


@pytest.fixture(scope="module")
def nh():
    return NextHeaderCircuit(vss=2)


@pytest.fixture(scope="module")
def hr():
    return HeaderRangeCircuit(vss=2, nb_map_jobs=1, batch_size=4)


def test_next_header_witness_exact(nh):
    f = nh.fetcher
    pub_in = nh.make_public_inputs(10000, f.get_header(10000).hash())
    vals = nh.circuit.generate_witness(pub_in)
    publics = nh.circuit.public_values(vals)
    assert bytes(publics[40:72]) == f.get_header(10001).hash()
    assert bytes(publics[72:104]) == f.get_data_commitment(10000, 10001)


def test_header_range_witness_exact(hr):
    f = hr.fetcher
    pub_in = hr.make_public_inputs(10000, f.get_header(10000).hash(), 10004)
    vals = hr.circuit.generate_witness(pub_in)
    publics = hr.circuit.public_values(vals)
    assert bytes(publics[48:80]) == f.get_header(10004).hash()
    assert bytes(publics[80:112]) == f.get_data_commitment(10000, 10004)


@pytest.mark.slow
def test_next_header_full_proof_roundtrip(nh):
    proof, publics, next_hash, dc = nh.prove(10000, CFG)
    assert next_hash == nh.fetcher.get_header(10001).hash()
    assert dc == nh.fetcher.get_data_commitment(10000, 10001)
    assert nh.verify(proof, publics, CFG)
    # tampered public output (forged next-header hash) must not verify
    bad = list(publics)
    bad[40] = (bad[40] + 1) % 256
    assert not nh.verify(proof, bad, CFG)


@pytest.mark.slow
def test_header_range_full_proof_roundtrip(hr):
    proof, publics, target_hash, dc = hr.prove(10000, 10004, CFG)
    assert target_hash == hr.fetcher.get_header(10004).hash()
    assert dc == hr.fetcher.get_data_commitment(10000, 10004)
    assert hr.verify(proof, publics, CFG)
    # forged data commitment must not verify
    bad = list(publics)
    bad[80] = (bad[80] + 1) % 256
    assert not hr.verify(proof, bad, CFG)


@pytest.mark.slow
def test_operator_with_real_prover(nh):
    """Operator loop with the prover service in NON-mock mode: the
    next_header proof is actually generated and verified before commit
    (covers the LocalProverService prove path end-to-end)."""
    from blobstreamx_tpu.circuits.input import DEFAULT_FIXTURES
    from blobstreamx_tpu.runtime import contract as ct
    from blobstreamx_tpu.runtime.operator import (
        BlobstreamXOperator, FixtureChainFetcher, OperatorConfig,
    )
    from blobstreamx_tpu.runtime.service import (
        LocalProverService, RegisteredFunction,
    )

    class StepOnlyFetcher(FixtureChainFetcher):
        def find_block_to_request(self, trusted_block, max_end):
            return trusted_block + 1

    fetcher = StepOnlyFetcher(DEFAULT_FIXTURES, head=10002)
    genesis = fetcher.get_header(10000).hash()
    c = ct.BlobstreamXContract(genesis_height=10000, genesis_header=genesis)
    service = LocalProverService(mock=False, cfg=CFG)
    nh_fid = bytes.fromhex("bb" * 32)
    service.register(nh_fid, RegisteredFunction(
        "next_header", nh, lambda pubs: bytes(pubs[40:104])
    ))
    op = BlobstreamXOperator(c, fetcher, service, bytes.fromhex("aa" * 32),
                             nh_fid, OperatorConfig(data_commitment_max=4))
    rid = op.process_iteration()
    req = service.get_request(rid)
    assert req.status == "success"
    assert req.proof is not None
    assert nh.verify(req.proof, list(req.input_bytes) + list(req.output_bytes),
                     CFG)
    assert c.latest_block == 10001
