"""Operator loop + contract model end-to-end over fixtures (R11/R14/D18).

The prover service runs in mock (witness-only) mode — the operator loop
never proves in-process, mirroring the reference (SURVEY.md 3.1); full
proving is covered by the circuit tests.
"""

import pytest

from blobstreamx_tpu.circuits.header_range import HeaderRangeCircuit
from blobstreamx_tpu.circuits.next_header import NextHeaderCircuit
from blobstreamx_tpu.runtime import contract as ct
from blobstreamx_tpu.runtime.operator import (
    BlobstreamXOperator, FixtureChainFetcher, OperatorConfig,
)
from blobstreamx_tpu.runtime.service import LocalProverService, RegisteredFunction

from blobstreamx_tpu.circuits.input import DEFAULT_FIXTURES as FIXTURES
HR_FID = bytes.fromhex("aa" * 32)
NH_FID = bytes.fromhex("bb" * 32)


@pytest.fixture(scope="module")
def world():
    fetcher = FixtureChainFetcher(FIXTURES, head=10005)
    genesis = fetcher.get_header(10000).hash()
    c = ct.BlobstreamXContract(genesis_height=10000, genesis_header=genesis)
    service = LocalProverService(mock=True)
    hr = HeaderRangeCircuit(vss=2, nb_map_jobs=1, batch_size=4)
    nh = NextHeaderCircuit(vss=2)
    service.register(HR_FID, RegisteredFunction(
        "header_range", hr, lambda pubs: bytes(pubs[48:112])
    ))
    service.register(NH_FID, RegisteredFunction(
        "next_header", nh, lambda pubs: bytes(pubs[40:104])
    ))
    op = BlobstreamXOperator(c, fetcher, service, HR_FID, NH_FID,
                             OperatorConfig(data_commitment_max=4))
    return c, fetcher, service, op


def test_operator_skips_to_head(world):
    c, fetcher, service, op = world
    rid = op.process_iteration()
    assert rid is not None
    assert service.get_request(rid).status == "success"
    # head=10005 -> max 10004; binary search finds 10004 (same val set)
    assert c.latest_block == 10004
    assert c.block_height_to_header_hash[10004] == fetcher.get_header(10004).hash()
    assert c.state_data_commitments[1] == fetcher.get_data_commitment(10000, 10004)
    assert ("HeadUpdate", 10004, fetcher.get_header(10004).hash()) in c.events


def test_operator_idempotent_at_head(world):
    c, _, _, op = world
    latest = c.latest_block
    assert op.process_iteration() is None  # up to date
    assert c.latest_block == latest


def test_contract_rejects_stale_trusted_block(world):
    c, fetcher, _, _ = world
    with pytest.raises(ct.ContractError):
        c.commit_header_range(10000, 10002, b"\x00" * 32, b"\x00" * 32)


def test_verify_attestation_roundtrip(world):
    c, fetcher, _, _ = world
    # tuples covering the committed range [10000, 10004)
    tuples = [
        ct.DataRootTuple(h, fetcher.get_header(h).data_hash)
        for h in range(10000, 10004)
    ]
    for idx in range(4):
        proof = ct.data_root_inclusion_proof(tuples, idx)
        assert c.verify_attestation(1, tuples[idx], proof)
    # wrong nonce / tampered tuple rejected
    proof = ct.data_root_inclusion_proof(tuples, 0)
    assert not c.verify_attestation(99, tuples[0], proof)
    bad = ct.DataRootTuple(tuples[0].height + 1, tuples[0].data_root)
    assert not c.verify_attestation(1, bad, proof)


def test_next_header_step_path():
    fetcher = FixtureChainFetcher(FIXTURES, head=10002)
    genesis = fetcher.get_header(10000).hash()
    c = ct.BlobstreamXContract(genesis_height=10000, genesis_header=genesis)
    service = LocalProverService(mock=True)
    nh = NextHeaderCircuit(vss=2)
    service.register(NH_FID, RegisteredFunction(
        "next_header", nh, lambda pubs: bytes(pubs[40:104])
    ))

    class StepOnlyFetcher(FixtureChainFetcher):
        def find_block_to_request(self, trusted_block, max_end):
            return trusted_block + 1

    f2 = StepOnlyFetcher(FIXTURES, head=10002)
    op = BlobstreamXOperator(c, f2, service, HR_FID, NH_FID,
                             OperatorConfig(data_commitment_max=4))
    rid = op.process_iteration()
    assert service.get_request(rid).status == "success"
    assert c.latest_block == 10001
    assert c.block_height_to_header_hash[10001] == fetcher.get_header(10001).hash()
    assert c.state_data_commitments[1] == fetcher.get_data_commitment(10000, 10001)


def test_zombie_commit_dropped_by_generation_fence():
    """A timed-out iteration that finishes late must not overwrite newer
    work: its commit is dropped by the generation fence, and a stale
    latest_block plan is dropped by the staleness check."""
    fetcher = FixtureChainFetcher(FIXTURES, head=10005)
    genesis = fetcher.get_header(10000).hash()
    c = ct.BlobstreamXContract(genesis_height=10000, genesis_header=genesis)
    service = LocalProverService(mock=True)
    nh = NextHeaderCircuit(vss=2)
    service.register(NH_FID, RegisteredFunction(
        "next_header", nh, lambda pubs: bytes(pubs[40:104])
    ))
    op = BlobstreamXOperator(c, fetcher, service, HR_FID, NH_FID,
                             OperatorConfig(data_commitment_max=4))

    committed = []
    # zombie from generation 0 while the loop is already at generation 3
    op._generation = 3
    assert not op._try_commit(0, c.latest_block,
                              lambda: committed.append("zombie"))
    assert committed == []
    # current generation but stale plan (contract moved since)
    assert not op._try_commit(3, c.latest_block + 1,
                              lambda: committed.append("stale"))
    assert committed == []
    # current generation, fresh plan: commit goes through
    assert op._try_commit(3, c.latest_block,
                          lambda: committed.append("fresh"))
    assert committed == ["fresh"]


def test_subprocess_prover_service_roundtrip(tmp_path):
    """Process-isolated prover service (reference platform model: one
    prover process per request, PROVE_BINARY routing). Plumbing is tested
    with a stub prover binary so no STARK runs in-process; the real
    command default is the entrypoints CLI."""
    import json
    import sys

    from blobstreamx_tpu.runtime.service import SubprocessProverService

    stub = tmp_path / "stub_prover.py"
    stub.write_text(
        "import json, sys\n"
        "assert sys.argv[1] == 'prove'\n"
        "req = json.load(open(sys.argv[2]))\n"
        "inp = req['data']['input']\n"
        "raw = bytes.fromhex(inp[2:])\n"
        "out = {'type': 'res_bytes', 'data': {'input': inp,\n"
        "       'output': '0x' + raw[::-1].hex(), 'proof': {'stub': 1}}}\n"
        "json.dump(out, open('output.json', 'w'))\n")

    svc = SubprocessProverService(workdir=str(tmp_path / "jobs"))
    fid = b"\x01" * 32
    svc.register(fid, "stub", command=[sys.executable, str(stub)])
    # two concurrent requests, distinct ids
    r1 = svc.submit_request(fid, b"\xaa\xbb\xcc")
    r2 = svc.submit_request(fid, b"\x01\x02")
    assert r1 != r2
    q1 = svc.get_request(r1, timeout=30)
    q2 = svc.get_request(r2, timeout=30)
    assert q1.status == "success" and q1.output_bytes == b"\xcc\xbb\xaa"
    assert q2.status == "success" and q2.output_bytes == b"\x02\x01"
    assert q1.proof == {"stub": 1}
    # terminal state sticks
    assert svc.get_request(r1).status == "success"
    # unknown function id fails cleanly
    r3 = svc.submit_request(b"\x02" * 32, b"")
    assert svc.get_request(r3).status == "failure"
    # crashing prover surfaces stderr, not an exception
    bad = tmp_path / "bad_prover.py"
    bad.write_text("import sys; sys.exit(3)\n")
    svc.register(b"\x03" * 32, "bad", command=[sys.executable, str(bad)])
    r4 = svc.submit_request(b"\x03" * 32, b"\x00")
    q4 = svc.get_request(r4, timeout=30)
    assert q4.status == "failure" and "rc=3" in q4.error
