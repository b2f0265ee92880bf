"""Succinct MapReduce aggregation wired end-to-end (VERDICT r4 Missing #1
/ Next #1): ReduceCircuit verifies child proofs in-circuit, the
MapReduceProver(succinct=True) tree yields ONE root proof, and the join
circuit composes it with the skip proof into the full header_range
statement (reference circuits/builder.rs:301-409 + plonky2 recursion).

Proof tier: real leaf proofs + witness-level checks of the reduce/join
circuits (witness_check evaluates exactly what their STARKs enforce);
the full outer prove->verify roundtrips are @slow.
"""

import os

import pytest

from blobstreamx_tpu.circuits.input import InputDataFetcher, SkipInputFetcher
from blobstreamx_tpu.circuits.map_job import SubchainMapCircuit
from blobstreamx_tpu.parallel import mapreduce as mr
from blobstreamx_tpu.proof import stark

pytestmark = pytest.mark.proof

CFG = stark.StarkConfig(rate_bits=3, cap_height=1, num_query_rounds=8,
                        pow_bits=4, final_poly_bits=2)


@pytest.fixture(scope="module")
def prover():
    return mr.MapReduceProver(batch_size=2, nb_map_jobs=2, cfg=CFG,
                              succinct=True)


@pytest.fixture(scope="module")
def leaf_proofs(prover):
    """Two real leaf proofs covering [10000, 10004)."""
    f = prover.fetcher
    geh = f.get_header(10004).hash()
    p0 = prover.template.prove(10000, 10004, geh, CFG)
    p1 = prover.template.prove(10002, 10004, geh, CFG)
    return geh, p0, p1


def test_reduce_witness_accepts_and_binds_root(prover, leaf_proofs):
    geh, p0, p1 = leaf_proofs
    rc = prover.reduce_templates[0]
    assert rc.witness_ok(10000, 10004, geh, p0, p1)
    # the reduce node's combined root equals the fixture data commitment
    f = InputDataFetcher()
    rc._pending = (p0[0], p0[1], p1[0], p1[1])
    try:
        vals = rc.circuit.generate_witness(
            rc.make_public_inputs(10000, 10004, geh))
        publics = rc.circuit.public_values(vals)
    finally:
        rc._pending = None
    assert bytes(publics[112:144]) == f.get_data_commitment(10000, 10004)
    assert bytes(publics[48:80]) == f.get_header(10000).hash()
    assert bytes(publics[80:112]) == geh


def test_reduce_rejects_tampered_child_proof(prover, leaf_proofs):
    geh, p0, p1 = leaf_proofs
    rc = prover.reduce_templates[0]
    import copy

    bad = copy.deepcopy(p1[0])
    # corrupt one opened value in the left table's main cap
    cap0 = list(bad.table_proofs[0].main_cap[0])
    cap0[0] = (int(cap0[0]) + 1) % (2**64 - 2**32 + 1)
    bad.table_proofs[0].main_cap[0] = cap0
    try:
        ok = rc.witness_ok(10000, 10004, geh, p0, (bad, p1[1]))
    except Exception:
        ok = False
    assert not ok


def test_reduce_rejects_forged_child_publics(prover, leaf_proofs):
    """Claiming different child outputs (a forged subchain root) must
    break the in-circuit verification binding."""
    geh, p0, p1 = leaf_proofs
    rc = prover.reduce_templates[0]
    forged = list(p1[1])
    forged[112] = (forged[112] + 1) % 256  # flip a data-root byte
    try:
        ok = rc.witness_ok(10000, 10004, geh, p0, (p1[0], forged))
    except Exception:
        ok = False
    assert not ok


def test_reduce_disabled_right_boundary(prover):
    """Range [10000,10002) with 2 jobs x 2: the right leaf is disabled
    (empty range pass-through proof) and the reduce node must pass the
    left child through — the ADVICE r4 boundary-completeness case."""
    f = InputDataFetcher()
    geh = f.get_header(10002).hash()
    p0 = prover.template.prove(10000, 10002, geh, CFG)
    p1 = prover.template.prove(10002, 10002, geh, CFG)  # disabled leaf
    rc = prover.reduce_templates[0]
    assert rc.witness_ok(10000, 10002, geh, p0, p1)
    rc._pending = (p0[0], p0[1], p1[0], p1[1])
    try:
        vals = rc.circuit.generate_witness(
            rc.make_public_inputs(10000, 10002, geh))
        publics = rc.circuit.public_values(vals)
    finally:
        rc._pending = None
    # passthrough: root = left child's root = fixture commitment for the
    # 2-block range; end_header = left end header
    assert bytes(publics[112:144]) == f.get_data_commitment(10000, 10002)
    assert bytes(publics[80:112]) == geh


@pytest.mark.slow
def test_succinct_mapreduce_one_proof_roundtrip(prover):
    """prove_succinct yields ONE root proof; verify_succinct verifies
    exactly that proof (cost independent of nb_map_jobs) and rejects a
    tampered statement."""
    f = prover.fetcher
    agg = prover.prove_succinct(10000, 10004)
    assert agg.data_commitment == f.get_data_commitment(10000, 10004)
    assert prover.verify_succinct(
        agg, start_header=f.get_header(10000).hash())
    # forged commitment
    import dataclasses

    bad = dataclasses.replace(agg, data_commitment=b"\x00" * 32)
    assert not prover.verify_succinct(bad)
    # forged root publics (claimed commitment byte flipped)
    bad2 = dataclasses.replace(
        agg, root_publics=list(agg.root_publics[:112])
        + [(agg.root_publics[112] + 1) % 256] + list(agg.root_publics[113:]),
        data_commitment=bytes([(agg.data_commitment[0] + 1) % 256])
        + agg.data_commitment[1:])
    assert not prover.verify_succinct(bad2)


def test_join_circuit_witness_level():
    """Full composition at witness level: skip proof + succinct
    aggregation root -> join circuit accepts, binds the fixture
    commitment, and rejects a forged aggregation."""
    from blobstreamx_tpu.circuits.combined import HeaderRangeSuccinct

    hr = HeaderRangeSuccinct(vss=2, nb_map_jobs=2, batch_size=2, cfg=CFG)
    f = hr.fetcher
    trusted_header = f.get_header(10000).hash()

    skip_proof, skip_publics = hr.skip.prove(10000, 10004, CFG)
    target_hash = bytes(skip_publics[48:80])
    assert target_hash == f.get_header(10004).hash()
    agg = hr.mr.prove_succinct(10000, 10004, target_hash)
    assert agg.data_commitment == f.get_data_commitment(10000, 10004)

    assert hr.join.witness_ok(10000, trusted_header, 10004,
                              (skip_proof, skip_publics),
                              (agg.root_proof, agg.root_publics))

    # the join's public outputs are the header_range statement
    hr.join._with_pending((skip_proof, skip_publics),
                          (agg.root_proof, agg.root_publics))
    try:
        vals = hr.join.circuit.generate_witness(
            hr.join.make_public_inputs(10000, trusted_header, 10004))
        publics = hr.join.circuit.public_values(vals)
    finally:
        hr.join._pending = None
    assert bytes(publics[48:80]) == target_hash
    assert bytes(publics[80:112]) == f.get_data_commitment(10000, 10004)

    # forged aggregation root publics must be rejected
    forged = list(agg.root_publics)
    forged[112] = (forged[112] + 1) % 256
    try:
        ok = hr.join.witness_ok(10000, trusted_header, 10004,
                                (skip_proof, skip_publics),
                                (agg.root_proof, forged))
    except Exception:
        ok = False
    assert not ok


@pytest.mark.slow
def test_header_range_succinct_full_roundtrip():
    """The flagship: skip proof + succinct aggregation + join circuit all
    fully proven — ONE final proof carries the whole header_range
    statement, and verify() checks exactly that one proof."""
    from blobstreamx_tpu.circuits.combined import HeaderRangeSuccinct

    hr = HeaderRangeSuccinct(vss=2, nb_map_jobs=2, batch_size=2, cfg=CFG)
    f = hr.fetcher
    proof, publics, target_hash, dc = hr.prove(10000, 10004)
    assert target_hash == f.get_header(10004).hash()
    assert dc == f.get_data_commitment(10000, 10004)
    assert hr.verify(proof, publics)
    # forged data commitment in the final statement must not verify
    bad = list(publics)
    bad[80] = (bad[80] + 1) % 256
    assert not hr.verify(proof, bad)
