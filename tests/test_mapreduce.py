"""MapReduce proof tree: subchain map-job circuit + native reduce
(parallel/mapreduce.py) vs reference MapReduce semantics
(circuits/builder.rs:273-409). Fast tests run at witness level (root must
equal the fixture data commitment); the full distributed prove → checkpoint
→ resume → verify roundtrip is @slow."""

import os

import pytest

from blobstreamx_tpu.circuits.map_job import (
    OUT_DATA_ROOT, OUT_END_HEADER, OUT_START_HEADER, SubchainMapCircuit,
)
from blobstreamx_tpu.circuits.input import InputDataFetcher
from blobstreamx_tpu.parallel import mapreduce as mr
from blobstreamx_tpu.proof import stark

from blobstreamx_tpu.circuits.input import DEFAULT_FIXTURES as FIXTURES
pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not mounted"
)

CFG = stark.StarkConfig(
    rate_bits=3, cap_height=1, num_query_rounds=8, pow_bits=4,
    final_poly_bits=2,
)


@pytest.fixture(scope="module")
def template():
    return SubchainMapCircuit(batch_size=2)


def _witness_leaf(template, job, start, g_end, g_end_header):
    batch_start = start + job * template.batch_size
    pub_in = template.make_public_inputs(batch_start, g_end, g_end_header)
    vals = template.circuit.generate_witness(pub_in)
    publics = template.circuit.public_values(vals)
    return mr.LeafProof(job, batch_start, publics, proof=None)


def test_map_jobs_reduce_to_fixture_root(template):
    f = InputDataFetcher()
    g_end_header = f.get_header(10004).hash()
    leaves = [_witness_leaf(template, j, 10000, 10004, g_end_header)
              for j in range(2)]
    subs = [mr._leaf_to_subchain(lf, 2, 10004) for lf in leaves]
    final = mr._reduce_tree(subs)
    assert final.start_header == f.get_header(10000).hash()
    assert final.end_header == g_end_header
    assert final.end_block == 10004
    assert final.data_merkle_root == f.get_data_commitment(10000, 10004)


def test_partial_range_disables_tail_jobs(template):
    """Range [10000,10002) with 2 jobs x 2: job 1 disabled, passthrough."""
    f = InputDataFetcher()
    g_end_header = f.get_header(10002).hash()
    leaves = [_witness_leaf(template, j, 10000, 10002, g_end_header)
              for j in range(2)]
    subs = [mr._leaf_to_subchain(lf, 2, 10002) for lf in leaves]
    assert subs[0].is_enabled and not subs[1].is_enabled
    final = mr._reduce_tree(subs)
    assert final.end_block == 10002
    assert final.data_merkle_root == f.get_data_commitment(10000, 10002)


def test_reduce_rejects_unlinked_subchains(template):
    f = InputDataFetcher()
    g_end_header = f.get_header(10004).hash()
    leaves = [_witness_leaf(template, j, 10000, 10004, g_end_header)
              for j in range(2)]
    subs = [mr._leaf_to_subchain(lf, 2, 10004) for lf in leaves]
    tampered = mr._Subchain(
        subs[1].is_enabled, subs[1].start_block,
        b"\xee" * 32, subs[1].end_block, subs[1].end_header,
        subs[1].data_merkle_root,
    )
    with pytest.raises(ValueError):
        mr._reduce_tree([subs[0], tampered])


@pytest.mark.slow
def test_full_mapreduce_prove_checkpoint_resume_verify(tmp_path):
    prover = mr.MapReduceProver(
        batch_size=2, nb_map_jobs=2, cfg=CFG,
        checkpoint_dir=str(tmp_path), max_workers=2,
    )
    f = prover.fetcher
    agg = prover.prove(10000, 10004)
    assert agg.data_commitment == f.get_data_commitment(10000, 10004)
    assert prover.verify(agg, start_header=f.get_header(10000).hash())
    # checkpoints written
    ckpts = [p for p in os.listdir(tmp_path) if p.startswith("leaf_")]
    assert len(ckpts) == 2
    # resume: a fresh prover reuses checkpoints (no re-prove) and verifies
    prover2 = mr.MapReduceProver(
        batch_size=2, nb_map_jobs=2, cfg=CFG, checkpoint_dir=str(tmp_path))
    agg2 = prover2.prove(10000, 10004)
    assert agg2.data_commitment == agg.data_commitment
    # artifact serde roundtrip
    d = mr.mapreduce_proof_to_json(agg)
    agg3 = mr.mapreduce_proof_from_json(d)
    assert prover.verify(agg3)
    # tampered public root must fail verification
    agg3.leaves[0].publics[112] = (agg3.leaves[0].publics[112] + 1) % 256
    assert not prover.verify(agg3)
