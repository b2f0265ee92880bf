"""SHA-256 AIR: witness correctness, prove/verify, tamper rejection."""

import hashlib

import numpy as np
import pytest

from blobstreamx_tpu.chips import sha256 as chip
from blobstreamx_tpu.ops import sha256 as sha
from blobstreamx_tpu.proof import stark

CFG = stark.StarkConfig(
    rate_bits=3, cap_height=1, num_query_rounds=8, pow_bits=4, final_poly_bits=2
)
N_ROWS = 128  # one 68-row segment + tail padding


def abc_block():
    blocks = sha.pad_message(b"abc")
    assert blocks.shape == (1, 16)
    return blocks[0]


def test_witness_digest_matches_hashlib():
    trace = chip.build_trace([(sha.H0, abc_block())], N_ROWS)
    words = chip.digest_rows(trace, 1)[0]
    digest = b"".join(int(w).to_bytes(4, "big") for w in words)
    assert digest == hashlib.sha256(b"abc").digest()


@pytest.fixture(scope="module")
def keys():
    air = chip.Sha256Air()
    pk, vk = stark.build(air, N_ROWS, CFG)
    return air, pk, vk


def test_prove_verify(keys):
    air, pk, vk = keys
    trace = chip.build_trace([(sha.H0, abc_block())], N_ROWS)
    proof = stark.prove(air, trace, [], CFG, pk=pk)
    assert stark.verify(air, proof, [], CFG, vk=vk)


def test_rejects_tampered_witness(keys):
    air, pk, vk = keys
    trace = chip.build_trace([(sha.H0, abc_block())], N_ROWS)
    # flip one w bit in round 20 (schedule + round constraints must catch it)
    r = 23
    trace[r, chip.COL_W + 5] ^= 1
    proof = stark.prove(air, trace, [], CFG, pk=pk)
    assert not stark.verify(air, proof, [], CFG, vk=vk)


def test_rejects_forged_digest(keys):
    air, pk, vk = keys
    trace = chip.build_trace([(sha.H0, abc_block())], N_ROWS)
    trace[64, chip.COL_OUT] = (int(trace[64, chip.COL_OUT]) + 1) % (1 << 32)
    proof = stark.prove(air, trace, [], CFG, pk=pk)
    assert not stark.verify(air, proof, [], CFG, vk=vk)
