"""Artifact serializer round-trips (VERDICT r4 Missing #7) — the
reference tests `test_serializers` on every circuit
(/root/reference/circuits/data_commitment.rs:109-130: built artifacts must
deserialize identically, critical for the build-once/prove-many model).

Here: SystemProof JSON round-trips are bit-exact and still verify, and
build keys (preprocessed oracles + verifier caps) survive save/load and
prove/verify with the reloaded halves.
"""

import hashlib
import json

import numpy as np
import pytest

from blobstreamx_tpu.frontend.builder import CircuitBuilder
from blobstreamx_tpu.proof import serde, stark

pytestmark = pytest.mark.proof

CFG = stark.StarkConfig(rate_bits=3, cap_height=1, num_query_rounds=4,
                        pow_bits=2, final_poly_bits=2)


def tiny_circuit():
    b = CircuitBuilder()
    ins = []
    for _ in range(4):
        byte = b.free_byte()
        b._public_byte(byte.wire)
        ins.append(byte)
    x = b.pack4(*ins)
    y = b.mul(x, x)
    b.assert_is_equal(y, y)
    return b.build()


def sha_circuit():
    """Circuit with a SHA-256 chip call — its table carries preprocessed
    columns, so build keys are non-trivial."""
    b = CircuitBuilder()
    ins = []
    for _ in range(4):
        byte = b.free_byte()
        b._public_byte(byte.wire)
        ins.append(byte)
    digest = b.sha256(ins)
    for byte in digest.bytes:
        b._public_byte(byte.wire)
    return b.build()


def test_system_proof_json_roundtrip_bit_exact():
    circ = tiny_circuit()
    proof, publics = circ.prove({0: 9, 1: 8, 2: 7, 3: 6}, CFG)
    blob = serde.dumps(proof)
    re_proof = serde.loads(blob)
    # bit-exact: re-serialization is identical
    assert serde.dumps(re_proof) == blob
    assert circ.verify(re_proof, publics, CFG)
    # a corrupted blob either fails to parse or fails verification
    d = json.loads(blob)
    d["tables"][0]["main_cap"][0][0] = (
        int(d["tables"][0]["main_cap"][0][0]) + 1)
    try:
        bad = serde.system_proof_from_json(d)
        assert not circ.verify(bad, publics, CFG)
    except Exception:
        pass


def test_build_keys_roundtrip(tmp_path):
    circ = sha_circuit()
    pks, vks = circ.build_keys(CFG)
    assert any(pk.pre_rows_np is not None for pk in pks), \
        "sha table should carry preprocessed columns"
    path = str(tmp_path / "sha.keys")
    serde.save_keys(path, pks, vks)
    pks2, vks2 = serde.load_keys(path)
    for vk, vk2 in zip(vks, vks2):
        assert vk.pre_cap == vk2.pre_cap
    for pk, pk2 in zip(pks, pks2):
        if pk.pre_rows_np is None:
            assert pk2.pre_rows_np is None
        else:
            assert np.array_equal(np.asarray(pk.pre_rows_np),
                                  np.asarray(pk2.pre_rows_np))

    # prove with reloaded prover keys; verify with reloaded verifier keys
    msg = bytes([1, 2, 3, 4])
    pub_in = {i: v for i, v in enumerate(msg)}
    proof, publics = circ.prove(pub_in, CFG, pks2)
    assert bytes(publics[4:36]) == hashlib.sha256(msg).digest()
    assert circ.verify(proof, publics, CFG, vks2)
