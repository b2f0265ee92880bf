"""Native (C++) host kernel tests: bit-exactness vs the pure-python
Poseidon instance, grind semantics vs the transcript-fork definition, and
Merkle-path climbs (blobstreamx_tpu/native; reference parity: plonky2's
native challenger/PoW — SURVEY.md D2/D5)."""

import random

import pytest

from blobstreamx_tpu import native
from blobstreamx_tpu.ops import poseidon as pos
from blobstreamx_tpu.proof import fri
from blobstreamx_tpu.proof.transcript import Transcript

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_permute_matches_python():
    rng = random.Random(1)
    for _ in range(20):
        st = [rng.randrange(pos.gl.P) for _ in range(12)]
        assert native.permute(st) == pos.permute_py(st)


def test_hashes_match_python():
    rng = random.Random(2)
    for n in [1, 4, 8, 9, 16, 25]:
        ins = [rng.randrange(pos.gl.P) for _ in range(n)]
        assert native.hash_no_pad(ins) == pos.hash_no_pad_py(ins)
    l = [rng.randrange(pos.gl.P) for _ in range(4)]
    r = [rng.randrange(pos.gl.P) for _ in range(4)]
    assert native.hash_two_to_one(l, r) == pos.hash_two_to_one_py(l, r)


def _py_grind(transcript, pow_bits):
    nonce = 0
    while True:
        t = transcript.fork()
        t.observe_element(nonce)
        if t.get_challenge() >> (64 - pow_bits) == 0:
            return nonce
        nonce += 1


def test_grind_matches_python_fork_semantics():
    for pending in [[], [3], [1, 2, 3, 4, 5, 6, 7]]:
        t = Transcript()
        t.observe_elements([11, 22, 33, 44, 55, 66, 77, 88])  # force a duplex
        t.observe_elements(pending)
        assert native.grind(t.state, t.input_buffer, 6) == _py_grind(t, 6)
        # fri.grind dispatches to native and must agree too
        assert fri.grind(t, 6) == _py_grind(t, 6)
        # and check_grind accepts the native nonce
        assert fri.check_grind(t, fri.grind(t, 6), 6)


def test_merkle_climb():
    rng = random.Random(3)
    leaf = [rng.randrange(pos.gl.P) for _ in range(4)]
    sibs = [[rng.randrange(pos.gl.P) for _ in range(4)] for _ in range(5)]
    index = 0b10110
    want = list(leaf)
    for d, s in enumerate(sibs):
        if (index >> d) & 1:
            want = pos.hash_two_to_one_py(s, want)
        else:
            want = pos.hash_two_to_one_py(want, s)
    assert native.merkle_climb(leaf, sibs, index) == want
