"""Batched witness engine (frontend/witness.py) equivalence: the leveled
vectorized schedule must produce bit-identical wire values to the
event-at-a-time interpreter on real circuits covering every batch kind
(arith, typed hints, sha, sha512, ed sends, callback fetchers)."""

import numpy as np
import pytest

from blobstreamx_tpu.circuits.data_commitment import DataCommitmentCircuit
from blobstreamx_tpu.circuits.next_header import NextHeaderCircuit


def _compare(circ, pub_in):
    v_fast = circ.circuit.generate_witness(pub_in)
    v_ref = circ.circuit.generate_witness_interp(pub_in)
    diff = np.nonzero(v_fast != v_ref)[0]
    assert diff.size == 0, f"{diff.size} wires differ, first {diff[:10]}"


def test_data_commitment_witness_equivalence():
    c = DataCommitmentCircuit(max_leaves=2)
    f = c.fetcher
    sh, eh = f.get_header(10000).hash(), f.get_header(10002).hash()
    _compare(c, c.make_public_inputs(10000, sh, 10002, eh))


def test_next_header_witness_equivalence():
    c = NextHeaderCircuit(vss=2)
    f = c.fetcher
    _compare(c, c.make_public_inputs(10000, f.get_header(10000).hash()))
