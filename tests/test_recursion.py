"""In-circuit recursive verification (proof/recursion.py, D6b).

A tiny inner circuit (cpu + bytes tables) is proven natively; the outer
circuit verifies that SystemProof in-circuit. The outer witness must
satisfy every constraint (witness_check == what its own STARK would
enforce), and tampering with the inner proof or claimed publics must be
rejected. The full outer prove→verify roundtrip is @slow.
"""

import numpy as np
import pytest

from blobstreamx_tpu.chips import channels as ch
from blobstreamx_tpu.frontend.builder import CircuitBuilder, Variable
from blobstreamx_tpu.proof import recursion as rec
from blobstreamx_tpu.proof import stark
from blobstreamx_tpu.proof.check import witness_check

pytestmark = pytest.mark.proof

CFG = stark.StarkConfig(rate_bits=3, cap_height=1, num_query_rounds=4,
                        pow_bits=2, final_poly_bits=2)


def tiny_inner():
    """4 public bytes in, echoed out, with a little arithmetic."""
    b = CircuitBuilder()
    ins = []
    for _ in range(4):
        byte = b.free_byte()
        b._public_byte(byte.wire)
        ins.append(byte)
    x = b.pack4(*ins)
    y = b.mul(x, x)
    b.assert_is_equal(y, y)
    for byte in ins:
        b._public_byte(byte.wire)
    return b.build()


@pytest.fixture(scope="module")
def inner_proof():
    inner = tiny_inner()
    pub_in = {0: 1, 1: 2, 2: 3, 3: 4}
    proof, publics = inner.prove(pub_in, CFG)
    assert inner.verify(proof, publics, CFG)
    return inner, proof, publics


def build_outer(inner, publics, flat_vals):
    shapes = rec.inner_shapes(inner, CFG)
    ob = CircuitBuilder()
    rv = rec.RecursiveVerifier(ob, shapes, CFG)
    pw, flat_wires = rv.alloc_proof()
    assert len(flat_wires) == len(flat_vals)
    ob.hint_into([], flat_wires, lambda vals, fv=list(flat_vals): fv)
    msgs = [(ch.PUBLIC, [pos, Variable(ob.constant(v).wire)], -1)
            for pos, v in enumerate(publics)]
    rv.verify(pw, msgs)
    return ob.build()


def test_recursive_verifier_accepts(inner_proof):
    inner, proof, publics = inner_proof
    shapes = rec.inner_shapes(inner, CFG)
    flat = rec.flatten_system_proof(proof, shapes, CFG)
    outer = build_outer(inner, publics, flat)
    assert witness_check(outer, {})


def test_recursive_verifier_rejects_tampered_proof(inner_proof):
    inner, proof, publics = inner_proof
    shapes = rec.inner_shapes(inner, CFG)
    flat = rec.flatten_system_proof(proof, shapes, CFG)
    # tamper one opened value mid-proof
    bad = list(flat)
    bad[len(bad) // 2] = (bad[len(bad) // 2] + 1) % (2**64 - 2**32 + 1)
    outer = build_outer(inner, publics, bad)
    try:
        ok = witness_check(outer, {})
    except Exception:
        ok = False
    assert not ok


def test_recursive_verifier_rejects_wrong_publics(inner_proof):
    inner, proof, publics = inner_proof
    shapes = rec.inner_shapes(inner, CFG)
    flat = rec.flatten_system_proof(proof, shapes, CFG)
    bad_publics = list(publics)
    bad_publics[0] = (bad_publics[0] + 1) % 256
    outer = build_outer(inner, bad_publics, flat)
    try:
        ok = witness_check(outer, {})
    except Exception:
        ok = False
    assert not ok


@pytest.mark.slow
def test_recursive_verifier_full_roundtrip(inner_proof):
    """The outer circuit itself proves and verifies: a real recursive
    proof of a proof."""
    inner, proof, publics = inner_proof
    shapes = rec.inner_shapes(inner, CFG)
    flat = rec.flatten_system_proof(proof, shapes, CFG)
    outer = build_outer(inner, publics, flat)
    oproof, opublics = outer.prove({}, CFG)
    assert outer.verify(oproof, opublics, CFG)
