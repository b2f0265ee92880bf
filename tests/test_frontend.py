"""Frontend DSL: witness-generation unit tests + end-to-end proof."""

import hashlib

import numpy as np
import pytest

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.frontend.builder import (
    CircuitBuilder,
    Variable,
)
from blobstreamx_tpu.proof import stark

CFG = stark.StarkConfig(
    rate_bits=3, cap_height=1, num_query_rounds=8, pow_bits=4, final_poly_bits=2
)


def test_witness_arith_and_compare():
    b = CircuitBuilder()
    x = b.u64_constant(1_000_000)
    y = b.u64_constant((1 << 40) + 5)
    s = b.u64_add(x, y)
    d = b.u64_sub(y, x)
    lt = b.u64_lt(x, y)
    gte = b.u64_gte(x, y)
    c = b.build()
    vals = c.generate_witness()
    get64 = lambda v: int(vals[v.lo.wire]) | (int(vals[v.hi.wire]) << 32)
    assert get64(s) == 1_000_000 + (1 << 40) + 5
    assert get64(d) == (1 << 40) + 5 - 1_000_000
    assert int(vals[lt.wire]) == 1
    assert int(vals[gte.wire]) == 0


def test_witness_sha256():
    b = CircuitBuilder()
    msg = [b.byte_constant(x) for x in b"hello world"]
    digest = b.sha256(msg)
    c = b.build()
    vals = c.generate_witness()
    got = bytes(int(vals[x.wire]) & 0xFF for x in digest.bytes)
    assert got == hashlib.sha256(b"hello world").digest()


def test_witness_select_is_equal():
    b = CircuitBuilder()
    t = b._true()
    x, y = b.constant(7), b.constant(9)
    sel = b.select(t, x, y)
    eq = b.is_equal(x, x)
    neq = b.is_equal(x, y)
    c = b.build()
    vals = c.generate_witness()
    assert int(vals[sel.wire]) == 7
    assert int(vals[eq.wire]) == 1
    assert int(vals[neq.wire]) == 0


@pytest.mark.slow
def test_end_to_end_sha_circuit():
    """Public input 4 bytes -> sha256 -> public output; full 3-table proof."""
    b = CircuitBuilder()
    in_bytes = [b.free_byte() for _ in range(4)]
    for x in in_bytes:
        b._public_byte(x.wire)
    digest = b.sha256(in_bytes)
    b.evm_write_bytes32(digest)
    c = b.build()

    inputs = {0: 0xDE, 1: 0xAD, 2: 0xBE, 3: 0xEF}
    proof, publics = c.prove(inputs, CFG)
    want = hashlib.sha256(bytes([0xDE, 0xAD, 0xBE, 0xEF])).digest()
    assert bytes(publics[4:]) == want
    assert c.verify(proof, publics, CFG)
    # wrong public output must fail
    bad = list(publics)
    bad[10] = (bad[10] + 1) % 256
    assert not c.verify(proof, bad, CFG)
