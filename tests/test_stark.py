"""End-to-end STARK prove/verify on small AIRs + tamper rejection."""

import numpy as np
import pytest

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.proof import stark
from blobstreamx_tpu.proof.air import Air

pytestmark = pytest.mark.proof  # tiny-config proving tier (see pytest.ini)

CFG = stark.StarkConfig(
    rate_bits=3, cap_height=1, num_query_rounds=12, pow_bits=4, final_poly_bits=2
)


class FibonacciAir(Air):
    """cols (a, b); next = (b, a+b). publics: [a0, b0, b_last]."""

    width = 2
    max_constraint_degree = 2

    def eval(self, b):
        a, bb = b.local(0), b.local(1)
        an, bn = b.next(0), b.next(1)
        t = b.when_transition()
        t.assert_zero(an - bb)
        t.assert_zero(bn - (a + bb))
        b.when_first_row().assert_eq(a, b.public(0))
        b.when_first_row().assert_eq(bb, b.public(1))
        b.when_last_row().assert_eq(bb, b.public(2))


def fib_trace(n):
    tr = np.zeros((n, 2), dtype=np.uint64)
    a, b = 1, 1
    for i in range(n):
        tr[i] = (a, b)
        a, b = b, (a + b) % gl.P
    return tr


class SquareAir(Air):
    """col c: next.c = c*c + 1 (degree-2 transition). publics: [c0, c_last]."""

    width = 1
    max_constraint_degree = 2

    def eval(self, b):
        c = b.local(0)
        cn = b.next(0)
        b.when_transition().assert_zero(cn - (c * c + 1))
        b.when_first_row().assert_eq(c, b.public(0))
        b.when_last_row().assert_eq(c, b.public(1))


def square_trace(n, c0=3):
    tr = np.zeros((n, 1), dtype=np.uint64)
    c = c0
    for i in range(n):
        tr[i, 0] = c
        c = (c * c + 1) % gl.P
    return tr


def test_fibonacci_roundtrip():
    n = 16
    tr = fib_trace(n)
    publics = [1, 1, int(tr[-1, 1])]
    air = FibonacciAir()
    proof = stark.prove(air, tr, publics, CFG)
    assert stark.verify(air, proof, publics, CFG)


def test_square_roundtrip():
    n = 16
    tr = square_trace(n)
    publics = [3, int(tr[-1, 0])]
    air = SquareAir()
    proof = stark.prove(air, tr, publics, CFG)
    assert stark.verify(air, proof, publics, CFG)


def test_rejects_wrong_public():
    n = 16
    tr = fib_trace(n)
    publics = [1, 1, int(tr[-1, 1])]
    air = FibonacciAir()
    proof = stark.prove(air, tr, publics, CFG)
    bad = [1, 1, (int(tr[-1, 1]) + 1) % gl.P]
    assert not stark.verify(air, proof, bad, CFG)


def test_rejects_invalid_trace():
    n = 16
    tr = fib_trace(n)
    tr[7, 0] = (int(tr[7, 0]) + 1) % gl.P  # break the chain
    publics = [1, 1, int(fib_trace(n)[-1, 1])]
    air = FibonacciAir()
    proof = stark.prove(air, tr, publics, CFG)
    assert not stark.verify(air, proof, publics, CFG)


def test_rejects_tampered_opening():
    n = 16
    tr = fib_trace(n)
    publics = [1, 1, int(tr[-1, 1])]
    air = FibonacciAir()
    proof = stark.prove(air, tr, publics, CFG)
    proof.query_openings[0]["main"].values[0] = (
        proof.query_openings[0]["main"].values[0] + 1
    ) % gl.P
    assert not stark.verify(air, proof, publics, CFG)
