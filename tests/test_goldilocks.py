"""Golden tests for Goldilocks limb arithmetic vs python-int reference."""

import numpy as np

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.field import extension as glext

RNG = np.random.default_rng(0)


def rand_elems(n):
    """Random canonical field elements as python ints."""
    out = []
    while len(out) < n:
        v = int(RNG.integers(0, 1 << 64, dtype=np.uint64))
        if v < gl.P:
            out.append(v)
    return out


EDGE = [0, 1, 2, gl.P - 1, gl.P - 2, gl.EPSILON, gl.EPSILON + 1, 1 << 32, (1 << 63), gl.P - (1 << 32)]


def test_roundtrip():
    vals = EDGE + rand_elems(100)
    x = gl.from_int(vals)
    back = gl.to_int(x)
    assert [int(v) for v in back] == vals


def _pairs(n=200):
    a = EDGE + rand_elems(n)
    b = rand_elems(len(a))
    return a, b


def test_add_sub_neg():
    a, b = _pairs()
    xa, xb = gl.from_int(a), gl.from_int(b)
    got = gl.to_int(gl.add(xa, xb))
    want = [(ai + bi) % gl.P for ai, bi in zip(a, b)]
    assert [int(v) for v in got] == want
    got = gl.to_int(gl.sub(xa, xb))
    want = [(ai - bi) % gl.P for ai, bi in zip(a, b)]
    assert [int(v) for v in got] == want
    got = gl.to_int(gl.neg(xa))
    want = [(-ai) % gl.P for ai in a]
    assert [int(v) for v in got] == want


def test_mul():
    a, b = _pairs()
    xa, xb = gl.from_int(a), gl.from_int(b)
    got = gl.to_int(gl.mul(xa, xb))
    want = [(ai * bi) % gl.P for ai, bi in zip(a, b)]
    assert [int(v) for v in got] == want


def test_mul_u32():
    a = EDGE + rand_elems(50)
    ks = [0, 1, 7, 0xFFFFFFFF, 12345]
    for k in ks:
        got = gl.to_int(gl.mul_u32(gl.from_int(a), k))
        want = [(ai * k) % gl.P for ai in a]
        assert [int(v) for v in got] == want, f"k={k}"


def test_inv():
    a = [v for v in EDGE if v != 0] + rand_elems(30)
    xa = gl.from_int(a)
    got = gl.to_int(gl.mul(xa, gl.inv(xa)))
    assert all(int(v) == 1 for v in got)


def test_pow_const():
    a = rand_elems(10)
    for e in [0, 1, 2, 7, 12345, gl.P - 2]:
        got = gl.to_int(gl.pow_const(gl.from_int(a), e))
        want = [pow(ai, e, gl.P) for ai in a]
        assert [int(v) for v in got] == want, f"e={e}"


def test_roots_of_unity():
    for bits in [0, 1, 4, 16, 32]:
        w = gl.primitive_root_of_unity(bits)
        assert pow(w, 1 << bits, gl.P) == 1
        if bits > 0:
            assert pow(w, 1 << (bits - 1), gl.P) == gl.P - 1


def test_extension_mul_inv():
    n = 50
    a = list(zip(rand_elems(n), rand_elems(n)))
    b = list(zip(rand_elems(n), rand_elems(n)))
    xa = glext.from_int_pair([x[0] for x in a], [x[1] for x in a])
    xb = glext.from_int_pair([x[0] for x in b], [x[1] for x in b])
    g0, g1 = glext.to_int_pair(glext.mul(xa, xb))
    want = [glext.GFp2.mul(ai, bi) for ai, bi in zip(a, b)]
    assert [(int(l), int(h)) for l, h in zip(g0, g1)] == want
    # inverse
    prod = glext.mul(xa, glext.inv(xa))
    p0, p1 = glext.to_int_pair(prod)
    assert all(int(v) == 1 for v in p0) and all(int(v) == 0 for v in p1)


def test_extension_embedding_consistency():
    # base-field mul agrees with embedded extension mul
    a = rand_elems(20)
    b = rand_elems(20)
    xa, xb = gl.from_int(a), gl.from_int(b)
    ea, eb = glext.from_base(xa), glext.from_base(xb)
    g0, g1 = glext.to_int_pair(glext.mul(ea, eb))
    want = [int(v) for v in gl.to_int(gl.mul(xa, xb))]
    assert [int(v) for v in g0] == want
    assert all(int(v) == 0 for v in g1)
