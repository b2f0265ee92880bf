"""NTT / LDE golden tests vs naive python-int evaluation."""

import numpy as np

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.field import ntt
from blobstreamx_tpu.field import extension as glext

RNG = np.random.default_rng(1)


def rand_poly(n):
    return [int(v) % gl.P for v in RNG.integers(0, 1 << 63, size=n, dtype=np.uint64)]


def naive_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % gl.P
    return acc


def test_ntt_matches_naive():
    for log_n in [0, 1, 3, 6]:
        n = 1 << log_n
        coeffs = rand_poly(n)
        w = gl.primitive_root_of_unity(log_n)
        want = [naive_eval(coeffs, pow(w, i, gl.P)) for i in range(n)]
        got = gl.to_int(ntt.ntt(gl.from_int(coeffs)))
        assert [int(v) for v in got] == want, f"log_n={log_n}"


def test_ntt_batch_and_roundtrip():
    n, b = 32, 5
    polys = np.array([rand_poly(n) for _ in range(b)], dtype=np.uint64)
    x = gl.from_int(polys)
    evals = ntt.ntt(x)
    back = gl.to_int(ntt.ntt(evals, inverse=True))
    assert np.array_equal(back, polys)


def test_lde_agrees_with_naive_coset_eval():
    log_n, rate_bits = 3, 2
    n = 1 << log_n
    coeffs = rand_poly(n)
    w = gl.primitive_root_of_unity(log_n)
    evals = [naive_eval(coeffs, pow(w, i, gl.P)) for i in range(n)]
    big = ntt.lde(gl.from_int(evals), rate_bits)
    wN = gl.primitive_root_of_unity(log_n + rate_bits)
    g = gl.GENERATOR
    want = [naive_eval(coeffs, (g * pow(wN, i, gl.P)) % gl.P) for i in range(n << rate_bits)]
    assert [int(v) for v in gl.to_int(big)] == want


def test_lde_subset_property():
    # LDE at stride rate positions of the shifted coset contains g*H evals
    log_n, rate_bits = 4, 3
    n = 1 << log_n
    coeffs = rand_poly(n)
    evals_h = ntt.ntt(gl.from_int(coeffs))
    big = ntt.lde(evals_h, rate_bits)
    shifted = ntt.ntt(ntt.coset_shift(gl.from_int(coeffs), gl.GENERATOR))
    assert np.array_equal(np.asarray(big)[:: 1 << rate_bits], np.asarray(shifted))


def test_eval_poly_ext():
    n = 8
    coeffs = rand_poly(n)
    pt = (12345678901234567, 98765432109876543)
    got = ntt.eval_poly_ext(gl.from_int(coeffs), glext.from_int_pair(pt[0], pt[1]))
    acc = (0, 0)
    for c in reversed(coeffs):
        acc = glext.GFp2.add(glext.GFp2.mul(acc, pt), (c, 0))
    g0, g1 = glext.to_int_pair(got)
    assert (int(g0), int(g1)) == acc
