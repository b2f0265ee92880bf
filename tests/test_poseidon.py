"""Poseidon JAX implementation vs python-int reference; sanity properties."""

import numpy as np

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.ops import poseidon as pos

RNG = np.random.default_rng(3)


def rand_state():
    out = []
    while len(out) < pos.WIDTH:
        v = int(RNG.integers(0, 1 << 64, dtype=np.uint64))
        if v < gl.P:
            out.append(v)
    return out


def test_permute_matches_reference():
    states = [rand_state() for _ in range(4)] + [[0] * 12, [gl.P - 1] * 12]
    x = gl.from_int(np.array(states, dtype=np.uint64))
    got = gl.to_int(pos.permute(x))
    for i, s in enumerate(states):
        want = pos.permute_ref(s)
        assert [int(v) for v in got[i]] == want, i


def test_mds_is_invertible():
    # determinant of the Cauchy matrix must be nonzero (sanity; MDS by construction)
    m = np.array(pos.mds_matrix(), dtype=object)
    # Gaussian elimination over GF(p)
    P = gl.P
    a = [[int(v) for v in row] for row in m]
    n = len(a)
    det = 1
    for col in range(n):
        piv = next((r for r in range(col, n) if a[r][col] % P), None)
        assert piv is not None
        if piv != col:
            a[col], a[piv] = a[piv], a[col]
            det = -det
        det = det * a[col][col] % P
        inv = pow(a[col][col], P - 2, P)
        for r in range(col + 1, n):
            f = a[r][col] * inv % P
            for c in range(col, n):
                a[r][c] = (a[r][c] - f * a[col][c]) % P
    assert det % P != 0


def test_hash_no_pad_matches_reference():
    for n in [1, 4, 8, 9, 16, 20]:
        vals = [v for s in [rand_state()] * 3 for v in s][:n]
        x = gl.from_int(np.array(vals, dtype=np.uint64))
        got = [int(v) for v in gl.to_int(pos.hash_no_pad(x))]
        assert got == pos.hash_no_pad_ref(vals), n


def test_two_to_one_matches_reference():
    l, r = rand_state()[:4], rand_state()[:4]
    got = [int(v) for v in gl.to_int(pos.hash_two_to_one(gl.from_int(l), gl.from_int(r)))]
    assert got == pos.hash_two_to_one_ref(l, r)


def test_batched_two_to_one():
    ls = np.array([rand_state()[:4] for _ in range(5)], dtype=np.uint64)
    rs = np.array([rand_state()[:4] for _ in range(5)], dtype=np.uint64)
    got = gl.to_int(pos.hash_two_to_one(gl.from_int(ls), gl.from_int(rs)))
    for i in range(5):
        want = pos.hash_two_to_one_ref([int(v) for v in ls[i]], [int(v) for v in rs[i]])
        assert [int(v) for v in got[i]] == want
