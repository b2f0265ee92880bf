"""FRI prove/verify round-trip, rejection of high-degree and tampered data."""

import numpy as np
import jax.numpy as jnp
import pytest

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.field import ntt as nttmod
from blobstreamx_tpu.proof import fri
from blobstreamx_tpu.proof.transcript import Transcript

pytestmark = pytest.mark.proof  # tiny-config proving tier (see pytest.ini)

RNG = np.random.default_rng(4)

CFG = fri.FriConfig(rate_bits=2, cap_height=1, num_query_rounds=10, pow_bits=4, final_poly_bits=2)
LOG_N = 8  # domain 256, degree < 64


def rand_ints(n):
    return [int(v) % gl.P for v in RNG.integers(0, 1 << 63, size=n, dtype=np.uint64)]


def low_degree_values(log_n, rate_bits):
    """Random degree < 2^(log_n - rate_bits) extension poly evaluated on g*K."""
    deg = 1 << (log_n - rate_bits)
    n = 1 << log_n
    comps = []
    for _ in range(2):
        coeffs = rand_ints(deg) + [0] * (n - deg)
        coeffs = nttmod.coset_shift(gl.from_int(coeffs), gl.GENERATOR)
        comps.append(nttmod.ntt(coeffs))
    return jnp.stack(comps, axis=-2)  # (n, 2, 2)


def values_lookup(values):
    arr = np.asarray(values)
    l0 = gl.to_int(arr[:, 0, :])
    l1 = gl.to_int(arr[:, 1, :])

    def f(round_i, q):
        return (int(l0[q]), int(l1[q]))

    return f


def test_fri_roundtrip():
    values = low_degree_values(LOG_N, CFG.rate_bits)
    proof, indices = fri.fri_prove(values, Transcript(), CFG)
    assert len(indices) == CFG.num_query_rounds
    assert fri.fri_verify(proof, LOG_N, Transcript(), CFG, values_lookup(values))


def test_fri_rejects_high_degree():
    n = 1 << LOG_N
    comps = [rand_ints(n), rand_ints(n)]  # random values: max degree whp
    values = jnp.stack([gl.from_int(c) for c in comps], axis=-2)
    proof, _ = fri.fri_prove(values, Transcript(), CFG)
    assert not fri.fri_verify(proof, LOG_N, Transcript(), CFG, values_lookup(values))


def test_fri_rejects_tampered_query_value():
    values = low_degree_values(LOG_N, CFG.rate_bits)
    proof, _ = fri.fri_prove(values, Transcript(), CFG)
    step = proof.query_rounds[0][1]
    step.pair_values = step.pair_values.copy()
    step.pair_values[0, 0, 0] ^= 1
    assert not fri.fri_verify(proof, LOG_N, Transcript(), CFG, values_lookup(values))


def test_fri_rejects_wrong_layer0_claim():
    values = low_degree_values(LOG_N, CFG.rate_bits)
    proof, _ = fri.fri_prove(values, Transcript(), CFG)
    lookup = values_lookup(values)

    def bad(round_i, q):
        v = lookup(round_i, q)
        return ((v[0] + 1) % gl.P, v[1])

    assert not fri.fri_verify(proof, LOG_N, Transcript(), CFG, bad)
