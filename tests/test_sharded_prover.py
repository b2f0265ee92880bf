"""The REAL prover through the mesh (VERDICT r4 Next #4): with
parallel/mesh.use_mesh active, proof/stark.py column-shards the LDE,
row-shards Poseidon leaf hashing, and proof/fri.py shards fold lanes and
layer hashing over devices — and the proof bytes are IDENTICAL to the
single-device path (exact integer field math).
"""

import numpy as np
import jax
import pytest

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.parallel import mesh as pmesh
from blobstreamx_tpu.proof import serde, stark, system
from blobstreamx_tpu.proof.air import Air

pytestmark = pytest.mark.proof

CFG = stark.StarkConfig(rate_bits=3, cap_height=1, num_query_rounds=8,
                        pow_bits=4, final_poly_bits=2)


class FibAir(Air):
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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_prove_bytes_identical_and_verifies():
    n = 64
    trace = fib_trace(n)
    publics = [1, 1, int(trace[-1, 1])]
    air = FibAir()
    spec = [system.TableSpec("fib", air, trace, publics)]

    baseline = system.prove_system(spec, CFG)
    mesh = pmesh.make_mesh(2, 4)
    with pmesh.use_mesh(mesh):
        assert pmesh.active_mesh() is mesh
        sharded = system.prove_system(spec, CFG)
    assert pmesh.active_mesh() is None

    # byte-identical proofs through the mesh
    assert serde.dumps(sharded) == serde.dumps(baseline)
    # and the sharded proof verifies like any other
    assert system.verify_system(
        [air], [publics], sharded, CFG,
        public_messages=[])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_helpers_match_dense():
    """Unit check of each sharded kernel vs its dense counterpart."""
    from blobstreamx_tpu.field import ntt as nttmod
    from blobstreamx_tpu.ops import poseidon as pos
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    mesh = pmesh.make_mesh(2, 4)

    # LDE: C=5 columns (not divisible by 8 -> exercises padding)
    cols = gl.from_int(
        rng.integers(0, 1 << 63, size=(5, 16), dtype=np.uint64) % gl.P)
    coeffs_s, lde_s = pmesh.sharded_lde(cols, 2, mesh)
    coeffs_d = nttmod.ntt(cols, inverse=True)
    padded = jnp.pad(coeffs_d, [(0, 0), (0, 64 - 16), (0, 0)])
    lde_d = nttmod.ntt(nttmod.coset_shift(padded, gl.GENERATOR))
    assert np.array_equal(np.asarray(coeffs_s), np.asarray(coeffs_d))
    assert np.array_equal(np.asarray(lde_s), np.asarray(lde_d))

    # leaf digests
    rows = gl.from_int(
        rng.integers(0, 1 << 63, size=(64, 6), dtype=np.uint64) % gl.P)
    d_s = pmesh.sharded_leaf_digests(rows, mesh)
    d_d = pos.hash_no_pad(rows)
    assert np.array_equal(np.asarray(d_s), np.asarray(d_d))
