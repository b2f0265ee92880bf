"""Pallas fused NTT kernel vs the XLA staged path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.field import ntt as nttmod
from blobstreamx_tpu.ops.pallas import ntt as pntt


def _rand_polys(B, n, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, gl.P, size=(B, n), dtype=np.uint64)
    return jnp.asarray(gl.from_int_np(vals)), vals


def _check(B, n, inverse, seed):
    x, _ = _rand_polys(B, n, seed)
    want = np.asarray(gl.to_int(nttmod.ntt(x, inverse=inverse)))
    got = np.asarray(gl.to_int(pntt.ntt(x, inverse=inverse, interpret=True)))
    np.testing.assert_array_equal(got, want)


def test_forward_small():
    _check(B=5, n=16, inverse=False, seed=1)


def test_forward_256():
    _check(B=3, n=256, inverse=False, seed=2)


def test_inverse_roundtrip():
    x, vals = _rand_polys(4, 64, seed=3)
    back = pntt.ntt(pntt.ntt(x, interpret=True), inverse=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(gl.to_int(back)), vals)


def test_batch_tile_padding():
    # batch > 128 lanes to exercise the grid
    _check(B=130, n=32, inverse=False, seed=4)
