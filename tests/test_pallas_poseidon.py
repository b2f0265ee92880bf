"""Pallas Poseidon kernel (ops/pallas/poseidon.py): bit-exactness vs the
shared python/XLA algebra, in interpret mode on CPU (the real kernel is
exercised on TPU by bench.py). Ragged batches check the pad/unpad path."""

import numpy as np
import pytest

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.ops import poseidon as pos
from blobstreamx_tpu.ops.pallas import poseidon as ppos

pytestmark = pytest.mark.proof  # pallas-interpret on CPU: minutes per case


@pytest.mark.parametrize("batch", [
    7,
    pytest.param(1, marks=pytest.mark.slow),
    pytest.param(128, marks=pytest.mark.slow),
])
def test_pallas_interpret_matches_python(batch):
    rng = np.random.default_rng(batch)
    state = gl.from_int(
        rng.integers(0, 1 << 63, size=(batch, 12), dtype=np.uint64) % gl.P
    )
    out = ppos.permute(state, interpret=True)
    out_np = np.asarray(out)
    for i in range(batch):
        got = [int(v) for v in gl.to_int(out_np[i])]
        want = pos.permute_py(
            [int(v) for v in gl.to_int(np.asarray(state[i]))])
        assert got == want, f"row {i}"


@pytest.mark.slow
def test_pallas_interpret_nd_batch():
    rng = np.random.default_rng(9)
    state = gl.from_int(
        rng.integers(0, 1 << 63, size=(3, 5, 12), dtype=np.uint64) % gl.P
    )
    out = np.asarray(ppos.permute(state, interpret=True))
    assert out.shape == (3, 5, 12, 2)
    got = [int(v) for v in gl.to_int(out[2, 4])]
    want = pos.permute_py(
        [int(v) for v in gl.to_int(np.asarray(state[2, 4]))])
    assert got == want
