"""Sharded commit pipeline on the 8-virtual-device CPU mesh.

Proof tier: 8-virtual-device shard_map compilation takes minutes on a
2-vCPU host, which blew the fast tier's <2 min budget (VERDICT r4 Weak #2).
"""

import numpy as np
import jax
import pytest

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.proof

RNG = np.random.default_rng(7)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_commit_matches_replicated():
    m = pmesh.make_mesh(2, 4)
    B, C, n = 2, 8, 16
    traces = gl.from_int(
        RNG.integers(0, 1 << 63, size=(B, C, n), dtype=np.uint64) % gl.P
    )
    caps = pmesh.sharded_commit(traces, m, rate_bits=1, cap_height=0)
    want = pmesh.replicated_root_check(traces, rate_bits=1)
    assert np.array_equal(np.asarray(caps), np.asarray(want))


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape == (4, 2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
