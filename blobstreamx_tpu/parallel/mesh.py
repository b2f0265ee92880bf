"""Multi-chip proving: mesh definition + sharded commit pipeline.

The reference's parallelism is rayon multicore + platform-distributed map
jobs (SURVEY.md section 2c / D19). The TPU-native equivalents here:

  * data parallelism ("data" axis): independent leaf proofs / trace batches
    per device — the analogue of the reference's NB_MAP_JOBS distribution;
  * intra-proof sharding ("col" axis): trace columns NTT'd per device
    (columns are independent), then an all_to_all reshards columns->rows so
    each device Poseidon-hashes full leaf rows, builds its local subtree,
    and an all_gather assembles the Merkle cap. These collectives ride ICI
    on real hardware; the driver dry-runs them on virtual CPU devices.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..field import goldilocks as gl
from ..field import ntt as nttmod
from ..ops import poseidon as pos
from ..proof import merkle_cap


def make_mesh(n_data: int, n_col: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_col
    arr = np.array(devices[: n_data * n_col]).reshape(n_data, n_col)
    return Mesh(arr, ("data", "col"))


def _local_commit(cols: jnp.ndarray, rate_bits: int):
    """Per-shard: LDE own columns. cols: (C_local, n, 2) -> (C_local, N, 2)."""
    coeffs = nttmod.ntt(cols, inverse=True)
    n = cols.shape[1]
    N = n << rate_bits
    padded = jnp.pad(coeffs, [(0, 0), (0, N - n), (0, 0)])
    shifted = nttmod.coset_shift(padded, gl.GENERATOR)
    return nttmod.ntt(shifted)


def sharded_commit(traces: jnp.ndarray, mesh: Mesh, rate_bits: int = 3,
                   cap_height: int = 0) -> jnp.ndarray:
    """Batched sharded trace commitment.

    traces: (B, C, n, 2) — B independent traces (data-parallel), C columns
    (column-sharded). Returns caps (B, 2^cap_height, 4, 2) replicated.

    Pipeline per data shard:
      LDE (cols local) -> all_to_all (cols -> rows) -> leaf sponge ->
      local subtree -> all_gather (subtree roots) -> top layers.
    """
    n_col = mesh.shape["col"]

    def step(tr):  # tr: (B_local, C_local, n, 2)
        B, C_local, n, _ = tr.shape
        lde = jax.vmap(lambda c: _local_commit(c, rate_bits))(tr)
        N = n << rate_bits
        # reshard: split rows into n_col chunks, exchange so each device
        # ends with all columns of its row chunk
        rows_per = N // n_col
        x = lde.reshape(B, C_local, n_col, rows_per, 2)
        x = jnp.moveaxis(x, 2, 0)  # (n_col, B, C_local, rows_per, 2)
        x = jax.lax.all_to_all(x, "col", split_axis=0, concat_axis=0, tiled=False)
        # now x: (n_col, B, C_local, rows_per, 2) where axis 0 indexes the
        # SOURCE shard; global column index = src * C_local + own_c, so the
        # flatten must be source-major (jax >= 0.9 all_to_all layout)
        x = jnp.moveaxis(x, 0, 1)  # (B, n_col, C_local, rows_per, 2)
        x = x.reshape(B, n_col * C_local, rows_per, 2)
        rows = jnp.moveaxis(x, 1, 2)  # (B, rows_per, C_total, 2)
        digests = pos.hash_no_pad(rows)  # (B, rows_per, 4, 2)
        # local subtree down to one root per device (single-instance loop)
        local_root = merkle_cap.device_tree_root(digests)[:, 0]  # (B, 4, 2)
        all_roots = jax.lax.all_gather(local_root, "col")  # (n_col, B, 4, 2)
        all_roots = jnp.moveaxis(all_roots, 0, 1)  # (B, n_col, 4, 2)
        return merkle_cap.device_tree_root(all_roots, cap_height)

    kwargs = dict(
        mesh=mesh,
        in_specs=P("data", "col", None, None),
        out_specs=P("data", None, None, None),
    )
    try:
        # the all_gather makes the output replicated over "col", but the
        # static VMA/rep checker cannot infer that — disable it (flag name
        # varies across jax versions)
        fn = shard_map(step, check_vma=False, **kwargs)
    except TypeError:
        try:
            fn = shard_map(step, check_rep=False, **kwargs)
        except TypeError:
            fn = shard_map(step, **kwargs)
    return fn(traces)


def replicated_root_check(traces: jnp.ndarray, rate_bits: int = 3) -> jnp.ndarray:
    """Single-device reference for sharded_commit (cap_height=0)."""
    B = traces.shape[0]
    lde = jax.vmap(lambda c: _local_commit(c, rate_bits))(traces)
    rows = jnp.moveaxis(lde, 1, 2)  # (B, N, C, 2)
    digests = pos.hash_no_pad(rows)
    return merkle_cap.device_tree_root(digests)  # (B, 1, 4, 2)
