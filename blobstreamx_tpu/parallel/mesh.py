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

import contextlib
import functools
from typing import Optional

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


# ---------------------------------------------------------------------------
# mesh context: route the REAL prover (proof/stark.py, proof/fri.py)
# through sharded kernels — SURVEY.md section 2c north star ("shard trace
# columns + LDE cosets across chips"), producing byte-identical proofs.
# ---------------------------------------------------------------------------

_ACTIVE: Optional[Mesh] = None


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    """Within this context, proof/stark.py's LDE+commit and proof/fri.py's
    folds/leaf hashing run as shard_map programs over `mesh` (columns /
    rows / fold lanes partitioned over devices, collectives over ICI on
    real hardware). Field math is exact integer arithmetic, so the proof
    bytes are identical to the single-device path (tested in
    tests/test_sharded_prover.py)."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = mesh
    try:
        yield mesh
    finally:
        _ACTIVE = prev


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE


@functools.lru_cache(maxsize=None)
def _flat_mesh_cached(devs_key):
    devices = [jax.devices()[i] for i in devs_key]
    return Mesh(np.array(devices), ("shard",))


def _flat_mesh(mesh: Mesh) -> Mesh:
    ids = tuple(int(d.id) for d in np.array(mesh.devices).reshape(-1))
    return _flat_mesh_cached(ids)


def _shard_map1(fn, mesh: Mesh, ndim: int):
    """shard_map of fn over axis 0 of a single array arg."""
    fm = _flat_mesh(mesh)
    spec = P(*(["shard"] + [None] * (ndim - 1)))
    kwargs = dict(mesh=fm, in_specs=spec, out_specs=spec)
    try:
        return shard_map(fn, check_vma=False, **kwargs), fm
    except TypeError:
        try:
            return shard_map(fn, check_rep=False, **kwargs), fm
        except TypeError:
            return shard_map(fn, **kwargs), fm


def _pad_to(x: jnp.ndarray, mult: int):
    n = x.shape[0]
    rem = (-n) % mult
    if rem:
        pad = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad), n
    return x, n


def sharded_lde(cols: jnp.ndarray, rate_bits: int, mesh: Mesh):
    """Column-sharded coset LDE: cols (C, n, 2) -> (coeffs (C, n, 2),
    lde (C, N, 2)). Each device iNTT/NTTs its own column shard (columns
    are independent — the "TP" analogue of SURVEY.md 2c); zero-pad C to
    the device count."""
    n_dev = int(np.array(mesh.devices).size)
    padded, C = _pad_to(cols, n_dev)

    def step(c):
        coeffs = nttmod.ntt(c, inverse=True)
        n = c.shape[1]
        N = n << rate_bits
        p = jnp.pad(coeffs, [(0, 0), (0, N - n), (0, 0)])
        shifted = nttmod.coset_shift(p, gl.GENERATOR)
        return coeffs, nttmod.ntt(shifted)

    fm = _flat_mesh(mesh)
    spec = P("shard", None, None)
    kwargs = dict(mesh=fm, in_specs=spec, out_specs=(spec, spec))
    try:
        fn = shard_map(step, check_vma=False, **kwargs)
    except TypeError:
        try:
            fn = shard_map(step, check_rep=False, **kwargs)
        except TypeError:
            fn = shard_map(step, **kwargs)
    coeffs, lde = fn(padded)
    return coeffs[:C], lde[:C]


def sharded_leaf_digests(rows: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Row-sharded Poseidon leaf hashing: rows (N, w, 2) -> (N, 4, 2)."""
    n_dev = int(np.array(mesh.devices).size)
    padded, N = _pad_to(rows, n_dev)
    fn, fm = _shard_map1(pos.hash_no_pad, mesh, 3)
    return fn(padded)[:N]


def sharded_fold(a: jnp.ndarray, b: jnp.ndarray, inv_x: jnp.ndarray,
                 beta, mesh: Mesh) -> jnp.ndarray:
    """Elementwise FRI fold lanes sharded over devices:
    v' = ((a+b) + beta*(a-b)*inv_x) / 2; a, b: (half, 2, 2)."""
    from ..field import extension as ext

    INV2 = pow(2, gl.P - 2, gl.P)
    half = a.shape[0]
    n_dev = int(np.array(mesh.devices).size)
    if half % n_dev:
        # tail layers are tiny; fold on one device
        beta_arr = jnp.broadcast_to(ext.from_int_pair(beta[0], beta[1]),
                                    (half, 2, 2))
        term = ext.mul(ext.scalar_mul(ext.sub(a, b), inv_x), beta_arr)
        folded = ext.add(ext.add(a, b), term)
        return ext.scalar_mul(folded, jnp.broadcast_to(gl.from_int(INV2),
                                                       (half, 2)))
    beta0, beta1 = int(beta[0]), int(beta[1])

    def step(a_l, b_l, ix_l):
        beta_arr = jnp.broadcast_to(
            ext.from_int_pair(np.uint64(beta0), np.uint64(beta1)),
            a_l.shape)
        term = ext.mul(ext.scalar_mul(ext.sub(a_l, b_l), ix_l), beta_arr)
        folded = ext.add(ext.add(a_l, b_l), term)
        return ext.scalar_mul(
            folded, jnp.broadcast_to(gl.from_int(INV2), a_l.shape[:1] + (2,)))

    fm = _flat_mesh(mesh)
    spec3 = P("shard", None, None)
    spec2 = P("shard", None)
    kwargs = dict(mesh=fm, in_specs=(spec3, spec3, spec2),
                  out_specs=spec3)
    try:
        f = shard_map(step, check_vma=False, **kwargs)
    except TypeError:
        try:
            f = shard_map(step, check_rep=False, **kwargs)
        except TypeError:
            f = shard_map(step, **kwargs)
    return f(a, b, inv_x)


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
