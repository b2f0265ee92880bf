"""Merkle-cap vector commitments over Poseidon — batched JAX tree build.

Capability parity with the reference prover's Merkle-cap polynomial
commitments (SURVEY.md D4). A commitment to a matrix of leaves
``(n_leaves, leaf_width)`` is the list of 2^cap_height digests at depth
``log2(n) - cap_height``; openings carry sibling digests up to the cap.

Tree construction is fully batched: one Poseidon sponge call hashes every
leaf row at once, then log2(n) batched two-to-one rounds build the layers.
This is the shape that later becomes a Pallas kernel / sharded collective
reduction (SURVEY.md section 2c).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np
import jax.numpy as jnp

from ..field import goldilocks as gl
from ..ops import poseidon as pos


@dataclass
class MerkleTree:
    """Host-resident commitment: leaf digests + all interior layers.

    layers[0] is the leaf-digest layer (n, 4, 2); layers[-1] is the cap
    (2^cap_height, 4, 2). Leaves themselves are kept by the caller (the
    polynomial oracle) for openings.
    """

    layers: List[np.ndarray]
    cap_height: int

    @property
    def cap(self) -> np.ndarray:
        return self.layers[-1]

    def cap_ints(self) -> list:
        """Cap digests as python int lists (for the transcript)."""
        return [[int(v) for v in gl.to_int(d)] for d in self.cap]

    def open(self, index: int) -> List[np.ndarray]:
        """Sibling digests from leaf level up to (excluding) the cap."""
        out = []
        idx = index
        for layer in self.layers[:-1]:
            out.append(np.asarray(layer[idx ^ 1]))
            idx >>= 1
        return out


_UNROLL_FLOOR = 4096


def device_tree_root(digests: jnp.ndarray, cap_height: int = 0) -> jnp.ndarray:
    """Reduce leaf digests (..., n, 4, 2) to the cap (..., 2^cap_height,
    4, 2) on device with ONE permutation instance (lax.fori_loop with a
    fixed-shape buffer; level l re-hashes the buffer front — log2(n)/2x
    redundant hashes, traded for a compile-size win: XLA:CPU compile time
    is superlinear in graph size, so per-level unrolled trees with one
    permute instance each are pathological there)."""
    import jax

    n = digests.shape[-3]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    levels = log_n - cap_height
    if levels <= 0:
        return digests

    if pos._on_tpu():
        # TPU: unroll the LARGE levels with shrinking shapes (each level
        # halves the work, vs the fori_loop form's fixed-size re-hash =
        # log2(n)/2x redundancy), but only while a level still holds >=
        # _UNROLL_FLOOR digests — below that the work is negligible and
        # each extra shape would cost its own kernel compile. The small
        # tail reuses the single fixed-shape fori_loop instance.
        cur = digests
        while cur.shape[-3] > max(_UNROLL_FLOOR, 1 << cap_height):
            cur = pos.hash_two_to_one(cur[..., 0::2, :, :],
                                      cur[..., 1::2, :, :])
        digests = cur
        n = digests.shape[-3]
        log_n = n.bit_length() - 1
        levels = log_n - cap_height
        if levels <= 0:
            return digests

    def body(_, buf):
        h = pos.hash_two_to_one(buf[..., 0::2, :, :], buf[..., 1::2, :, :])
        return jnp.concatenate([h, h], axis=-3)

    buf = jax.lax.fori_loop(0, levels, body, digests)
    return buf[..., : (1 << cap_height), :, :]


def _build_tree_native(leaves_np: np.ndarray, cap_height: int) -> MerkleTree:
    """Host C++ tree build (native/bsx_merkle_tree): ~1-2 us per hash vs
    the XLA u32-limb path which is both compile- and dispatch-bound on
    small CPU hosts. leaves_np: (n, w) uint64."""
    from .. import native

    n, w = leaves_np.shape
    n_levels = (n.bit_length() - 1) - cap_height
    flat = native.merkle_tree(np.ascontiguousarray(leaves_np), n, w, n_levels)
    layers = []
    off = 0
    m = n
    for _ in range(n_levels + 1):
        layers.append(gl.from_int_np(flat[off:off + m * 4].reshape(m, 4)))
        off += m * 4
        m //= 2
    return MerkleTree(layers=layers, cap_height=cap_height)


def build_tree(leaves: jnp.ndarray, cap_height: int = 0) -> MerkleTree:
    """leaves: (n, w, 2) field-element rows; n a power of two >= 2^cap_height."""
    n = leaves.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n and cap_height <= log_n
    if not pos._on_tpu():
        from .. import native

        if native.available():
            return _build_tree_native(gl.to_int(np.asarray(leaves)),
                                      cap_height)
    digests = pos.hash_no_pad(leaves)  # (n, 4, 2)
    layers = [np.asarray(digests)]
    cur = digests
    for _ in range(log_n - cap_height):
        cur = pos.hash_two_to_one(cur[0::2], cur[1::2])
        layers.append(np.asarray(cur))
    return MerkleTree(layers=layers, cap_height=cap_height)


def build_tree_from_digests(digests: jnp.ndarray,
                            cap_height: int = 0) -> MerkleTree:
    """Tree from precomputed leaf digests (n, 4, 2) — the sharded-prover
    path (parallel/mesh.sharded_leaf_digests hashes rows across devices;
    the small upper layers build here). Bit-identical to build_tree."""
    n = digests.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n and cap_height <= log_n
    layers = [np.asarray(digests)]
    cur = digests
    for _ in range(log_n - cap_height):
        cur = pos.hash_two_to_one(cur[0::2], cur[1::2])
        layers.append(np.asarray(cur))
    return MerkleTree(layers=layers, cap_height=cap_height)


def verify_opening(
    leaf_row: np.ndarray,
    index: int,
    siblings: List[np.ndarray],
    cap: np.ndarray,
) -> bool:
    """Recompute the path from a leaf row to the cap (host-side, small)."""
    digest = pos.hash_no_pad(jnp.asarray(leaf_row))
    idx = index
    for sib in siblings:
        sib = jnp.asarray(sib)
        if idx & 1:
            digest = pos.hash_two_to_one(sib, digest)
        else:
            digest = pos.hash_two_to_one(digest, sib)
        idx >>= 1
    return bool(np.array_equal(np.asarray(digest), np.asarray(cap[idx])))
