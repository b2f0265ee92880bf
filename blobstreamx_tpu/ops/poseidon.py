"""Poseidon permutation over Goldilocks, width 12 — batched JAX + reference.

Capability parity with the reference prover's algebraic hasher (SURVEY.md D2:
plonky2 Poseidon width 12, 8 full + 22 partial rounds, x^7 S-box) which backs
Merkle-cap commitments and the Fiat-Shamir challenger. This is a fresh
instance, not a copy of plonky2's: the round constants are derived from a
nothing-up-my-sleeve SHA-256 counter stream and the MDS matrix is a Cauchy
matrix (guaranteed maximum-distance-separable), both generated at import
time from first principles.

Sponge parameters (mirroring the reference's layout so Merkle caps and the
transcript have the same shape): WIDTH=12, RATE=8, CAPACITY=4, digest = 4
field elements (256 bits of Goldilocks).

The batched permutation is pure jnp over (..., 12, 2) limb arrays; the MDS
layer is expressed as a broadcast multiply + tree reduction that XLA maps
onto the VPU. A Pallas/MXU limb-matmul variant is the planned fast path
(ops/pallas/), benchmarked by bench.py.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import jax.numpy as jnp

from ..field import goldilocks as gl

WIDTH = 12
RATE = 8
CAPACITY = 4
DIGEST = 4
FULL_ROUNDS = 8  # 4 before + 4 after the partial rounds
PARTIAL_ROUNDS = 22
N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS
SBOX_EXP = 7

_DOMAIN = b"blobstreamx-tpu/poseidon-goldilocks-w12/v1"


@functools.lru_cache(maxsize=None)
def round_constants() -> tuple:
    """360 field elements from a SHA-256 counter stream (rejection sampled)."""
    out = []
    counter = 0
    while len(out) < N_ROUNDS * WIDTH:
        h = hashlib.sha256(_DOMAIN + b"/rc/" + counter.to_bytes(8, "big")).digest()
        for off in range(0, 32, 8):
            v = int.from_bytes(h[off:off + 8], "big")
            if v < gl.P and len(out) < N_ROUNDS * WIDTH:
                out.append(v)
        counter += 1
    return tuple(out)


@functools.lru_cache(maxsize=None)
def mds_matrix() -> tuple:
    """12x12 Cauchy matrix M[i][j] = 1/(i + j + WIDTH) over GF(p).

    x_i = i and y_j = -(WIDTH + j) are pairwise distinct and x_i - y_j =
    i + j + WIDTH is never 0 mod p, so the matrix is MDS by construction.
    """
    m = []
    for i in range(WIDTH):
        row = []
        for j in range(WIDTH):
            row.append(pow(i + j + WIDTH, gl.P - 2, gl.P))
        m.append(tuple(row))
    return tuple(m)


@functools.lru_cache(maxsize=None)
def _device_constants():
    rc = np.array(round_constants(), dtype=np.uint64).reshape(N_ROUNDS, WIDTH)
    mds = np.array(mds_matrix(), dtype=np.uint64)
    return gl.from_int(rc), gl.from_int(mds)


def _sbox(x):
    x2 = gl.square(x)
    x3 = gl.mul(x2, x)
    x6 = gl.square(x3)
    return gl.mul(x6, x)


def _mds_layer(state, mds):
    """state: (..., 12, 2); mds: (12, 12, 2) -> (..., 12, 2).

    out[i] = sum_j mds[i, j] * state[j], as a broadcast multiply over a new
    row axis followed by a log-tree reduction (keeps everything in u32 ops).
    """
    prod = gl.mul(state[..., None, :, :], mds)  # (..., 12row, 12col, 2)
    acc = prod
    n = WIDTH
    # pad to 16 for a clean halving tree
    pad = [(0, 0)] * (acc.ndim - 3) + [(0, 0), (0, 16 - n), (0, 0)]
    acc = jnp.pad(acc, pad)
    k = 16
    while k > 1:
        k //= 2
        acc = gl.add(acc[..., :k, :], acc[..., k:2 * k, :])
    return acc[..., 0, :]


def permute(state: jnp.ndarray) -> jnp.ndarray:
    """Poseidon permutation, batched. state: (..., 12, 2) uint32 limbs."""
    rc, mds = _device_constants()
    half = FULL_ROUNDS // 2
    r = 0
    for _ in range(half):
        state = gl.add(state, rc[r])
        state = _sbox(state)
        state = _mds_layer(state, mds)
        r += 1
    for _ in range(PARTIAL_ROUNDS):
        state = gl.add(state, rc[r])
        lane0 = _sbox(state[..., 0:1, :])
        state = jnp.concatenate([lane0, state[..., 1:, :]], axis=-2)
        state = _mds_layer(state, mds)
        r += 1
    for _ in range(half):
        state = gl.add(state, rc[r])
        state = _sbox(state)
        state = _mds_layer(state, mds)
        r += 1
    return state


def hash_two_to_one(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Compress two 4-element digests -> 4-element digest.

    left/right: (..., 4, 2). Used for Merkle-cap inner nodes.
    """
    batch = left.shape[:-2]
    state = jnp.concatenate(
        [left, right, jnp.zeros(batch + (CAPACITY, 2), dtype=jnp.uint32)], axis=-2
    )
    return permute(state)[..., :DIGEST, :]


def hash_no_pad(inputs: jnp.ndarray) -> jnp.ndarray:
    """Sponge-hash (..., n, 2) field elements -> (..., 4, 2) digest.

    Absorbs RATE elements per permutation, no padding (fixed-length use
    only, mirroring the reference hasher's hash_no_pad semantics).
    """
    batch = inputs.shape[:-2]
    n = inputs.shape[-2]
    state = jnp.zeros(batch + (WIDTH, 2), dtype=jnp.uint32)
    for off in range(0, n, RATE):
        chunk = inputs[..., off:off + RATE, :]
        c = chunk.shape[-2]
        state = jnp.concatenate([chunk, state[..., c:, :]], axis=-2)
        state = permute(state)
    return state[..., :DIGEST, :]


# ---------------------------------------------------------------------------
# Pure-python reference
# ---------------------------------------------------------------------------

def permute_ref(state: list) -> list:
    """Python-int reference permutation on a list of 12 ints."""
    rc = round_constants()
    mds = mds_matrix()
    s = list(state)
    P = gl.P

    def sbox(x):
        return pow(x, SBOX_EXP, P)

    def mds_apply(v):
        return [sum(mds[i][j] * v[j] for j in range(WIDTH)) % P for i in range(WIDTH)]

    r = 0
    half = FULL_ROUNDS // 2
    for _ in range(half):
        s = [(s[i] + rc[r * WIDTH + i]) % P for i in range(WIDTH)]
        s = [sbox(x) for x in s]
        s = mds_apply(s)
        r += 1
    for _ in range(PARTIAL_ROUNDS):
        s = [(s[i] + rc[r * WIDTH + i]) % P for i in range(WIDTH)]
        s[0] = sbox(s[0])
        s = mds_apply(s)
        r += 1
    for _ in range(half):
        s = [(s[i] + rc[r * WIDTH + i]) % P for i in range(WIDTH)]
        s = [sbox(x) for x in s]
        s = mds_apply(s)
        r += 1
    return s


def hash_no_pad_ref(inputs: list) -> list:
    state = [0] * WIDTH
    for off in range(0, len(inputs), RATE):
        chunk = inputs[off:off + RATE]
        state = list(chunk) + state[len(chunk):]
        state = permute_ref(state)
    return state[:DIGEST]


def hash_two_to_one_ref(left: list, right: list) -> list:
    state = list(left) + list(right) + [0] * CAPACITY
    return permute_ref(state)[:DIGEST]
