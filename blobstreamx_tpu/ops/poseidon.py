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
import jax
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
    """numpy constants (cached as numpy: safe across jit traces)."""
    rc = np.array(round_constants(), dtype=np.uint64).reshape(N_ROUNDS, WIDTH)
    return gl.from_int_np(rc), None


def _sbox(x):
    x2 = gl.square(x)
    x3 = gl.mul(x2, x)
    x6 = gl.square(x3)
    return gl.mul(x6, x)


_LIMB_BITS = 7
_N_LIMBS = 10  # ceil(64 / 7)
_N_BUCKETS = 2 * _N_LIMBS - 1  # 19


@functools.lru_cache(maxsize=None)
def _mds_limb_tensor():
    """(12, 12, 10, 19) int8: M2[i,j,l,s] = limb_{s-l}(mds[i][j]).

    Lets the whole MDS matvec + limb cross-products collapse into ONE
    integer einsum: bucket[b,i,s] = sum_{j,l} state_limb[b,j,l]*M2[i,j,l,s].
    7-bit limbs keep every product and the 120-term contraction within
    int32 (and the int8 operands feed the MXU on TPU).
    """
    mds = mds_matrix()
    m2 = np.zeros((WIDTH, WIDTH, _N_LIMBS, _N_BUCKETS), dtype=np.int8)
    for i in range(WIDTH):
        for j in range(WIDTH):
            v = mds[i][j]
            limbs = [(v >> (_LIMB_BITS * m)) & 0x7F for m in range(_N_LIMBS)]
            for l in range(_N_LIMBS):
                for m in range(_N_LIMBS):
                    m2[i, j, l, l + m] = limbs[m]
    return m2


def _to_limbs(state):
    """(..., 12, 2) u32 pairs -> (..., 12, 10) int8 7-bit limbs."""
    lo = state[..., 0]
    hi = state[..., 1]
    mask = np.uint32(0x7F)  # numpy scalar: pallas-safe literal
    limbs = []
    for m in range(_N_LIMBS):
        s = _LIMB_BITS * m
        if s + _LIMB_BITS <= 32:
            limb = (lo >> s) & mask
        elif s >= 32:
            limb = (hi >> (s - 32)) & mask
        else:
            limb = ((lo >> s) | (hi << (32 - s))) & mask
        limbs.append(limb)
    return jnp.stack(limbs, axis=-1).astype(jnp.int8)


def _from_buckets(buckets):
    """(..., 12, 19) int32 bucket sums -> (..., 12, 2) canonical field elems.

    value = sum_s bucket_s * 2^(7s)  (a <2^148 integer), accumulated into
    five u32 limbs with carry chains, then reduced mod p.
    """
    b32 = buckets.astype(jnp.uint32)
    shape = buckets.shape[:-1]
    L = [jnp.zeros(shape, dtype=jnp.uint32) for _ in range(5)]

    def acc(idx, v):
        for k in range(idx, 5):
            L[k], carry = gl._addc(L[k], v)
            v = carry
        # carries cannot escape limb 4 (value < 2^160)

    for s in range(_N_BUCKETS):
        pos = _LIMB_BITS * s
        li, off = pos >> 5, pos & 31
        b = b32[..., s]
        if off == 0:
            acc(li, b)
        else:
            acc(li, b << off)
            acc(li + 1, b >> (32 - off))
    lo, hi = gl._reduce160(*L)
    return jnp.stack([lo, hi], axis=-1)


@functools.lru_cache(maxsize=None)
def _mds_field_np():
    """(12, 12, 2) u32-limb MDS matrix for the field-arithmetic path."""
    m = np.array(mds_matrix(), dtype=np.uint64)
    return gl.from_int_np(m)


def _mds_layer_field(state):
    """Plain field-arithmetic MDS: out[i] = sum_j mds[i,j] * state[j].

    One broadcasted gl.mul over (..., 12, 12, 2) + a log-depth modular add
    reduction. The CPU path: XLA:CPU lowers the int8 einsum of
    _mds_layer_mxu to a scalar loop that is ~100x slower than this."""
    prod = gl.mul(state[..., None, :, :], jnp.asarray(_mds_field_np()))
    # prod: (..., 12 out-lanes, 12 j-terms, 2); reduce the j axis (-2)
    x = gl.add(prod[..., 0::2, :], prod[..., 1::2, :])  # 12 -> 6
    x = gl.add(x[..., 0::2, :], x[..., 1::2, :])        # 6 -> 3
    return gl.add(gl.add(x[..., 0, :], x[..., 1, :]), x[..., 2, :])


def _mds_layer_mxu(state):
    """int8-limb einsum MDS (feeds the MXU on TPU)."""
    limbs = _to_limbs(state)
    buckets = jnp.einsum(
        "...jl,ijls->...is",
        limbs,
        _mds_limb_tensor(),
        preferred_element_type=jnp.int32,
    )
    return _from_buckets(buckets)


def _mds_layer_f32(state):
    """float32-limb einsum MDS for CPU: bucket sums stay exact (7-bit
    limbs: max bucket < 2^21 < 2^24 f32 mantissa) and XLA:CPU lowers the
    f32 einsum to a real SGEMM — the int8 einsum falls off Eigen's fast
    paths there (scalar loops, ~1000x slower)."""
    limbs = _to_limbs(state).astype(jnp.float32)
    buckets = jnp.einsum(
        "...jl,ijls->...is",
        limbs,
        _mds_limb_tensor().astype(np.float32),
    ).astype(jnp.int32)
    return _from_buckets(buckets)


def _mds_layer(state, mds=None):
    """state: (..., 12, 2) -> (..., 12, 2). Backend-dispatched at trace
    time: the int8 einsum feeds the MXU on TPU; XLA:CPU lowers that einsum
    pathologically (both compile AND runtime), so CPU uses the plain
    field-arithmetic MDS. CPU callers must keep permutation *instance
    counts* low (shared loop bodies — see merkle_cap.device_tree_root)
    because XLA:CPU compile time is superlinear in graph size; the CPU
    runtime hot path is the native C++ tree builder anyway."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = True
    return _mds_layer_mxu(state) if on_tpu else _mds_layer_f32(state)


def _permute_impl(state: jnp.ndarray) -> jnp.ndarray:
    rc, _ = _device_constants()
    half = FULL_ROUNDS // 2
    s = state
    for r in range(half):
        s = gl.add(s, rc[r])
        s = _sbox(s)
        s = _mds_layer(s)
    for r in range(half, half + PARTIAL_ROUNDS):
        s = gl.add(s, rc[r])
        lane0 = _sbox(s[..., 0:1, :])
        s = jnp.concatenate([lane0, s[..., 1:, :]], axis=-2)
        s = _mds_layer(s)
    for r in range(half + PARTIAL_ROUNDS, N_ROUNDS):
        s = gl.add(s, rc[r])
        s = _sbox(s)
        s = _mds_layer(s)
    return s


def _permute_scan(state: jnp.ndarray) -> jnp.ndarray:
    """lax.scan-based permutation: ~30x smaller traced graph than the
    unrolled body. Used where compile time dominates (multi-hash pipelines
    like the sharded mesh commit, tiny-shape dryruns); the unrolled/pallas
    paths stay the runtime hot path."""
    rc, _ = _device_constants()
    rc = jnp.asarray(rc)  # (30, 12, 2)
    half = FULL_ROUNDS // 2

    def full_round(s, r):
        s = gl.add(s, rc[r])
        s = _sbox(s)
        return _mds_layer(s), None

    def partial_round(s, r):
        s = gl.add(s, rc[r])
        lane0 = _sbox(s[..., 0:1, :])
        s = jnp.concatenate([lane0, s[..., 1:, :]], axis=-2)
        return _mds_layer(s), None

    s, _ = jax.lax.scan(full_round, state, jnp.arange(half))
    s, _ = jax.lax.scan(partial_round, s,
                        jnp.arange(half, half + PARTIAL_ROUNDS))
    s, _ = jax.lax.scan(full_round, s,
                        jnp.arange(half + PARTIAL_ROUNDS, N_ROUNDS))
    return s


# Graph-shape policy: XLA-CPU's compile time is superlinear in graph size
# on this class of host (measured: ~50 ops -> 0.2 s, ~4k ops -> >9 min), so
# traced permutations on CPU use the lax.scan body (30x smaller graph);
# TPU (fast remote compiler) keeps the unrolled body / pallas kernel.
# Override with UNROLL = True/False.
UNROLL = None  # None = decide from backend at call time


def _unroll() -> bool:
    if UNROLL is not None:
        return UNROLL
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return True


def _permute_scan_field(state: jnp.ndarray) -> jnp.ndarray:
    """Scan body with the field-arithmetic MDS: the big-batch CPU path —
    one ~20 s compile, then memory-bandwidth runtime (the einsum MDS
    lowers to a scalar loop on XLA:CPU, ~100x slower at runtime)."""
    rc, _ = _device_constants()
    rc = jnp.asarray(rc)
    half = FULL_ROUNDS // 2

    def full_round(s, r):
        s = gl.add(s, rc[r])
        s = _sbox(s)
        return _mds_layer_field(s), None

    def partial_round(s, r):
        s = gl.add(s, rc[r])
        lane0 = _sbox(s[..., 0:1, :])
        s = jnp.concatenate([lane0, s[..., 1:, :]], axis=-2)
        return _mds_layer_field(s), None

    s, _ = jax.lax.scan(full_round, state, jnp.arange(half))
    s, _ = jax.lax.scan(partial_round, s,
                        jnp.arange(half, half + PARTIAL_ROUNDS))
    s, _ = jax.lax.scan(full_round, s,
                        jnp.arange(half + PARTIAL_ROUNDS, N_ROUNDS))
    return s


_permute_jit = jax.jit(_permute_impl)
_permute_scan_jit = jax.jit(_permute_scan)
_permute_scan_field_jit = jax.jit(_permute_scan_field)

# Batch size at/above which the jitted permutation is used. Small batches run
# eagerly: XLA-CPU compiles this graph slowly, and eager per-op dispatch is
# cheap relative to tiny array work (tests). Large batches (the prover hot
# path, bench) amortize one cached compile. Override with JIT_THRESHOLD.
JIT_THRESHOLD = 2048


def _batch_size(shape) -> int:
    n = 1
    for d in shape:
        n *= d
    return n


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def permute(state: jnp.ndarray) -> jnp.ndarray:
    """Poseidon permutation, batched. state: (..., 12, 2) uint32 limbs.

    Large batches on TPU run the fused Pallas kernel (all 30 rounds
    VMEM-resident — ops/pallas/poseidon.py); elsewhere the einsum-based
    XLA path (rounds unrolled: XLA loop primitives compile pathologically
    slowly for this body). Small batches dispatch eagerly.
    """
    import jax.core as _core

    if isinstance(state, _core.Tracer):
        # inside an outer trace (mesh pipelines, circuit proving graphs):
        # choose the graph shape by backend (see _unroll)
        return _permute_impl(state) if _unroll() else _permute_scan(state)
    if _batch_size(state.shape[:-2]) >= JIT_THRESHOLD:
        if _on_tpu():
            from .pallas import poseidon as ppos

            return ppos.permute(state)
        native = _get_native()
        if native:
            # big-batch on CPU: the C++ kernel. XLA:CPU handles this class
            # of u32-limb hash batch pathologically (compile-time blowups
            # on unrolled/field bodies, scalar-loop lowerings on the int8
            # einsum) — measured 100-1000x slower than native.
            shape = state.shape
            ints = gl.to_int(np.asarray(state)).reshape(-1, WIDTH)
            ints = np.ascontiguousarray(ints)
            native.LIB.bsx_poseidon_permute_batch(
                ints.ctypes.data_as(
                    __import__("ctypes").POINTER(__import__("ctypes").c_uint64)),
                ints.shape[0],
            )
            return jnp.asarray(gl.from_int_np(ints).reshape(shape))
        return _permute_scan_field_jit(state)
    return _permute_impl(state)  # eager small-batch: per-op dispatch, no jit


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
# Host-side permutation: native C++ kernel when available (transcript/grind/
# verifier hot path — see blobstreamx_tpu/native), python-int fallback.
# ---------------------------------------------------------------------------

_native = None


def _get_native():
    """Lazy import (native/build.py imports this module for constants)."""
    global _native
    if _native is None:
        from .. import native as _n
        _native = _n if _n.available() else False
    return _native


def permute_ref(state: list) -> list:
    """Host permutation on a list of 12 ints (native C++ if built)."""
    n = _get_native()
    if n:
        return n.permute(state)
    return permute_py(state)


def hash_no_pad_ref(inputs: list) -> list:
    n = _get_native()
    if n:
        return n.hash_no_pad(inputs)
    return hash_no_pad_py(inputs)


def hash_two_to_one_ref(left: list, right: list) -> list:
    n = _get_native()
    if n:
        return n.hash_two_to_one(left, right)
    return hash_two_to_one_py(left, right)


# ---------------------------------------------------------------------------
# Pure-python reference
# ---------------------------------------------------------------------------

def permute_py(state: list) -> list:
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


def hash_no_pad_py(inputs: list) -> list:
    state = [0] * WIDTH
    for off in range(0, len(inputs), RATE):
        chunk = inputs[off:off + RATE]
        state = list(chunk) + state[len(chunk):]
        state = permute_py(state)
    return state[:DIGEST]


def hash_two_to_one_py(left: list, right: list) -> list:
    state = list(left) + list(right) + [0] * CAPACITY
    return permute_py(state)[:DIGEST]
