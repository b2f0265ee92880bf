"""Pallas TPU kernel for the Poseidon width-12 permutation.

Why a kernel (vs the XLA einsum path in ops/poseidon.py): each round's MDS
layer materializes int8 limb and int32 bucket tensors (~25x the state
size). Under XLA, consecutive rounds round-trip those through HBM; this
kernel keeps all 30 rounds on a VMEM-resident tile, so HBM traffic
collapses to one read + one write of the state and the MXU (MDS int8
matmuls) / VPU (s-box u32 limb chains) set the speed of light.

Layout (Mosaic-friendly): the batch rides the 128-lane minor axis. The
kernel state is two (12, B_t) uint32 planes (lo, hi); limb extraction
stacks ten (12, B_t) planes into (120, B_t) along the major axis (cheap),
and the MDS contraction is one 2-D int8 matmul (228,120)@(120,B_t) — no
minor-dim reshapes, which Mosaic's layout inference rejects.

Field arithmetic reuses goldilocks.py's plane-form ops (add_limbs /
mul_limbs / _reduce160), so kernel and XLA/python paths share one algebra.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...field import goldilocks as gl
from .. import poseidon as pos

TILE = 512  # batch per grid step; VMEM ~ (120 i8 + 228*4 i32 + ~200) B/state (sweep: 512 > 1024 > 4096 on v5e)
_L = pos._LIMB_BITS      # 7
_NL = pos._N_LIMBS       # 10
_NB = pos._N_BUCKETS     # 19
W = pos.WIDTH            # 12


@functools.lru_cache(maxsize=None)
def _consts():
    """(rc_lo, rc_hi) as (360, 1) u32; MDS limb matrix A (228, 120) int8
    with A[s*12+i, m*12+j] = limb_{s-m}(mds[i][j])."""
    rc = np.array(pos.round_constants(), dtype=np.uint64)
    rc_lo = (rc & 0xFFFFFFFF).astype(np.uint32).reshape(-1, 1)
    rc_hi = (rc >> 32).astype(np.uint32).reshape(-1, 1)
    mds = pos.mds_matrix()
    A = np.zeros((_NB * W, _NL * W), dtype=np.int8)
    for i in range(W):
        for j in range(W):
            v = mds[i][j]
            for m in range(_NL):
                for mm in range(_NL):
                    A[(m + mm) * W + i, mm * W + j] = (v >> (_L * m)) & 0x7F
    return rc_lo, rc_hi, A


def _sbox_planes(lo, hi):
    l2, h2 = gl.mul_limbs(lo, hi, lo, hi)
    l3, h3 = gl.mul_limbs(l2, h2, lo, hi)
    l6, h6 = gl.mul_limbs(l3, h3, l3, h3)
    return gl.mul_limbs(l6, h6, lo, hi)


def _to_limb_planes(lo, hi):
    """(12, B) lo/hi u32 -> (120, B) int8, rows ordered m*12+j."""
    mask = np.uint32(0x7F)
    planes = []
    for m in range(_NL):
        s = _L * m
        if s + _L <= 32:
            limb = (lo >> np.uint32(s)) & mask
        elif s >= 32:
            limb = (hi >> np.uint32(s - 32)) & mask
        else:
            limb = ((lo >> np.uint32(s)) | (hi << np.uint32(32 - s))) & mask
        planes.append(limb)
    return jnp.concatenate(planes, axis=0).astype(jnp.int8)


def _from_bucket_planes(buckets):
    """(228, B) int32 bucket sums (rows s*12+i) -> (12, B) lo/hi planes."""
    b32 = buckets.astype(jnp.uint32)
    shape = (W, buckets.shape[1])
    L = [jnp.zeros(shape, dtype=jnp.uint32) for _ in range(5)]

    def acc(idx, v):
        for k in range(idx, 5):
            L[k], carry = gl._addc(L[k], v)
            v = carry

    for s in range(_NB):
        pos_bits = _L * s
        li, off = pos_bits >> 5, pos_bits & 31
        b = b32[s * W:(s + 1) * W]
        if off == 0:
            acc(li, b)
        else:
            acc(li, b << np.uint32(off))
            acc(li + 1, b >> np.uint32(32 - off))
    return gl._reduce160(*L)


def _mds_planes(lo, hi, A):
    limbs = _to_limb_planes(lo, hi)
    buckets = jax.lax.dot_general(
        A, limbs, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return _from_bucket_planes(buckets)


def _kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, mds_ref,
            out_lo_ref, out_hi_ref):
    lo, hi = lo_ref[:], hi_ref[:]
    A = mds_ref[:]
    half = pos.FULL_ROUNDS // 2
    for r in range(pos.N_ROUNDS):
        rl = rc_lo_ref[r * W:(r + 1) * W]  # (12, 1) broadcasts over lanes
        rh = rc_hi_ref[r * W:(r + 1) * W]
        lo, hi = gl.add_limbs(lo, hi, rl, rh)
        if half <= r < half + pos.PARTIAL_ROUNDS:
            s0l, s0h = _sbox_planes(lo[0:1], hi[0:1])
            lo = jnp.concatenate([s0l, lo[1:]], axis=0)
            hi = jnp.concatenate([s0h, hi[1:]], axis=0)
        else:
            lo, hi = _sbox_planes(lo, hi)
        lo, hi = _mds_planes(lo, hi, A)
    out_lo_ref[:] = lo
    out_hi_ref[:] = hi


@functools.partial(jax.jit, static_argnames=("interpret",))
def permute(state: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Poseidon permutation via the fused Pallas kernel.

    state: (..., 12, 2) uint32 limb pairs (same convention as
    ops.poseidon.permute); returns the same shape/dtype.
    """
    batch_shape = state.shape[:-2]
    flat = state.reshape((-1, W, 2))
    B = flat.shape[0]
    tile = min(TILE, max(128, 1 << (B - 1).bit_length()))
    Bp = ((B + tile - 1) // tile) * tile
    if Bp != B:
        flat = jnp.pad(flat, [(0, Bp - B), (0, 0), (0, 0)])
    lo = flat[..., 0].T  # (12, Bp)
    hi = flat[..., 1].T
    rc_lo, rc_hi, A = _consts()
    grid = (Bp // tile,)
    bspec = pl.BlockSpec((W, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_lo, out_hi = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            bspec, bspec,
            pl.BlockSpec((pos.N_ROUNDS * W, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pos.N_ROUNDS * W, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB * W, _NL * W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(bspec, bspec),
        out_shape=(
            jax.ShapeDtypeStruct((W, Bp), jnp.uint32),
            jax.ShapeDtypeStruct((W, Bp), jnp.uint32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * pos.N_ROUNDS * (_NL * W) * (_NB * W),
            bytes_accessed=4 * Bp * W * 4,
            transcendentals=0,
        ),
    )(lo, hi, jnp.asarray(rc_lo), jnp.asarray(rc_hi), jnp.asarray(A))
    out = jnp.stack([out_lo.T, out_hi.T], axis=-1)[:B]
    return out.reshape(batch_shape + (W, 2))
