"""Pallas TPU kernel: fused radix-2 NTT over Goldilocks.

TPU-native counterpart of the reference prover's FFT/LDE hot loop
(SURVEY.md D3; plonky2's rayon-parallel NTT behind circuit.prove). The XLA
path (field/ntt.py) materializes the full polynomial batch in HBM between
every one of the log2(n) butterfly stages; this kernel keeps a
(n, 128-polynomial) tile VMEM-resident across *all* stages, collapsing HBM
traffic to one read + one write per tile — NTT on TPU is bandwidth-bound,
so that is the speed-of-light lever.

Butterflies without sublane reshapes (Mosaic rejects minor-dim reshapes,
and stages with half-block m < 8 would split the sublane dim): each stage
is expressed as full-plane ops only —

    prod = x * tw_full          (tw_full[i] = stage twiddle at odd rows, 1 at even)
    out  = where(bit_m(i) == 0, x + roll(prod, -m), roll(x, +m) - prod)

roll() is a sublane-axis rotate (supported for any static m), and the
row-parity mask comes from an in-kernel iota. Cost: one extra full-plane
field mul per stage vs the half-plane minimum — a VPU-flop price paid for
zero HBM round-trips, which wins by ~log2(n)x on memory traffic.

Field arithmetic reuses goldilocks.py's plane-form ops so the kernel and
the XLA path share one algebra.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...field import goldilocks as gl

LANES = 128
MAX_FUSED_N = 4096   # above this the (n, 128) tile no longer fits VMEM
MIN_FUSED_N = 16


@functools.lru_cache(maxsize=None)
def _tw_tables(log_n: int, inverse: bool):
    """Per-stage full twiddle vectors, concatenated: (log_n * n, 1) lo/hi.

    Stage s rows [s*n, (s+1)*n): tw[i] = w^((i & (m-1)) * n/(2m)) at rows
    with bit m set (m = 2^s), 1 elsewhere.
    """
    n = 1 << log_n
    w = gl.primitive_root_of_unity(log_n)
    if inverse:
        w = pow(w, gl.P - 2, gl.P)
    full = np.ones((log_n * n,), dtype=np.uint64)
    idx = np.arange(n)
    for s in range(log_n):
        m = 1 << s
        stride = n // (2 * m)
        j = idx & (m - 1)
        odd = (idx & m) != 0
        vals = np.array([pow(w, int(jj) * stride, gl.P) for jj in range(m)],
                        dtype=np.uint64)
        stage = np.ones(n, dtype=np.uint64)
        stage[odd] = vals[j[odd]]
        full[s * n:(s + 1) * n] = stage
    pair = gl.from_int_np(full)  # (log_n*n, 2)
    return (np.ascontiguousarray(pair[:, 0:1]),
            np.ascontiguousarray(pair[:, 1:2]))


def _sub_planes(xl, xh, yl, yh):
    lo, hi, borrow = gl._sub64(xl, xh, yl, yh)
    lo, hi, _ = gl._add64(lo, hi, borrow * gl._P_LO, borrow * gl._P_HI)
    return lo, hi


def _kernel(log_n: int, inverse: bool, x_lo_ref, x_hi_ref,
            tw_lo_ref, tw_hi_ref, out_lo_ref, out_hi_ref):
    n = 1 << log_n
    lo, hi = x_lo_ref[:], x_hi_ref[:]
    row = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)
    for s in range(log_n):
        m = 1 << s
        tl = tw_lo_ref[s * n:(s + 1) * n]
        th = tw_hi_ref[s * n:(s + 1) * n]
        pl_, ph_ = gl.mul_limbs(lo, hi, tl, th)
        down_l = pltpu.roll(pl_, n - m, 0)  # roll by -m (shift must be >= 0)
        down_h = pltpu.roll(ph_, n - m, 0)
        up_l = pltpu.roll(lo, m, 0)
        up_h = pltpu.roll(hi, m, 0)
        add_l, add_h = gl.add_limbs(lo, hi, down_l, down_h)
        sub_l, sub_h = _sub_planes(up_l, up_h, pl_, ph_)
        is_even = ((row >> np.uint32(s)) & np.uint32(1)) == 0
        lo = jnp.where(is_even, add_l, sub_l)
        hi = jnp.where(is_even, add_h, sub_h)
    if inverse:
        n_inv = pow(n, gl.P - 2, gl.P)
        cl = np.uint32(n_inv & 0xFFFFFFFF)
        ch = np.uint32(n_inv >> 32)
        lo, hi = gl.mul_limbs(lo, hi, jnp.full_like(lo, cl),
                              jnp.full_like(hi, ch))
    out_lo_ref[:] = lo
    out_hi_ref[:] = hi


@functools.lru_cache(maxsize=None)
def _bit_reverse_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.partial(jax.jit, static_argnames=("log_n", "inverse", "interpret"))
def _ntt_planes(lo, hi, log_n: int, inverse: bool, interpret: bool = False):
    """lo/hi: (n, Bp) planes, Bp a multiple of 128, rows bit-reversed."""
    n = 1 << log_n
    tiles = lo.shape[1] // LANES
    twl, twh = _tw_tables(log_n, inverse)
    bspec = pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((log_n * n, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, log_n, inverse),
        grid=(tiles,),
        in_specs=[bspec, bspec, tspec, tspec],
        out_specs=(bspec, bspec),
        out_shape=(jax.ShapeDtypeStruct(lo.shape, jnp.uint32),
                   jax.ShapeDtypeStruct(hi.shape, jnp.uint32)),
        interpret=interpret,
        # The unrolled stage chain holds several (n, 128) u32 intermediates
        # per butterfly stage; the default 16 MiB scoped-VMEM budget rejects
        # n >= 1024 at compile time. v5e/v5p have 128 MiB VMEM — raise the
        # scoped limit so the full fused range (<= MAX_FUSED_N) compiles.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=lo.shape[1] * n * log_n * 40,
            bytes_accessed=4 * lo.shape[1] * n * 4,
            transcendentals=0,
        ),
    )(lo, hi, jnp.asarray(twl), jnp.asarray(twh))


def ntt(coeffs: jnp.ndarray, inverse: bool = False,
        interpret: bool = False) -> jnp.ndarray:
    """Drop-in for field.ntt.ntt on TPU: (..., n, 2) -> (..., n, 2)."""
    n = coeffs.shape[-2]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n and MIN_FUSED_N <= n <= MAX_FUSED_N
    batch_shape = coeffs.shape[:-2]
    x = coeffs.reshape((-1, n, 2))
    x = x[:, _bit_reverse_perm(log_n), :]
    B = x.shape[0]
    Bp = ((B + LANES - 1) // LANES) * LANES
    if Bp != B:
        x = jnp.pad(x, [(0, Bp - B), (0, 0), (0, 0)])
    lo = x[..., 0].T  # (n, Bp)
    hi = x[..., 1].T
    out_lo, out_hi = _ntt_planes(lo, hi, log_n, inverse, interpret)
    out = jnp.stack([out_lo.T, out_hi.T], axis=-1)[:B]
    return out.reshape(batch_shape + (n, 2))
