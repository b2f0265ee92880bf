"""Batched NTT / coset LDE over Goldilocks (JAX, TPU-friendly).

Equivalent capability to the reference prover's FFT/LDE stage (SURVEY.md D3,
implicit in reference ``circuits/builder.rs:527`` circuit.prove). Redesigned
for TPU: a radix-2 Stockham-style iterative transform expressed as reshapes +
vectorized butterflies over a *batch axis of polynomials* (trace columns), so
every stage is a full-width VPU op and XLA can fuse twiddle multiplies.

Layout: ``coeffs[batch, n, 2]`` (limb axis last). The transform axis is -2.

Twiddle factors are precomputed host-side with python ints (cheap, cached)
and closed over as constants so jit sees static weights.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import goldilocks as gl


@functools.lru_cache(maxsize=None)
def _twiddles(log_n: int, inverse: bool) -> tuple:
    """Per-stage twiddle tables. Stage s (0-indexed) has 2^s twiddles."""
    n = 1 << log_n
    w = gl.primitive_root_of_unity(log_n)
    if inverse:
        w = pow(w, gl.P - 2, gl.P)
    # all powers w^0..w^(n/2-1)
    pows = np.empty(max(n // 2, 1), dtype=np.uint64)
    acc = 1
    for i in range(max(n // 2, 1)):
        pows[i] = acc
        acc = (acc * w) % gl.P
    stages = []
    for s in range(log_n):
        m = 1 << s  # half-block size at this stage
        stride = n // (2 * m)
        stages.append(gl.from_int_np(pows[: m * stride : stride].copy()))
    return tuple(stages)


def _bit_reverse_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _ntt_staged(x: jnp.ndarray, log_n: int, inverse: bool) -> jnp.ndarray:
    """The staged butterfly body (traced under jit, one graph per shape)."""
    n = 1 << log_n
    perm = _bit_reverse_perm(log_n)
    x = x[..., perm, :]
    stages = _twiddles(log_n, inverse)
    batch_shape = x.shape[:-2]
    for s in range(log_n):
        m = 1 << s
        tw = stages[s]  # (m, 2)
        # view as (..., n/(2m), 2, m, 2limbs)
        x = x.reshape(batch_shape + (n // (2 * m), 2, m, 2))
        even = x[..., 0, :, :]
        odd = gl.mul(x[..., 1, :, :], tw)
        x = jnp.stack([gl.add(even, odd), gl.sub(even, odd)], axis=-3)
    x = x.reshape(batch_shape + (n, 2))
    if inverse:
        n_inv = pow(n, gl.P - 2, gl.P)
        x = gl.mul(x, jnp.broadcast_to(gl.from_int(n_inv), x.shape))
    return x


_ntt_staged_jit = jax.jit(_ntt_staged, static_argnums=(1, 2))


def ntt(coeffs: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Forward NTT: coefficients -> evaluations over the order-n subgroup
    (natural order). Inverse maps evaluations -> coefficients.

    coeffs: (..., n, 2) with n a power of two. On TPU, sizes up to
    MAX_FUSED_N run the fused Pallas kernel (ops/pallas/ntt.py: all
    butterfly stages VMEM-resident); elsewhere the staged body runs under
    jit (one cached XLA graph per shape — eager per-op dispatch costs
    ~50ms per stage op on small CPU hosts, 1000x the fused sweep)."""
    n = coeffs.shape[-2]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "n must be a power of two"
    if n == 1:
        return coeffs
    if _on_tpu():
        from ..ops.pallas import ntt as pntt

        if pntt.MIN_FUSED_N <= n <= pntt.MAX_FUSED_N:
            return pntt.ntt(coeffs, inverse)

    import jax.core as _core

    if isinstance(coeffs, _core.Tracer):  # already inside an outer jit
        return _ntt_staged(coeffs, log_n, inverse)
    return _ntt_staged_jit(coeffs, log_n, inverse)


def coset_shift(coeffs: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Scale coefficient i by shift^i (maps evals on H to evals on shift*H)."""
    n = coeffs.shape[-2]
    pows = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        pows[i] = acc
        acc = (acc * shift) % gl.P
    return gl.mul(coeffs, gl.from_int(pows))


def lde(evals: jnp.ndarray, rate_bits: int, shift: int = gl.GENERATOR) -> jnp.ndarray:
    """Low-degree extension: evaluations on H (order n, natural order) ->
    evaluations on the coset shift*K where K has order n * 2^rate_bits.

    evals: (..., n, 2). Returns (..., n << rate_bits, 2).
    """
    n = evals.shape[-2]
    coeffs = ntt(evals, inverse=True)
    pad = [(0, 0)] * (coeffs.ndim - 2) + [(0, (n << rate_bits) - n), (0, 0)]
    coeffs = jnp.pad(coeffs, pad)
    coeffs = coset_shift(coeffs, shift)
    return ntt(coeffs)


def interpolate_coeffs(evals: jnp.ndarray) -> jnp.ndarray:
    """Evaluations on subgroup (natural order) -> coefficients."""
    return ntt(evals, inverse=True)


def eval_poly_ext(coeffs_base, point_ext):
    """Evaluate a base-field polynomial (coeffs (..., n, 2)) at an extension
    point (2, 2) by Horner. Returns (..., 2, 2)."""
    from . import extension as ext

    n = coeffs_base.shape[-2]
    batch = coeffs_base.shape[:-2]
    acc = ext.zeros(batch)
    for i in range(n - 1, -1, -1):
        acc = ext.mul(acc, jnp.broadcast_to(point_ext, batch + (2, 2)))
        acc = ext.add(acc, ext.from_base(coeffs_base[..., i, :]))
    return acc
