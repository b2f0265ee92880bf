"""Quadratic extension GF(p^2) = GF(p)[t] / (t^2 - W) over Goldilocks.

Used for FRI/DEEP challenges and quotient evaluation points so soundness is
~2^64-bit bounded by |GF(p^2)| rather than |GF(p)| (mirrors the reference
prover's ``D = 2`` extension, SURVEY.md D1 / reference circuits/builder.rs:458-460).

Elements are stacked on a trailing axis: shape (..., 2, 2) where
``x[..., i, :]`` is the i-th base-field coordinate in limb representation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import goldilocks as gl

# W must be a quadratic non-residue mod p. 7 (the multiplicative generator)
# is one; verified at import time.
W = 7
assert pow(W, (gl.P - 1) // 2, gl.P) == gl.P - 1, "W must be a non-residue"

_W_INT = W


def zeros(shape=()):
    return jnp.zeros(tuple(shape) + (2, 2), dtype=jnp.uint32)


def ones(shape=()):
    z = np.zeros(tuple(shape) + (2, 2), dtype=np.uint32)
    z[..., 0, 0] = 1
    return jnp.asarray(z)


def from_base(x):
    """Embed GF(p) (..., 2) -> GF(p^2) (..., 2, 2)."""
    return jnp.stack([x, jnp.zeros_like(x)], axis=-2)


def from_int_pair(c0, c1):
    """Host-side: python ints / arrays -> extension element(s)."""
    return jnp.stack([gl.from_int(c0), gl.from_int(c1)], axis=-2)


def to_int_pair(x):
    arr = np.asarray(x)
    return gl.to_int(arr[..., 0, :]), gl.to_int(arr[..., 1, :])


def c0(x):
    return x[..., 0, :]


def c1(x):
    return x[..., 1, :]


def add(x, y):
    return jnp.stack([gl.add(c0(x), c0(y)), gl.add(c1(x), c1(y))], axis=-2)


def sub(x, y):
    return jnp.stack([gl.sub(c0(x), c0(y)), gl.sub(c1(x), c1(y))], axis=-2)


def neg(x):
    return jnp.stack([gl.neg(c0(x)), gl.neg(c1(x))], axis=-2)


def mul(x, y):
    """(a0 + a1 t)(b0 + b1 t) = (a0 b0 + W a1 b1) + (a0 b1 + a1 b0) t."""
    a0, a1 = c0(x), c1(x)
    b0, b1 = c0(y), c1(y)
    a0b0 = gl.mul(a0, b0)
    a1b1 = gl.mul(a1, b1)
    a0b1 = gl.mul(a0, b1)
    a1b0 = gl.mul(a1, b0)
    r0 = gl.add(a0b0, gl.mul_u32(a1b1, _W_INT))
    r1 = gl.add(a0b1, a1b0)
    return jnp.stack([r0, r1], axis=-2)


def square(x):
    return mul(x, x)


def scalar_mul(x, s):
    """Multiply extension element by base-field element s (..., 2)."""
    return jnp.stack([gl.mul(c0(x), s), gl.mul(c1(x), s)], axis=-2)


def inv(x):
    """1 / (a0 + a1 t) = (a0 - a1 t) / (a0^2 - W a1^2)."""
    a0, a1 = c0(x), c1(x)
    norm = gl.sub(gl.mul(a0, a0), gl.mul_u32(gl.mul(a1, a1), _W_INT))
    ninv = gl.inv(norm)
    return jnp.stack([gl.mul(a0, ninv), gl.mul(gl.neg(a1), ninv)], axis=-2)


def pow_const(x, e: int):
    result = ones(x.shape[:-2])
    base = x
    while e > 0:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def equal(x, y):
    return gl.equal(c0(x), c0(y)) & gl.equal(c1(x), c1(y))


def is_zero(x):
    return gl.is_zero(c0(x)) & gl.is_zero(c1(x))


def select(cond, x, y):
    c = jnp.asarray(cond)[..., None, None]
    return jnp.where(c, x, y)


class GFp2:
    """Python-int reference: elements are (c0, c1) tuples of ints."""

    @staticmethod
    def add(a, b):
        return ((a[0] + b[0]) % gl.P, (a[1] + b[1]) % gl.P)

    @staticmethod
    def sub(a, b):
        return ((a[0] - b[0]) % gl.P, (a[1] - b[1]) % gl.P)

    @staticmethod
    def mul(a, b):
        return (
            (a[0] * b[0] + W * a[1] * b[1]) % gl.P,
            (a[0] * b[1] + a[1] * b[0]) % gl.P,
        )

    @staticmethod
    def inv(a):
        norm = (a[0] * a[0] - W * a[1] * a[1]) % gl.P
        ninv = pow(norm, gl.P - 2, gl.P)
        return ((a[0] * ninv) % gl.P, (-a[1] * ninv) % gl.P)
