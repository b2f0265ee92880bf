"""Goldilocks field arithmetic for TPU (JAX).

The prover core operates over the Goldilocks field ``p = 2^64 - 2^32 + 1``
(same field as the reference's plonky2 prover — see SURVEY.md D1,
``/root/reference`` Cargo.lock pin of ``plonky2_field``).

TPU vector lanes are 32-bit: there is no native u64 multiplier. Field
elements are therefore represented as **two uint32 limbs** stacked on a
trailing axis of size 2: ``x[..., 0] = lo``, ``x[..., 1] = hi``. All
arithmetic is built from u32 ops (wrapping add/sub/mul, shifts, compares),
which lower to single VPU instructions. 32x32->64 multiplies are synthesized
from four 16x16->32 products; the 128-bit product is reduced using the
Goldilocks identities ``2^64 = 2^32 - 1 (mod p)`` and ``2^96 = -1 (mod p)``.

Elements are kept **canonical** (< p) at function boundaries.

A pure-Python integer reference implementation lives at the bottom for
golden tests (see tests/test_goldilocks.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

P = 0xFFFFFFFF_00000001  # 2**64 - 2**32 + 1
EPSILON = 0xFFFFFFFF  # 2**32 - 1 == 2**64 mod p
# Multiplicative group generator (plonky2 uses 7 as well; this is a standard
# public parameter of the field, not copied code).
GENERATOR = 7
TWO_ADICITY = 32  # p - 1 = 2^32 * (2^32 - 1)

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)  # numpy scalar: inlines as a literal (pallas-safe)


def _u32(x):
    return jnp.asarray(x, dtype=_U32)


# ---------------------------------------------------------------------------
# u32 limb primitives (operate on raw uint32 arrays)
# ---------------------------------------------------------------------------

def _addc(a, b):
    """u32 wrapping add with carry out. Returns (sum, carry[uint32 0/1])."""
    s = a + b
    return s, (s < a).astype(_U32)


def _subb(a, b):
    """u32 wrapping sub with borrow out. Returns (diff, borrow[uint32 0/1])."""
    d = a - b
    return d, (a < b).astype(_U32)


def _mul32(a, b):
    """Full 32x32 -> 64 multiply via 16-bit halves. Returns (lo, hi) uint32."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    lo, c1 = _addc(p00, p01 << 16)
    hi = p11 + (p01 >> 16) + c1
    lo, c2 = _addc(lo, p10 << 16)
    hi = hi + (p10 >> 16) + c2
    return lo, hi


def _add64(al, ah, bl, bh):
    """64-bit add -> (lo, hi, carry)."""
    lo, c0 = _addc(al, bl)
    hi, c1 = _addc(ah, bh)
    hi, c2 = _addc(hi, c0)
    return lo, hi, c1 | c2


def _sub64(al, ah, bl, bh):
    """64-bit sub -> (lo, hi, borrow)."""
    lo, b0 = _subb(al, bl)
    hi, b1 = _subb(ah, bh)
    hi, b2 = _subb(hi, b0)
    return lo, hi, b1 | b2


def _geq64(al, ah, bl, bh):
    """a >= b for 64-bit pairs -> bool array."""
    return (ah > bh) | ((ah == bh) & (al >= bl))


_P_LO = np.uint32(0x00000001)
_P_HI = np.uint32(0xFFFFFFFF)


def _canonicalize(lo, hi):
    """Conditional subtract p (input < 2^64, output < p assuming input < 2p)."""
    ge = _geq64(lo, hi, _P_LO, _P_HI)
    slo, shi, _ = _sub64(lo, hi, _P_LO, _P_HI)
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def _reduce160(n0, n1, n2, n3, n4):
    """Reduce a 160-bit value mod p using 2^128 = -2^32 (mod p)."""
    lo, hi = _reduce128(n0, n1, n2, n3)
    # subtract n4 * 2^32 (a 64-bit value (0, n4)); borrow => add p back
    slo, shi, borrow = _sub64(lo, hi, jnp.zeros_like(n4), n4)
    slo, shi, _ = _add64(slo, shi, borrow * _P_LO, borrow * _P_HI)
    return slo, shi


def _reduce128(n0, n1, n2, n3):
    """Reduce a 128-bit value (n0 lowest limb) mod p -> canonical (lo, hi).

    Uses 2^64 = EPSILON (mod p) and 2^96 = -1 (mod p):
      n = n_lo + 2^64*hi_lo + 2^96*hi_hi  ==  n_lo - hi_hi + EPSILON*hi_lo.
    """
    # t = n_lo - hi_hi  (borrow => subtract EPSILON further; cannot re-borrow)
    t_lo, t_hi, borrow = _sub64(n0, n1, n3, jnp.zeros_like(n3))
    t_lo, t_hi, _ = _sub64(t_lo, t_hi, borrow * np.uint32(EPSILON), jnp.zeros_like(t_hi))
    # v = hi_lo * EPSILON = (hi_lo << 32) - hi_lo
    v_lo, bv = _subb(jnp.zeros_like(n2), n2)
    v_hi = n2 - bv
    r_lo, r_hi, carry = _add64(t_lo, t_hi, v_lo, v_hi)
    # carry => add EPSILON (cannot overflow again)
    r_lo, r_hi, _ = _add64(r_lo, r_hi, carry * np.uint32(EPSILON), jnp.zeros_like(r_hi))
    return _canonicalize(r_lo, r_hi)


# ---------------------------------------------------------------------------
# Public API on stacked (..., 2) uint32 arrays
# ---------------------------------------------------------------------------

def _split(x):
    return x[..., 0], x[..., 1]


def _join(lo, hi):
    return jnp.stack([lo, hi], axis=-1)


def zeros(shape=()):
    return jnp.zeros(tuple(shape) + (2,), dtype=_U32)


def ones(shape=()):
    z = np.zeros(tuple(shape) + (2,), dtype=np.uint32)
    z[..., 0] = 1
    return jnp.asarray(z)


def from_int_np(values) -> np.ndarray:
    """Host-side numpy variant (safe to cache across jit traces)."""
    arr = np.asarray(values, dtype=np.uint64)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=-1)


def from_int(values) -> jnp.ndarray:
    """Host-side: python ints / numpy array (any int dtype, values < p) -> stacked repr."""
    return jnp.asarray(from_int_np(values))


def to_int(x) -> np.ndarray:
    """Host-side: stacked repr -> numpy uint64 array."""
    arr = np.asarray(x)
    return arr[..., 0].astype(np.uint64) | (arr[..., 1].astype(np.uint64) << np.uint64(32))


def add_limbs(xl, xh, yl, yh):
    """Plane-form add: separate lo/hi u32 arrays -> (lo, hi)."""
    lo, hi, carry = _add64(xl, xh, yl, yh)
    # carry => result >= 2^64: add EPSILON (2^64 mod p). Cannot carry again
    # since x, y < p means sum - 2^64 < p - 2^32.
    lo, hi, _ = _add64(lo, hi, carry * np.uint32(EPSILON), jnp.zeros_like(hi))
    return _canonicalize(lo, hi)


def add(x, y):
    xl, xh = _split(x)
    yl, yh = _split(y)
    return _join(*add_limbs(xl, xh, yl, yh))


def sub(x, y):
    xl, xh = _split(x)
    yl, yh = _split(y)
    lo, hi, borrow = _sub64(xl, xh, yl, yh)
    # borrow => add p back
    plo = borrow * _P_LO
    phi = borrow * _P_HI
    lo, hi, _ = _add64(lo, hi, plo, phi)
    return _join(lo, hi)


def neg(x):
    return sub(zeros(x.shape[:-1]), x)


def mul_limbs(xl, xh, yl, yh):
    """Plane-form mul: separate lo/hi u32 arrays -> (lo, hi)."""
    ll_lo, ll_hi = _mul32(xl, yl)
    lh_lo, lh_hi = _mul32(xl, yh)
    hl_lo, hl_hi = _mul32(xh, yl)
    hh_lo, hh_hi = _mul32(xh, yh)
    # accumulate n = ll + (lh + hl) << 32 + hh << 64 into 4 limbs
    n0 = ll_lo
    n1, c0 = _addc(ll_hi, lh_lo)
    n1, c1 = _addc(n1, hl_lo)
    n2, c2 = _addc(hh_lo, lh_hi)
    n2, c3 = _addc(n2, hl_hi)
    n2, c4 = _addc(n2, c0 + c1)  # c0+c1 <= 2, no overflow in add
    n3 = hh_hi + c2 + c3 + c4
    return _reduce128(n0, n1, n2, n3)


def mul(x, y):
    xl, xh = _split(x)
    yl, yh = _split(y)
    return _join(*mul_limbs(xl, xh, yl, yh))


def square(x):
    return mul(x, x)


def mul_u32(x, k):
    """Multiply by a small (u32) constant array or scalar."""
    xl, xh = _split(x)
    k = _u32(k)
    lo_lo, lo_hi = _mul32(xl, jnp.broadcast_to(k, xl.shape))
    hi_lo, hi_hi = _mul32(xh, jnp.broadcast_to(k, xh.shape))
    # n = lo + (hi << 32): limbs n0=lo_lo, n1=lo_hi+hi_lo, n2=hi_hi(+c)
    n1, c = _addc(lo_hi, hi_lo)
    n2 = hi_hi + c
    lo, hi = _reduce128(lo_lo, n1, n2, jnp.zeros_like(n2))
    return _join(lo, hi)


def pow_const(x, e: int):
    """x ** e for a static python-int exponent (binary ladder, unrolled)."""
    result = ones(x.shape[:-1])
    base = x
    while e > 0:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def inv(x):
    """Field inverse via Fermat: x^(p-2). x must be nonzero."""
    return pow_const(x, P - 2)


def is_zero(x):
    return (x[..., 0] == 0) & (x[..., 1] == 0)


def equal(x, y):
    return (x[..., 0] == y[..., 0]) & (x[..., 1] == y[..., 1])


def select(cond, x, y):
    """cond: bool array broadcastable against x[..., 0]."""
    c = jnp.asarray(cond)[..., None]
    return jnp.where(c, x, y)


# ---------------------------------------------------------------------------
# Derived constants (computed, not copied)
# ---------------------------------------------------------------------------

def primitive_root_of_unity(n_bits: int) -> int:
    """Generator of the order-2^n_bits subgroup, as a python int."""
    assert 0 <= n_bits <= TWO_ADICITY
    base = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)
    for _ in range(TWO_ADICITY - n_bits):
        base = (base * base) % P
    return base


# ---------------------------------------------------------------------------
# Pure-python reference (for golden tests)
# ---------------------------------------------------------------------------

class GFp:
    """Python-int reference implementation of GF(p)."""

    @staticmethod
    def add(a: int, b: int) -> int:
        return (a + b) % P

    @staticmethod
    def sub(a: int, b: int) -> int:
        return (a - b) % P

    @staticmethod
    def mul(a: int, b: int) -> int:
        return (a * b) % P

    @staticmethod
    def inv(a: int) -> int:
        return pow(a, P - 2, P)

    @staticmethod
    def pow(a: int, e: int) -> int:
        return pow(a, e, P)
