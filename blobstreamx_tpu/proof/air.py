"""AIR (algebraic intermediate representation) interface.

The TPU-first redesign of the reference's constraint layer (SURVEY.md D6/D7):
instead of plonky2's heterogeneous custom-gate zoo, every proved table is a
*uniform* AIR — one constraint set applied to all rows — so constraint
evaluation is pure columnar vector math that XLA fuses and tiles.

An ``Air`` declares its column count and registers polynomial constraints
through an ``AirBuilder``. The same ``eval`` code runs twice:

  * vectorized over every LDE row (base field, jnp arrays) to build the
    quotient polynomial on the prover, and
  * at the single out-of-domain point zeta (GF(p^2), python ints) on both
    prover and verifier.

Consistency of the two paths is therefore structural, not tested-for.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence

import jax.numpy as jnp

from ..field import goldilocks as gl
from ..field import extension as ext

# constraint scopes
EVERYWHERE = "everywhere"
FIRST_ROW = "first_row"
LAST_ROW = "last_row"
TRANSITION = "transition"


class Elem:
    """Field-element handle with operator overloading, backend-dispatched."""

    __slots__ = ("v", "b")

    def __init__(self, v, b):
        self.v = v
        self.b = b

    def _lift(self, other):
        if isinstance(other, Elem):
            return other
        return Elem(self.b.const(int(other)), self.b)

    def __add__(self, o):
        o = self._lift(o)
        return Elem(self.b.add(self.v, o.v), self.b)

    __radd__ = __add__

    def __sub__(self, o):
        o = self._lift(o)
        return Elem(self.b.sub(self.v, o.v), self.b)

    def __rsub__(self, o):
        return self._lift(o).__sub__(self)

    def __mul__(self, o):
        o = self._lift(o)
        return Elem(self.b.mul(self.v, o.v), self.b)

    __rmul__ = __mul__

    def __neg__(self):
        return Elem(self.b.sub(self.b.const(0), self.v), self.b)


class BaseLdeBackend:
    """Values are (N, 2) uint32-limb jnp arrays over the LDE domain."""

    def __init__(self, n_points: int):
        self.n = n_points

    def const(self, c: int):
        return jnp.broadcast_to(gl.from_int(c % gl.P), (self.n, 2))

    def add(self, a, b):
        return gl.add(a, b)

    def sub(self, a, b):
        return gl.sub(a, b)

    def mul(self, a, b):
        return gl.mul(a, b)


class ExtPointBackend:
    """Values are GF(p^2) python-int pairs (evaluation at zeta)."""

    def const(self, c: int):
        return (c % gl.P, 0)

    def add(self, a, b):
        return ext.GFp2.add(a, b)

    def sub(self, a, b):
        return ext.GFp2.sub(a, b)

    def mul(self, a, b):
        return ext.GFp2.mul(a, b)


@dataclass
class Constraint:
    expr: Any  # backend value handle
    scope: str


class AirBuilder:
    """Passed to Air.eval; exposes row values and records constraints."""

    def __init__(self, backend, local_vals, next_vals, public_values: Sequence[int],
                 aux_local=None, aux_next=None, challenges: Optional[Sequence] = None):
        self.b = backend
        self._local = local_vals
        self._next = next_vals
        self._aux_local = aux_local
        self._aux_next = aux_next
        self._challenges = challenges
        self._public = list(public_values)
        self.constraints: List[Constraint] = []

    # row access ----------------------------------------------------------
    def local(self, col: int) -> Elem:
        return Elem(self._local[col], self.b)

    def next(self, col: int) -> Elem:
        return Elem(self._next[col], self.b)

    def aux_local(self, col: int) -> Elem:
        return Elem(self._aux_local[col], self.b)

    def aux_next(self, col: int) -> Elem:
        return Elem(self._aux_next[col], self.b)

    def challenge(self, i: int) -> Elem:
        """Verifier-sampled challenge (extension embedded via two base
        elements c0 + c1*t is NOT supported in base rows; challenges are
        base-field elements drawn after the main commit)."""
        return Elem(self.b.const(self._challenges[i]), self.b)

    def public(self, i: int) -> Elem:
        return self.const(self._public[i])

    def const(self, c: int) -> Elem:
        return Elem(self.b.const(int(c)), self.b)

    # constraints ---------------------------------------------------------
    def assert_zero(self, e: Elem, scope: str = EVERYWHERE):
        self.constraints.append(Constraint(e.v, scope))

    def assert_eq(self, a: Elem, b, scope: str = EVERYWHERE):
        if not isinstance(b, Elem):
            b = self.const(int(b))
        self.assert_zero(a - b, scope)

    def assert_bool(self, e: Elem, scope: str = EVERYWHERE):
        self.assert_zero(e * (e - 1), scope)

    def when_transition(self):
        return _Scoped(self, TRANSITION)

    def when_first_row(self):
        return _Scoped(self, FIRST_ROW)

    def when_last_row(self):
        return _Scoped(self, LAST_ROW)


class _Scoped:
    def __init__(self, builder: AirBuilder, scope: str):
        self.builder = builder
        self.scope = scope

    def assert_zero(self, e: Elem):
        self.builder.assert_zero(e, self.scope)

    def assert_eq(self, a: Elem, b):
        if not isinstance(b, Elem):
            b = self.builder.const(int(b))
        self.builder.assert_zero(a - b, self.scope)


class Air:
    """Base class for proved tables.

    Subclasses set ``width`` (number of main columns), optionally
    ``aux_width``/``num_challenges`` (columns committed after challenge
    draw — used for permutation/LogUp arguments), ``max_constraint_degree``
    and implement ``eval(builder)``. ``build_aux`` produces the aux trace
    from the main trace + challenges (host-side numpy, python ints).
    """

    width: int = 0
    aux_width: int = 0
    num_challenges: int = 0
    max_constraint_degree: int = 3

    def eval(self, builder: AirBuilder):
        raise NotImplementedError

    def build_aux(self, main_rows, challenges):
        """main_rows: (n, width) numpy uint64; -> (n, aux_width) uint64."""
        raise NotImplementedError("Air has aux columns but no build_aux")
