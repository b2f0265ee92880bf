"""AIR (algebraic intermediate representation) interface.

The TPU-first redesign of the reference's constraint layer (SURVEY.md D6/D7):
instead of plonky2's heterogeneous custom-gate zoo, every proved table is a
*uniform* AIR — one constraint set applied to all rows — so constraint
evaluation is pure columnar vector math that XLA fuses and tiles.

An ``Air`` declares its column count, row-offset window, periodic columns
and challenges, and registers polynomial constraints through an
``AirBuilder``. The same ``eval`` code runs twice:

  * vectorized over every LDE row (base field, jnp arrays) to build the
    quotient polynomial on the prover, and
  * at the single out-of-domain point zeta (GF(p^2), python ints) on both
    prover and verifier.

Consistency of the two paths is therefore structural, not tested-for.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
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


class ExtElem:
    """GF(p^2) element represented as two base-field Elems (c0 + c1*t,
    t^2 = W). Used for LogUp accumulators: aux columns come in base pairs
    and challenges are extension values, but every constraint emitted is
    still a base-field polynomial in the columns."""

    __slots__ = ("c0", "c1")

    def __init__(self, c0: Elem, c1: Elem):
        self.c0 = c0
        self.c1 = c1

    @staticmethod
    def from_base(e: Elem) -> "ExtElem":
        zero = Elem(e.b.const(0), e.b)
        return ExtElem(e, zero)

    def __add__(self, o: "ExtElem") -> "ExtElem":
        if isinstance(o, Elem):
            o = ExtElem.from_base(o)
        return ExtElem(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o: "ExtElem") -> "ExtElem":
        if isinstance(o, Elem):
            o = ExtElem.from_base(o)
        return ExtElem(self.c0 - o.c0, self.c1 - o.c1)

    def __mul__(self, o) -> "ExtElem":
        if isinstance(o, Elem):
            return ExtElem(self.c0 * o, self.c1 * o)
        return ExtElem(
            self.c0 * o.c0 + ext.W * (self.c1 * o.c1),
            self.c0 * o.c1 + self.c1 * o.c0,
        )


class BaseLdeBackend:
    """Values are (N, 2) uint32-limb jnp arrays over the LDE domain.

    "Stacked" handles carry a leading lane axis (K, N, 2) so whole words of
    bit columns run through one vectorized op (broadcasts against scalars).
    """

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

    def stack(self, handles):
        return jnp.stack(handles, axis=0)

    def gather(self, h, indices):
        import numpy as _np

        return h[_np.asarray(list(indices), dtype=_np.int32)]

    def fold(self, h, weights):
        """Stacked (K, N, 2) -> (N, 2): sum_k weights[k] * h[k]."""
        import numpy as _np

        k = h.shape[0]
        w = gl.from_int(_np.array([int(x) % gl.P for x in weights], dtype=_np.uint64))
        acc = gl.mul(h, w[:, None, :])
        kp = 1 << (k - 1).bit_length()
        if kp != k:
            acc = jnp.pad(acc, [(0, kp - k), (0, 0), (0, 0)])
        while kp > 1:
            kp //= 2
            acc = gl.add(acc[:kp], acc[kp:2 * kp])
        return acc[0]

    @staticmethod
    def is_stacked(h):
        return hasattr(h, "ndim") and h.ndim == 3


def _point_bc(op):
    def f(a, b):
        if isinstance(a, list) or isinstance(b, list):
            if not isinstance(a, list):
                a = [a] * len(b)
            if not isinstance(b, list):
                b = [b] * len(a)
            return [op(x, y) for x, y in zip(a, b)]
        return op(a, b)

    return f


class ExtPointBackend:
    """Values are GF(p^2) python-int pairs (evaluation at zeta); stacked
    handles are python lists of pairs."""

    def const(self, c: int):
        return (c % gl.P, 0)

    add = staticmethod(_point_bc(ext.GFp2.add))
    sub = staticmethod(_point_bc(ext.GFp2.sub))
    mul = staticmethod(_point_bc(ext.GFp2.mul))

    def stack(self, handles):
        return list(handles)

    def gather(self, h, indices):
        return [h[i] for i in indices]

    def fold(self, h, weights):
        acc = (0, 0)
        for v, w in zip(h, weights):
            acc = ext.GFp2.add(acc, ext.GFp2.mul(v, (int(w) % gl.P, 0)))
        return acc

    @staticmethod
    def is_stacked(h):
        return isinstance(h, list)


@dataclass
class Constraint:
    expr: Any  # backend value handle
    scope: str


@dataclass
class Interaction:
    """A LogUp bus message: sign * mult / (delta + fingerprint(channel, args)).

    Registered during Air.eval via builder.send/receive. The STARK system
    layer materializes one extension inverse column per interaction plus a
    running-sum column, and enforces the global balance across tables.
    """

    channel: int
    args: list  # list of Elem
    mult: Any  # Elem
    sign: int  # +1 send, -1 receive


class AirBuilder:
    """Passed to Air.eval; exposes row values and records constraints.

    rows: {offset: [per-column backend values]} for the AIR's row window.
    periodic: list of per-column backend values (LDE vectors / point evals).
    challenges: list of (c0, c1) extension pairs (python ints).
    """

    def __init__(
        self,
        backend,
        rows: Dict[int, list],
        publics: Sequence[int],
        aux_rows: Optional[Dict[int, list]] = None,
        challenges: Optional[Sequence] = None,
        periodic: Optional[Sequence] = None,
        pre_rows: Optional[Dict[int, list]] = None,
    ):
        self.b = backend
        self._rows = rows
        self._aux_rows = aux_rows
        self._challenges = list(challenges or [])
        self._periodic = list(periodic or [])
        self._public = list(publics)
        self._pre_rows = pre_rows
        self.constraints: List[Constraint] = []
        self.interactions: List[Interaction] = []

    # row access ----------------------------------------------------------
    def row(self, offset: int, col: int) -> Elem:
        return Elem(self._rows[offset][col], self.b)

    def local(self, col: int) -> Elem:
        return self.row(0, col)

    def next(self, col: int) -> Elem:
        return self.row(1, col)

    def aux_row(self, offset: int, col: int) -> Elem:
        return Elem(self._aux_rows[offset][col], self.b)

    def aux_local(self, col: int) -> Elem:
        return self.aux_row(0, col)

    def aux_next(self, col: int) -> Elem:
        return self.aux_row(1, col)

    def aux_local_ext(self, i: int) -> ExtElem:
        """Aux columns (2i, 2i+1) as one extension element."""
        return ExtElem(self.aux_local(2 * i), self.aux_local(2 * i + 1))

    def aux_next_ext(self, i: int) -> ExtElem:
        return ExtElem(self.aux_next(2 * i), self.aux_next(2 * i + 1))

    def periodic(self, i: int) -> Elem:
        return Elem(self._periodic[i], self.b)

    def pre(self, offset: int, col: int) -> Elem:
        """Preprocessed (build-time constant) column at a row offset."""
        return Elem(self._pre_rows[offset][col], self.b)

    def pre_local(self, col: int) -> Elem:
        return self.pre(0, col)

    # stacked (vectorized-lane) access ------------------------------------
    def row_stack(self, offset: int, col_base: int, count: int) -> Elem:
        """Columns [col_base, col_base+count) at one offset as a stacked
        handle — whole-word bit operations in one vectorized op."""
        return Elem(
            self.b.stack([self._rows[offset][col_base + i] for i in range(count)]),
            self.b,
        )

    def gather(self, e: Elem, indices) -> Elem:
        return Elem(self.b.gather(e.v, list(indices)), self.b)

    def fold(self, e: Elem, weights) -> Elem:
        return Elem(self.b.fold(e.v, list(weights)), self.b)

    def challenge(self, i: int) -> ExtElem:
        c0, c1 = self._challenges[i]
        return ExtElem(self.const(c0), self.const(c1))

    def public(self, i: int) -> Elem:
        return self.const(self._public[i])

    def const(self, c) -> Elem:
        """int -> backend constant; a non-int backend handle (e.g. an
        in-circuit challenge component, proof/recursion.py) passes through
        to the backend, which decides how to lift it."""
        if isinstance(c, (int, np.integer)):
            c = int(c)
        return Elem(self.b.const(c), self.b)

    def ext_const(self, pair) -> ExtElem:
        return ExtElem(self.const(pair[0]), self.const(pair[1]))

    # constraints ---------------------------------------------------------
    def assert_zero(self, e: Elem, scope: str = EVERYWHERE):
        self.constraints.append(Constraint(e.v, scope))

    def assert_zero_ext(self, e: ExtElem, scope: str = EVERYWHERE):
        self.assert_zero(e.c0, scope)
        self.assert_zero(e.c1, scope)

    def assert_eq(self, a: Elem, b, scope: str = EVERYWHERE):
        if not isinstance(b, Elem):
            b = self.const(int(b))
        self.assert_zero(a - b, scope)

    def assert_bool(self, e: Elem, scope: str = EVERYWHERE):
        self.assert_zero(e * (e - 1), scope)

    # bus -------------------------------------------------------------------
    def send(self, channel: int, args: List[Elem], mult: Elem):
        self.interactions.append(Interaction(channel, list(args), mult, +1))

    def receive(self, channel: int, args: List[Elem], mult: Elem):
        self.interactions.append(Interaction(channel, list(args), mult, -1))

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

    def assert_zero_ext(self, e: ExtElem):
        self.builder.assert_zero_ext(e, self.scope)

    def assert_eq(self, a: Elem, b):
        if not isinstance(b, Elem):
            b = self.builder.const(int(b))
        self.builder.assert_zero(a - b, self.scope)


class Air:
    """Base class for proved tables.

    Subclasses set:
      width                  number of main columns
      row_offsets            row window used by constraints (must start 0);
                             e.g. SHA-256's schedule uses (0,1,2,7,15,16)
      periodic_columns       list of int sequences (period divides n);
                             never committed, evaluated directly by both
                             prover and verifier (round constants etc.)
      aux_width              columns committed after challenge draw
      num_challenges         extension challenges available to build_aux/eval
      max_constraint_degree  max total degree incl. scope selector
    and implement ``eval(builder)``; ``build_aux(main, challenges)``
    produces the aux trace ((n, aux_width) uint64 numpy) when aux_width>0.
    """

    width: int = 0
    row_offsets = (0, 1)
    periodic_columns: Sequence[Sequence[int]] = ()
    aux_width: int = 0
    num_challenges: int = 0
    pre_width: int = 0
    pre_offsets = (0,)
    max_constraint_degree: int = 3

    def eval(self, builder: AirBuilder):
        raise NotImplementedError

    def build_aux(self, main_rows, challenges):
        raise NotImplementedError("Air has aux columns but no build_aux")

    def preprocessed_columns(self, n: int):
        """(n, pre_width) uint64 numpy of build-time constants."""
        raise NotImplementedError("Air has pre columns but no preprocessed_columns")
