"""Hierarchical timing trees + profiler hooks — the tracing/profiling
subsystem the reference lacks (SURVEY.md §5: "RUST_LOG=debug … plonky2
internally uses log-based timing trees"; here it is first-class).

Usage:
    from blobstreamx_tpu.utils import timing

    with timing.span("prove_system"):
        with timing.span("lde+commit"):
            ...
    print(timing.report())        # indented tree with wall times

Spans nest per-thread; device work is attributed correctly as long as the
caller blocks (block_until_ready) inside the span — for async dispatch use
``timing.device_span`` which synchronizes on exit. ``timing.jax_profile``
wraps a block in a JAX/xprof trace for deep kernel-level inspection.

Enable/disable globally with ``timing.enable(False)`` or env
``BSX_TIMING=0`` (report collection is cheap; default on).
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import List, Optional

_ENABLED = os.environ.get("BSX_TIMING", "1") != "0"


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = on


@dataclass
class Span:
    name: str
    t0: float = 0.0
    elapsed: float = 0.0
    count: int = 1
    children: List["Span"] = field(default_factory=list)

    def child(self, name: str) -> "Span":
        # merge repeated siblings (loops) into one line with a count
        for c in self.children:
            if c.name == name:
                c.count += 1
                return c
        c = Span(name)
        self.children.append(c)
        return c


class _State(threading.local):
    def __init__(self):
        self.root = Span("total")
        self.stack: List[Span] = [self.root]


_state = _State()


def reset():
    _state.root = Span("total")
    _state.stack = [_state.root]


@contextmanager
def span(name: str):
    if not _ENABLED:
        yield
        return
    s = _state.stack[-1].child(name)
    _state.stack.append(s)
    t0 = time.perf_counter()
    try:
        yield s
    finally:
        s.elapsed += time.perf_counter() - t0
        _state.stack.pop()


@contextmanager
def device_span(name: str, *sync_arrays):
    """span() that blocks on the given jax arrays before closing, so async
    device dispatch is charged to the right node."""
    with span(name) as s:
        yield s
        for a in sync_arrays:
            if hasattr(a, "block_until_ready"):
                a.block_until_ready()


def timed(name: Optional[str] = None):
    """Decorator form."""
    def deco(fn):
        label = name or fn.__qualname__

        def wrapper(*args, **kwargs):
            with span(label):
                return fn(*args, **kwargs)
        wrapper.__name__ = fn.__name__
        wrapper.__qualname__ = fn.__qualname__
        return wrapper
    return deco


def _fmt(s: Span, depth: int, total: float, lines: List[str]):
    pct = 100.0 * s.elapsed / total if total > 0 else 0.0
    cnt = f" x{s.count}" if s.count > 1 else ""
    lines.append(f"{'  ' * depth}{s.elapsed * 1e3:9.1f} ms {pct:5.1f}%  "
                 f"{s.name}{cnt}")
    for c in s.children:
        _fmt(c, depth + 1, total, lines)


def report(root: Optional[Span] = None) -> str:
    """Indented timing tree (ms, % of top-level)."""
    r = root or _state.root
    top = sum(c.elapsed for c in r.children)
    lines: List[str] = []
    for c in r.children:
        _fmt(c, 0, top, lines)
    return "\n".join(lines)


def tree() -> Span:
    return _state.root


class _Phases:
    """Sequential phase marks inside one parent span: ``mark(name)`` closes
    the previous phase and starts the next; ``end()`` closes the last.
    Zero-indentation alternative to nested ``with span(...)`` blocks."""

    def __init__(self, parent_name: str):
        self.parent = _state.stack[-1].child(parent_name) if _ENABLED else None
        self.cur: Optional[Span] = None
        self.t0 = 0.0
        self.p0 = time.perf_counter()

    def mark(self, name: str):
        now = time.perf_counter()
        if self.cur is not None:
            self.cur.elapsed += now - self.t0
        if self.parent is not None:
            self.cur = self.parent.child(name)
            self.t0 = now

    def end(self):
        now = time.perf_counter()
        if self.cur is not None:
            self.cur.elapsed += now - self.t0
            self.cur = None
        if self.parent is not None:
            self.parent.elapsed += now - self.p0


def phases(parent_name: str) -> _Phases:
    return _Phases(parent_name)


@contextmanager
def jax_profile(logdir: str):
    """Wrap a block in a JAX profiler trace (xprof/tensorboard format)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
