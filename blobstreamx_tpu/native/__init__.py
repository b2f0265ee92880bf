"""Native (C++) host runtime kernels with lazy build + ctypes bindings.

Accelerates the host-sequential pieces of the proving runtime — Fiat-Shamir
duplex permutations, FRI proof-of-work grinding, verifier Merkle-path
climbs — mirroring the reference stack where these run as native Rust
inside plonky2. The TPU keeps the batched work; this keeps the transcript-
bound tail off the python interpreter.

Falls back silently (``LIB is None``) when no C++ toolchain is available;
all callers keep a pure-python path.
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import List, Optional, Sequence

log = logging.getLogger("blobstreamx_tpu.native")

LIB: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    try:
        from .build import build
        lib = ctypes.CDLL(build())
    except Exception as e:  # pragma: no cover - toolchain-dependent
        log.info("native kernels unavailable (%s); using python fallback", e)
        return None
    u64 = ctypes.c_uint64
    p64 = ctypes.POINTER(u64)
    lib.bsx_poseidon_permute.argtypes = [p64]
    lib.bsx_poseidon_permute_batch.argtypes = [p64, u64]
    lib.bsx_poseidon_hash_no_pad.argtypes = [p64, u64, p64]
    lib.bsx_poseidon_two_to_one.argtypes = [p64, p64, p64]
    lib.bsx_grind.argtypes = [p64, p64, u64, u64]
    lib.bsx_grind.restype = u64
    lib.bsx_merkle_climb.argtypes = [p64, p64, u64, u64, p64]
    lib.bsx_merkle_tree.argtypes = [p64, u64, u64, u64, p64]
    return lib


LIB = _load()


def _arr(xs: Sequence[int]):
    return (ctypes.c_uint64 * len(xs))(*xs)


def available() -> bool:
    return LIB is not None


def permute(state: Sequence[int]) -> List[int]:
    buf = _arr(state)
    LIB.bsx_poseidon_permute(buf)
    return list(buf)


def hash_no_pad(inputs: Sequence[int]) -> List[int]:
    out = (ctypes.c_uint64 * 4)()
    LIB.bsx_poseidon_hash_no_pad(_arr(inputs), len(inputs), out)
    return list(out)


def hash_two_to_one(left: Sequence[int], right: Sequence[int]) -> List[int]:
    out = (ctypes.c_uint64 * 4)()
    LIB.bsx_poseidon_two_to_one(_arr(left), _arr(right), out)
    return list(out)


def grind(state: Sequence[int], pending: Sequence[int], pow_bits: int) -> int:
    return int(LIB.bsx_grind(_arr(state), _arr(pending or [0]),
                             len(pending), pow_bits))


def merkle_tree(rows, n: int, w: int, n_levels: int):
    """rows: contiguous numpy uint64 (n, w). Returns a flat numpy uint64
    digest buffer: layer 0 (n*4), layer 1 (n/2*4), ... cap ((n>>lv)*4)."""
    import numpy as np

    total = 0
    m = n
    for _ in range(n_levels + 1):
        total += m * 4
        m //= 2
    out = np.empty(total, dtype=np.uint64)
    LIB.bsx_merkle_tree(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n, w,
        n_levels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return out


def merkle_climb(leaf_digest: Sequence[int], siblings: Sequence[Sequence[int]],
                 index: int) -> List[int]:
    flat: List[int] = []
    for s in siblings:
        flat.extend(s)
    out = (ctypes.c_uint64 * 4)()
    LIB.bsx_merkle_climb(_arr(leaf_digest), _arr(flat or [0]),
                         len(siblings), index, out)
    return list(out)
