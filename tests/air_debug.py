"""Debug helper: evaluate an AIR's constraints on the raw trace domain and
report which constraints fail on which rows (no proving)."""

import numpy as np
import jax.numpy as jnp

from blobstreamx_tpu.field import goldilocks as gl
from blobstreamx_tpu.proof.air import (
    AirBuilder, BaseLdeBackend, EVERYWHERE, FIRST_ROW, LAST_ROW, TRANSITION,
)


def check_air_on_trace(air, trace: np.ndarray, publics=(), challenges=None,
                       aux: np.ndarray = None) -> list:
    """Returns [(constraint_idx, scope, bad_row_indices)] for failures."""
    n = trace.shape[0]
    cols = gl.from_int(trace)

    def rolled(offsets, mat):
        out = {}
        for k in offsets:
            m = jnp.roll(mat, -k, axis=0) if k else mat
            out[k] = [m[:, i, :] for i in range(m.shape[1])]
        return out

    rows = rolled(air.row_offsets, cols)
    aux_rows = None
    if aux is not None:
        aux_rows = rolled((0, 1), gl.from_int(aux))
    pre_rows = None
    if air.pre_width:
        pre = air.preprocessed_columns(n)
        pre_rows = rolled(air.pre_offsets, gl.from_int(pre))
    periodic = []
    for vals in air.periodic_columns:
        tiled = np.tile(np.asarray(vals, dtype=np.uint64), n // len(vals))
        periodic.append(gl.from_int(tiled))
    b = AirBuilder(
        BaseLdeBackend(n), rows=rows, publics=list(publics),
        aux_rows=aux_rows, challenges=challenges or [],
        periodic=periodic, pre_rows=pre_rows,
    )
    air.eval(b)
    failures = []
    for ci, con in enumerate(b.constraints):
        v = np.asarray(con.expr)
        ints = gl.to_int(v)  # (n,) or (K, n)
        if ints.ndim == 1:
            ints = ints[None]
        bad = set()
        for lane in ints:
            nz = np.nonzero(lane)[0]
            if con.scope == FIRST_ROW:
                nz = nz[nz == 0]
            elif con.scope == LAST_ROW:
                nz = nz[nz == n - 1]
            elif con.scope == TRANSITION:
                nz = nz[nz != n - 1]
            bad.update(int(x) for x in nz)
        if bad:
            failures.append((ci, con.scope, sorted(bad)[:10]))
    return failures
