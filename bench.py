"""Benchmark: batched Poseidon permutation throughput (the prover's hot
kernel — backs every Merkle-cap commitment and FRI layer).

On TPU this runs the fused Pallas kernel (ops/pallas/poseidon.py: all 30
rounds VMEM-resident, MDS as int8 MXU matmuls); on CPU it falls back to
the XLA einsum path so the same script pins the baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the same kernel measured on this environment's 2-vCPU host CPU
(see BASELINE.md — the reference publishes no numbers, so baselines are
measured; CPU rate recorded below from a pinned run of this same script
with --cpu).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# measured on the 2-vCPU host (python bench.py --cpu), see BASELINE.md
CPU_BASELINE_PERM_PER_S = 93_000.0

BATCH = 1 << 15
ITERS = 8


def main():
    force_cpu = "--cpu" in sys.argv
    if force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    from blobstreamx_tpu.field import goldilocks as gl
    from blobstreamx_tpu.ops import poseidon as pos

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        from blobstreamx_tpu.ops.pallas import poseidon as ppos

        fn = ppos.permute
    else:
        fn = jax.jit(pos._permute_impl)

    rng = np.random.default_rng(0)
    state = gl.from_int(
        rng.integers(0, 1 << 63, size=(BATCH, 12), dtype=np.uint64) % gl.P
    )
    out = fn(state)
    out.block_until_ready()  # compile
    # correctness spot-check vs python reference
    got = [int(v) for v in gl.to_int(np.asarray(out[0]))]
    want = pos.permute_py([int(v) for v in gl.to_int(np.asarray(state[0]))])
    assert got == want, "poseidon kernel mismatch vs reference"

    t0 = time.time()
    cur = state
    for _ in range(ITERS):
        cur = fn(cur)
    cur.block_until_ready()
    dt = time.time() - t0
    rate = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "poseidon_permutations_per_s",
                "value": round(rate, 1),
                "unit": "perm/s",
                "vs_baseline": round(rate / CPU_BASELINE_PERM_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
