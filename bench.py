"""Benchmark suite: the prover's hot kernels + an end-to-end header_range
proof (BASELINE.md north-star metrics).

Sections
  poseidon   batched width-12 permutation (Merkle caps, FRI, transcript)
  ntt        fused Pallas NTT (LDE hot loop), n=1024 and n=4096
  sha256     batched fixed-length SHA-256 (data-root tunnel leaves)
  merkle     device Merkle-cap reduction over 2^15 leaf digests
  e2e        full header_range prove+verify (skip + data commitment) and
             next_header prove on mocha-4 fixtures -> proofs/hour/chip

Timing methodology (tunnel-aware): this host reaches its TPU through a
remote-dispatch tunnel where each dispatch and each device->host copy
costs tens of ms and each fresh compile tens of seconds, so naive
per-call timing measures the tunnel, not the chip (rounds 1-4 reported
5.9 M Poseidon perm/s this way; the kernel actually runs ~15 M perm/s).
Every kernel here is timed as a *marginal* rate: the iteration loop runs
inside one jit (lax.fori_loop chaining the kernel), the same chain is
dispatched at two iteration counts, and the rate is
(work_hi - work_lo) / (t_hi - t_lo) — fixed dispatch/copy/compile cost
cancels.

Output: ONE JSON line
  {"metric": "header_range_proofs_per_hour_per_chip", "value": N,
   "unit": "proofs/h", "vs_baseline": N, "extra": {...all other metrics}}

vs_baseline compares against the same suite on this environment's 2-vCPU
host CPU (python bench.py --cpu; the reference publishes no numbers —
BASELINE.md).  Roofline accounting for the hot kernel is in "extra"
(see _poseidon_roofline below for the op-count derivation).
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Persistent compile cache: first-ever run pays remote compiles once;
# the driver's run then hits the cache (kept out of git via .gitignore).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# CPU baselines on this environment's 2-vCPU host (python bench.py --cpu;
# the reference publishes no numbers — BASELINE.md). poseidon was pinned in
# round 1; the others are provisional estimates pending a full --cpu sweep
# (the e2e CPU entries especially: first runs are XLA:CPU-compile-bound,
# so their vs_baseline ratios should be read as indicative, not precise).
CPU_BASELINES = {
    "poseidon_permutations_per_s": 93_000.0,   # measured (round 1)
    "ntt1024_points_per_s": 1.60e6,            # provisional
    "ntt4096_points_per_s": 1.57e6,            # provisional
    "sha256_hashes_per_s": 190_000.0,          # provisional
    "merkle_leaves_per_s": 180_000.0,          # provisional
    "header_range_proofs_per_hour_per_chip": 3600.0 / 151.0,  # provisional
    "next_header_seconds": 117.0,              # provisional
}

# v5e peaks (public spec): 394.5 int8 TOPS (MXU), 819 GB/s HBM.
V5E_INT8_TOPS = 394.5e12
V5E_HBM_GBS = 819e9


def _rate(chain, x, lo_iters, hi_iters, work_per_iter):
    """Marginal throughput of jitted chain(x, iters) (see module doc)."""
    import jax

    np.asarray(jax.device_get(chain(x, lo_iters)))  # compile lo
    np.asarray(jax.device_get(chain(x, hi_iters)))  # compile hi
    t0 = time.perf_counter()
    jax.device_get(chain(x, lo_iters))
    t1 = time.perf_counter()
    jax.device_get(chain(x, hi_iters))
    t2 = time.perf_counter()
    dt = (t2 - t1) - (t1 - t0)
    if dt <= 0:  # dispatch noise swamped the extra work; fall back
        dt = t2 - t1
        return work_per_iter * hi_iters / dt
    return work_per_iter * (hi_iters - lo_iters) / dt


def bench_poseidon(extra):
    import jax
    from blobstreamx_tpu.field import goldilocks as gl
    from blobstreamx_tpu.ops import poseidon as pos

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        from blobstreamx_tpu.ops.pallas import poseidon as ppos

        step = ppos.permute
    else:
        step = pos._permute_impl

    B = 1 << 15
    rng = np.random.default_rng(0)
    state = gl.from_int(
        rng.integers(0, 1 << 63, size=(B, 12), dtype=np.uint64) % gl.P)

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(st, iters):
        return jax.lax.fori_loop(0, iters, lambda i, s: step(s), st)

    # correctness pin vs the python reference before timing
    got = [int(v) for v in gl.to_int(np.asarray(chain(state, 1)[0]))]
    want = pos.permute_py([int(v) for v in gl.to_int(np.asarray(state[0]))])
    assert got == want, "poseidon kernel mismatch vs reference"

    rate = _rate(chain, state, 8, 40, B)
    extra["poseidon_permutations_per_s"] = round(rate, 1)
    _poseidon_roofline(rate, extra)
    return rate


def _poseidon_roofline(rate, extra):
    """Where the kernel sits vs v5e speed-of-light.

    MXU: the MDS layer is one (228,120)@(120,tile) int8 matmul per round,
    30 rounds -> 228*120*30 = 820,800 int8 MACs per permutation.
    HBM: the fused kernel reads+writes the state once -> 192 B/perm.
    The s-box/reduction limb chains are u32 VPU work between matmuls, so
    MXU% well under 100 with HBM% near zero means the kernel is VPU-bound
    (the expected regime for 64-bit field emulation on 32-bit lanes).
    """
    macs = 228 * 120 * 30
    extra["poseidon_mxu_pct_of_peak"] = round(
        100.0 * rate * macs / V5E_INT8_TOPS, 2)
    extra["poseidon_hbm_pct_of_peak"] = round(
        100.0 * rate * 192 / V5E_HBM_GBS, 3)


def bench_ntt(extra):
    import jax
    from blobstreamx_tpu.field import ntt as fntt
    from blobstreamx_tpu.field import goldilocks as gl

    rng = np.random.default_rng(1)
    for n, b in ((1024, 256), (4096, 64)):
        x = gl.from_int(
            rng.integers(0, 1 << 63, size=(b, n), dtype=np.uint64) % gl.P)

        @functools.partial(jax.jit, static_argnums=(1,))
        def chain(y, iters):
            return jax.lax.fori_loop(0, iters, lambda i, z: fntt.ntt(z), y)

        rate = _rate(chain, x, 2, 8, b * n)
        extra[f"ntt{n}_points_per_s"] = round(rate, 1)


def bench_sha256(extra):
    import jax
    import jax.numpy as jnp
    from blobstreamx_tpu.ops import sha256 as osha

    on_tpu = jax.devices()[0].platform == "tpu"
    B = 1 << 15
    rng = np.random.default_rng(2)
    msgs = rng.integers(0, 256, size=(B, 64), dtype=np.uint8)

    if on_tpu:
        from blobstreamx_tpu.ops.pallas import sha256 as psha

        @functools.partial(jax.jit, static_argnums=(1,))
        def chain(m, iters):
            def body(i, acc):
                dig = psha._hash_padded(acc, 64, B, False)  # (B, 32)
                return jnp.concatenate([dig, dig], axis=1)  # back to (B, 64)
            return jax.lax.fori_loop(0, iters, body, m)

        rate = _rate(chain, jnp.asarray(msgs), 4, 16, B)
    else:
        t0 = time.perf_counter()
        for _ in range(4):
            osha.sha256_fixed_len(msgs)
        rate = 4 * B / (time.perf_counter() - t0)
    # correctness pin on the public entry point
    dig = osha.sha256_fixed_len(msgs[:4])
    import hashlib

    assert bytes(dig[0]) == hashlib.sha256(msgs[0].tobytes()).digest()
    extra["sha256_hashes_per_s"] = round(rate, 1)


def bench_merkle(extra):
    import jax
    import jax.numpy as jnp
    from blobstreamx_tpu.field import goldilocks as gl
    from blobstreamx_tpu.proof import merkle_cap

    B = 1 << 15
    rng = np.random.default_rng(3)
    digests = gl.from_int(
        rng.integers(0, 1 << 63, size=(B, 4), dtype=np.uint64) % gl.P)

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(d, iters):
        def body(i, acc):
            root = merkle_cap.device_tree_root(acc, 0)  # (1, 4, 2)
            return gl.add(acc, jnp.broadcast_to(root, acc.shape))
        return jax.lax.fori_loop(0, iters, body, d)

    rate = _rate(chain, digests, 2, 6, B)
    extra["merkle_leaves_per_s"] = round(rate, 1)


def bench_e2e(extra):
    """Full prove+verify of the two production functions on mocha-4
    fixtures at the CPU-provable template shape (the reference's
    small/medium/large test-template pattern, SURVEY.md section 4):
    header_range vss=2, 1 map job x 4 blocks over 10000->10004;
    next_header vss=2 at 10000->10001. Proofs self-verify and the data
    commitments are checked against the recorded fixture roots.

    Runs on the host CPU backend: in this environment the TPU is behind a
    remote-dispatch tunnel whose per-dispatch/per-sync latency (~5-100 ms)
    dominates a proof's thousands of small host<->device interactions —
    e2e wall-clock there measures the tunnel, not the chip (a 64-row toy
    STARK exceeds 9 min on TPU vs ~20 s on this 2-vCPU CPU). The batched
    kernels above are where the TPU does the proof's heavy lifting and
    are measured on the chip with dispatch cost cancelled."""
    from blobstreamx_tpu.proof import stark

    cfg = stark.StarkConfig(rate_bits=3, cap_height=1, num_query_rounds=8,
                            pow_bits=4, final_poly_bits=2)

    from blobstreamx_tpu.circuits.header_range import HeaderRangeCircuit
    from blobstreamx_tpu.circuits.next_header import NextHeaderCircuit
    from blobstreamx_tpu.circuits.input import SkipInputFetcher

    budget = float(os.environ.get("BENCH_E2E_BUDGET_S", "900"))
    t_start = time.perf_counter()
    # hard stop: the surrounding suite must emit its JSON line even if a
    # cold-compile prove blows the budget (XLA:CPU compiles of the
    # combined circuits take tens of minutes uncached on a 2-vCPU host)
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("e2e budget exceeded")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(budget))
    f = SkipInputFetcher()

    # Stage 1 (always fits): the standalone data-commitment circuit — the
    # reference's own test circuit (circuits/data_commitment.rs) — proved
    # over the fixture range and checked bit-exact vs the recorded root.
    from blobstreamx_tpu.circuits.data_commitment import DataCommitmentCircuit

    dc = DataCommitmentCircuit(max_leaves=2)
    t0 = time.perf_counter()
    proof, publics, root = dc.prove(10000, 10002, cfg)
    dc_s = time.perf_counter() - t0
    assert root == f.get_data_commitment(10000, 10002)
    assert dc.verify(proof, publics, cfg)
    extra["data_commitment_prove_seconds"] = round(dc_s, 1)

    # Stage 2: the flagship header_range (skip + inline data commitment).
    # Its ed25519/sha512 quotient graphs are XLA:CPU-compile-heavy; cold
    # runs can exceed the budget — the persistent compile cache
    # (.jax_cache) makes warm runs execution-bound.
    prove_s = None
    try:
        hr = HeaderRangeCircuit(vss=2, nb_map_jobs=1, batch_size=4,
                                fetcher=f)
        t0 = time.perf_counter()
        proof, publics = hr.prove(10000, 10004, cfg)[:2]
        prove_s = time.perf_counter() - t0
        assert bytes(publics[80:112]) == f.get_data_commitment(10000, 10004)
        t0 = time.perf_counter()
        assert hr.verify(proof, publics, cfg)
        verify_s = time.perf_counter() - t0
        extra["header_range_prove_seconds"] = round(prove_s, 1)
        extra["header_range_verify_seconds"] = round(verify_s, 1)
        extra["header_range_shape"] = "vss=2 1x4 (4 blocks, mocha-4 fixtures)"

        nh = NextHeaderCircuit(vss=2, fetcher=f)
        t0 = time.perf_counter()
        proof, publics = nh.prove(10000, cfg)
        nh_s = time.perf_counter() - t0
        assert bytes(publics[40:72]) == f.get_header(10001).hash()
        extra["next_header_seconds"] = round(nh_s, 1)
    except TimeoutError:
        extra["e2e_budget_note"] = (
            "budget exhausted before all stages (cold XLA:CPU compiles); "
            "warm .jax_cache completes the suite")
    finally:
        signal.alarm(0)
    return (3600.0 / prove_s) if prove_s else None


def _run_e2e_child():
    """Child process: force the CPU backend, run the e2e section, print
    its metrics as one JSON line on stdout (marker-prefixed)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    extra = {}
    try:
        proofs_per_hour = bench_e2e(extra)
    except Exception as e:
        extra["e2e_error"] = repr(e)[:300]
        proofs_per_hour = None
    extra["_proofs_per_hour"] = proofs_per_hour
    print("E2E_JSON:" + json.dumps(extra), flush=True)


def _spawn_e2e(extra):
    import subprocess

    p = subprocess.run(
        [sys.executable, "-u", os.path.abspath(__file__), "--e2e-child"],
        capture_output=True, text=True, cwd=REPO)
    for line in p.stdout.splitlines():
        if line.startswith("E2E_JSON:"):
            child = json.loads(line[len("E2E_JSON:"):])
            rate = child.pop("_proofs_per_hour")
            extra.update(child)
            extra["e2e_platform"] = "cpu-host (see bench_e2e docstring)"
            return rate
    raise RuntimeError(
        f"e2e child failed: rc={p.returncode}\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}")


def main():
    if "--e2e-child" in sys.argv:
        _run_e2e_child()
        return
    force_cpu = "--cpu" in sys.argv
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform
    extra = {"platform": platform}

    for section in (bench_poseidon, bench_ntt, bench_sha256, bench_merkle):
        try:
            section(extra)
        except Exception as e:  # one broken section must not eat the line
            extra[section.__name__ + "_error"] = repr(e)[:200]
    if "--quick" in sys.argv:
        proofs_per_hour = None
        extra["bench_e2e_error"] = "skipped (--quick)"
    else:
        try:
            proofs_per_hour = (bench_e2e(extra) if force_cpu
                               else _spawn_e2e(extra))
        except Exception as e:
            extra["bench_e2e_error"] = repr(e)[:400]
            proofs_per_hour = None

    for k, v in CPU_BASELINES.items():
        if isinstance(extra.get(k), (int, float)):
            extra[f"{k}_vs_cpu"] = round(extra[k] / v, 2)

    if proofs_per_hour is not None:
        out = {
            "metric": "header_range_proofs_per_hour_per_chip",
            "value": round(proofs_per_hour, 2),
            "unit": "proofs/h",
            "vs_baseline": round(
                proofs_per_hour
                / CPU_BASELINES["header_range_proofs_per_hour_per_chip"], 3),
        }
    elif isinstance(extra.get("data_commitment_prove_seconds"), (int, float)):
        # header_range blew the e2e budget (cold compiles); the
        # data-commitment stage is still a full prove+verify round trip
        # checked bit-exact vs the recorded fixture root
        dc_rate = 3600.0 / extra["data_commitment_prove_seconds"]
        out = {
            "metric": "data_commitment_proofs_per_hour_per_chip",
            "value": round(dc_rate, 2),
            "unit": "proofs/h",
            "vs_baseline": 1.0,  # measured on the baseline platform itself
        }
    else:  # e2e unavailable: fall back to the hot-kernel headline
        rate = extra.get("poseidon_permutations_per_s", 0.0)
        out = {
            "metric": "poseidon_permutations_per_s",
            "value": rate,
            "unit": "perm/s",
            "vs_baseline": round(
                rate / CPU_BASELINES["poseidon_permutations_per_s"], 3),
        }
    out["extra"] = extra
    print(json.dumps(out))


if __name__ == "__main__":
    main()
