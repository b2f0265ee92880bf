"""blobstreamx_tpu — a TPU-native ZK proving stack with the capabilities of
succinctlabs/blobstreamx (reference layout documented in SURVEY.md).

Layers (bottom-up, mirroring SURVEY.md section 1):
  field/      Goldilocks + GF(p^2) limb arithmetic, NTT/LDE        (D1, D3)
  ops/        Poseidon, SHA-256, batched hash engines              (D2, D10)
  proof/      Merkle caps, transcript, FRI, STARK/AIR prover       (D4-D6)
  frontend/   circuit-builder DSL, variables, hints                (D7-D9)
  tendermint/ header hashing, merkle, protobuf, step/skip          (D13-D16)
  circuits/   BlobstreamX data-commitment / header-range circuits  (R4-R9)
  parallel/   mesh + sharded proving (pjit/shard_map collectives)  (2c)
  runtime/    operator loop, function CLI, fetchers                (R10-R13)
"""

import os

# Persistent XLA compilation cache: prover graphs are large and this
# environment's CPU compiles them slowly; cache once, reuse across runs.
if not os.environ.get("BSX_NO_COMPILE_CACHE"):
    import jax

    _cache_dir = os.environ.get(
        "BSX_COMPILE_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
