"""Test configuration: force CPU backend with 8 virtual devices so multi-chip
sharding paths (mesh/pjit/shard_map) are exercised without TPU hardware.

Note: the environment's sitecustomize force-registers the TPU tunnel
("axon") platform and env JAX_PLATFORMS is overridden, so we must use
jax.config.update after import. XLA_FLAGS must still be set before the CPU
backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
