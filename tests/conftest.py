"""Test configuration: force an 8-device virtual CPU mesh, so multi-chip
sharding paths (shard_map + psum) are exercised without TPU hardware.

Note: the environment's axon site hook re-pins JAX_PLATFORMS to the TPU at jax
import time, so setting the env var alone is not enough — we also override the
platform through jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, f"expected 8 virtual cpu devices, got {jax.devices()}"
