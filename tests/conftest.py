"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax imports, so
multi-chip sharding paths (shard_map + psum) are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
