"""Test configuration: force an 8-device virtual CPU platform BEFORE jax imports.

Tests exercise multi-chip sharding logic (shard_map over a Mesh) without TPU
hardware; the driver separately dry-run-compiles the multi-chip path and runs
benches on a real chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
