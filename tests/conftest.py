"""Test configuration: force an 8-device virtual CPU platform BEFORE jax imports.

Tests exercise multi-chip sharding logic (shard_map over a Mesh) without TPU
hardware; the driver separately dry-run-compiles the multi-chip path and runs
benches on a real chip.

Also enables JAX's persistent compilation cache: the limb engine produces
large XLA graphs whose compiles dominate test time on CPU; caching them makes
repeat runs fast.
"""

import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver env may point at a TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may have imported jax already (axon PJRT hook), in which case
# the env var above was read too early — force the config directly.
jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import ezkl_tpu  # noqa: E402

# machine-keyed cache dir: XLA:CPU AOT entries from another build host
# SIGILL at run time (see ezkl_tpu.cache_dir)
_cache_dir = pathlib.Path(ezkl_tpu.cache_dir())
_cache_dir.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_jit_memory():
    """Accumulated LLVM JIT code sections across the whole suite exhaust
    section memory ('Unable to allocate section memory' / segfaults); drop
    in-process executables after each module — recompiles hit the disk
    cache."""
    yield
    jax.clear_caches()
