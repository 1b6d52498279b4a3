"""ezkl_tpu — a TPU-native zero-knowledge proving framework for neural nets.

Capabilities mirror zkonduit/ezkl (ONNX graph -> PLONKish circuit over BN254
-> KZG SNARK), re-designed for TPU: the prover math (field arithmetic, NTT,
MSM, Poseidon, quotient evaluation) runs as vectorized JAX/XLA programs with
shard_map multi-chip scaling, while circuit synthesis and orchestration are
host-side Python.
"""

__version__ = "0.1.0"

import os as _os


def _setup_compile_cache():
    """Enable JAX's persistent compilation cache by default — the limb
    engine produces large XLA graphs whose compiles dominate cold starts.
    Opt out with EZKL_TPU_NO_CACHE=1; override dir with EZKL_TPU_CACHE."""
    if _os.environ.get("EZKL_TPU_NO_CACHE"):
        return
    import pathlib

    import jax

    default = pathlib.Path.home() / ".ezkl-tpu" / "jax-cache"
    path = pathlib.Path(_os.environ.get("EZKL_TPU_CACHE", str(default)))
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is best-effort


_setup_compile_cache()
