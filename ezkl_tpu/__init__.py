"""ezkl_tpu — a TPU-native zero-knowledge proving framework for neural nets.

Capabilities mirror zkonduit/ezkl (ONNX graph -> PLONKish circuit over BN254
-> KZG SNARK), re-designed for TPU: the prover math (field arithmetic, NTT,
MSM, Poseidon, quotient evaluation) runs as vectorized JAX/XLA programs with
shard_map multi-chip scaling, while circuit synthesis and orchestration are
host-side Python.
"""

__version__ = "0.1.0"

import os as _os


def _machine_tag() -> str:
    """Fingerprint of the host CPU feature set. XLA:CPU stores AOT machine
    code in the persistent cache; loading an entry compiled on a machine
    with different vector extensions SIGILLs/segfaults at RUN time (the
    loader only warns). The build hosts rotate, so the cache dir must be
    keyed by this."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.blake2b(f"{platform.machine()};{feats}".encode(),
                        digest_size=6).hexdigest()
    return f"m-{h}"


def cache_dir() -> str:
    """The persistent-cache directory (shared by the package import hook,
    tests and tools).

    Keying: XLA:CPU AOT entries are host-machine code, so the CPU backend
    uses a machine-fingerprint subdir (loading another machine's entry
    SIGILLs at run time). Accelerator executables (TPU / the axon tunnel)
    are compiled for the DEVICE and are host-CPU-independent — they live in
    a platform-named subdir that stays warm across build-host rotation
    (r4's driver bench recorded 0.0 because the TPU cache was invisible
    behind another host's CPU key)."""
    import pathlib

    repo_root = pathlib.Path(__file__).resolve().parent.parent
    default = (repo_root / ".cache" / "jax"
               if (repo_root / "pyproject.toml").exists()
               else pathlib.Path.home() / ".ezkl-tpu" / "jax-cache")
    base = pathlib.Path(_os.environ.get("EZKL_TPU_CACHE", str(default)))
    try:
        import jax
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    tag = _machine_tag() if backend == "cpu" else f"p-{backend}"
    return str(base / tag)


def _setup_compile_cache():
    """Enable JAX's persistent compilation cache by default — the limb
    engine produces large XLA graphs whose compiles dominate cold starts.
    Opt out with EZKL_TPU_NO_CACHE=1; override base dir with EZKL_TPU_CACHE."""
    if _os.environ.get("EZKL_TPU_NO_CACHE"):
        return
    import pathlib

    import jax

    path = pathlib.Path(cache_dir())
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is best-effort


def _raise_stack_limit():
    """XLA's recursive passes can overflow the default 8MB stack on the
    large limb-arithmetic graphs; raise the soft limit (best effort)."""
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        want = 512 * 1024 * 1024
        if soft != resource.RLIM_INFINITY and soft < want:
            new = want if hard == resource.RLIM_INFINITY else min(want, hard)
            resource.setrlimit(resource.RLIMIT_STACK, (new, hard))
    except Exception:
        pass


_raise_stack_limit()
_setup_compile_cache()
