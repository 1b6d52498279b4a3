"""Cold-interpreter regression tests for the cached-tracer class of bug.

Round 4 shipped a regression where the lru-cached NTT twiddle tables stored a
`DynamicJaxprTracer` (first touch inside a jit trace) and every subsequent
distinct jit of the same size crashed with UnexpectedTracerError — but only
from a COLD process: any in-process test that had already touched the table
eagerly masked it.  These tests therefore run their payloads in fresh
subprocess interpreters, exactly the way the driver / a user would hit them.

Reference bar: the reference's prove path has no warm-state precondition
(`/root/reference/src/pfsys/mod.rs:404`).
"""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

# Child interpreters mirror conftest.py's platform + persistent-cache setup so
# repeat runs hit the machine-keyed disk cache instead of recompiling.
_PRELUDE = """
import os, pathlib, sys
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import ezkl_tpu
_cache = pathlib.Path(ezkl_tpu.cache_dir()); _cache.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
""".format(repo=str(REPO))


def _run_cold(body: str, timeout: int = 900) -> None:
    proc = subprocess.run(
        [sys.executable, "-c", _PRELUDE + body],
        capture_output=True, text=True, timeout=timeout, cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"cold subprocess failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr[-4000:]}"
    )


def test_two_distinct_jits_share_twiddle_table_cold():
    """The 10-line r4 repro: first NTT of a size runs INSIDE a jit trace,
    then a second, distinct jit of the same size must not crash."""
    _run_cold("""
import jax, jax.numpy as jnp, numpy as np
from ezkl_tpu.fieldmath.spec import bn254_fr
from ezkl_tpu.fieldmath import limbs
from ezkl_tpu.kernels import ntt as N
spec = bn254_fr()
vals = list(range(8))
x = jnp.asarray(limbs.encode(spec, vals))
r1 = jax.jit(lambda a: N.ntt(spec, a))(x)                      # poisoning touch
r2 = jax.jit(lambda a: N.intt(spec, N.ntt(spec, a)))(x)        # distinct jit, same table
assert list(limbs.decode(spec, np.asarray(r1))) == N.host_ntt(spec, vals)
assert list(limbs.decode(spec, np.asarray(r2))) == [v % spec.modulus for v in vals]
jax.jit(lambda a: N.coset_ntt(spec, a))(x)                     # coset table, traced touch
rc = jax.jit(lambda a: N.coset_intt(spec, N.coset_ntt(spec, a)))(x)
assert list(limbs.decode(spec, np.asarray(rc))) == [v % spec.modulus for v in vals]
# a tracer must never survive in the device memo
from jax._src.core import Tracer
assert not any(isinstance(v, Tracer) for v in N._DEV_MEMO.values())
""")


def test_prove_and_verify_cold_interpreter():
    """Full prove -> verify in a fresh interpreter: no warm in-process state
    may be a precondition of proving (the r4 HEAD failure mode)."""
    _run_cold("""
sys.path.insert(0, {tests!r})
from test_plonk import build_circuit, build_assignment, K
from ezkl_tpu.plonk import keygen, prover, verifier, srs as srsmod
cs, cols = build_circuit()
asg = build_assignment(cs, cols)
srs = srsmod.gen_srs(K)
pk = keygen.keygen(cs, K, srs, asg)
proof = prover.create_proof(pk, srs, asg, seed=7)
assert verifier.verify(pk.vk, srs.g2, srs.s_g2, proof), "cold prove must verify"
import dataclasses
bad = dataclasses.replace(proof, instances=[[proof.instances[0][0] + 1]])
assert not verifier.verify(pk.vk, srs.g2, srs.s_g2, bad)
""".format(tests=str(REPO / "tests")))
