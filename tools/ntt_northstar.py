"""Measure the north-star NTT metric: 2^24-point BN254 Fr transforms/s on
one chip (BASELINE.md), plus a small k-ladder for the PERF table.

Also reports the radix-2 vs four-step split at each size so the
EZKL_TPU_FOURSTEP crossover in `kernels/ntt.py:_use_fourstep` stays
grounded in measurements.

Usage: python tools/ntt_northstar.py [--ks 20,22,24] [--iters 3]
Timing uses a tiny dependent host slice per iteration (block_until_ready
is unreliable on the axon platform, docs/PERF.md r3).
"""

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def bench_one(k: int, iters: int, fourstep: bool | None) -> float:
    import os
    if fourstep is not None:
        os.environ["EZKL_TPU_FOURSTEP"] = "1" if fourstep else "0"
    import jax
    import jax.numpy as jnp
    from ezkl_tpu.fieldmath.spec import bn254_fr
    from ezkl_tpu.kernels import ntt as nttmod

    fr = bn254_fr()
    rng = np.random.default_rng(11)
    v = rng.integers(0, 1 << 16, size=(16, 1 << k),
                     dtype=np.uint64).astype(np.uint32)
    v[15] &= 0x03FF                       # < 2^250
    jax.clear_caches()                    # force re-trace for the env knob
    ins = []
    for i in range(iters):
        w = v.copy()
        w[0] ^= np.uint32(i + 1)
        ins.append(jnp.asarray(w))
    np.asarray(nttmod.ntt_jit(fr, ins[0])[:, :1])     # warm-up
    t0 = time.perf_counter()
    for w in ins:
        np.asarray(nttmod.ntt_jit(fr, w)[:, :1])      # dependent slice sync
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="20,22,24")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--paths", default="auto",
                    help="auto | radix2 | fourstep | both")
    args = ap.parse_args()
    import jax
    backend = jax.default_backend()
    for k in [int(x) for x in args.ks.split(",")]:
        modes = {"auto": [None], "radix2": [False], "fourstep": [True],
                 "both": [False, True]}[args.paths]
        for fs in modes:
            label = {None: "auto", False: "radix2", True: "fourstep"}[fs]
            try:
                dt = bench_one(k, args.iters, fs)
            except Exception as e:              # OOM at 2^24 ext sizes etc
                print(json.dumps({"k": k, "path": label,
                                  "error": str(e)[:200]}), flush=True)
                continue
            print(json.dumps({
                "k": k, "path": label, "backend": backend,
                "seconds": round(dt, 4),
                "transforms_per_s": round(1.0 / dt, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
