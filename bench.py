#!/usr/bin/env python
"""Headline benchmark: BN254 G1 MSM throughput (points/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is measured
against a fixed 1e6 points/s anchor — the ICICLE-class single-GPU figure for
2^20 MSMs — so cross-round progress is comparable.

Env knobs: BENCH_N (default 2^16), BENCH_C (window bits), BENCH_ITERS.
"""

import json
import os
import time

import numpy as np


def bench_ntt():
    import jax
    import jax.numpy as jnp
    from ezkl_tpu.fieldmath.spec import bn254_fr
    from ezkl_tpu.kernels import ntt as nttmod

    fr = bn254_fr()
    k = int(os.environ.get("BENCH_K", "18"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1 << 16, size=(16, 1 << k), dtype=np.uint64).astype(np.uint32)
    v[15] &= 0x03FF
    dev = jnp.asarray(v)
    out = jax.block_until_ready(nttmod.ntt_jit(fr, dev))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = nttmod.ntt_jit(fr, dev)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"ntt_fr_2p{k}_per_s",
        "value": round(1.0 / dt, 3),
        "unit": "transforms/s",
        "vs_baseline": round((1.0 / dt) / 10.0, 4),  # anchor: 10 NTT/s @2^18
    }))


def main():
    import jax
    import jax.numpy as jnp

    from ezkl_tpu.fieldmath import curve, limbs
    from ezkl_tpu.fieldmath.spec import bn254_fr
    from ezkl_tpu.kernels import msm as msmmod

    if os.environ.get("BENCH_KIND") == "ntt":
        return bench_ntt()

    fr = bn254_fr()
    n = int(os.environ.get("BENCH_N", str(1 << 14)))
    c = int(os.environ.get("BENCH_C", "0")) or None
    group = int(os.environ.get("BENCH_GROUP", "0")) or None
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    rng = np.random.default_rng(7)

    # Points: [k_i]G for random 32-bit k_i, computed on device (batch
    # double-and-add over 32 bit-planes). Projective output feeds MSM as-is.
    ks = rng.integers(1, 1 << 32, size=n, dtype=np.uint64)
    bits = np.zeros((32, n), dtype=np.uint32)
    for b in range(32):
        bits[b] = ((ks >> (31 - b)) & 1).astype(np.uint32)
    g = curve.generator((n,))

    @jax.jit
    def gen_points(bits):
        return curve.scalar_mul(g, bits)

    points = jax.block_until_ready(gen_points(jnp.asarray(bits)))

    # Scalars: random < 2^250 (safely below the modulus), raw limb form.
    sc = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint64).astype(np.uint32)
    sc[15] &= 0x03FF
    scalars = jnp.asarray(sc)

    out = jax.block_until_ready(msmmod.msm_jit(points, scalars, c=c, group=group))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = msmmod.msm_jit(points, scalars, c=c, group=group)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    pts_per_s = n / dt
    print(json.dumps({
        "metric": f"msm_g1_n{n}_points_per_s",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / 1e6, 4),
    }))


if __name__ == "__main__":
    main()
