#!/usr/bin/env python
"""Headline benchmark: BN254 G1 MSM throughput (points/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is measured
against a fixed 1e6 points/s anchor — the ICICLE-class single-GPU figure for
2^20 MSMs — so cross-round progress is comparable.

Robustness: the driver runs this with a hard timeout on a possibly
cold-cache machine, and XLA TPU compiles of the MSM graph are ~100 s per
size. So we (a) generate points HOST-side (a 305 s device scalar_mul
compile killed the round-2 bench), (b) climb a size ladder 2^14→2^20,
keeping the best completed measurement, (c) arm SIGALRM to print the
best-so-far line and exit 0 if the budget runs out mid-compile.

Env knobs: BENCH_N (single size), BENCH_C (window bits), BENCH_ITERS,
BENCH_BUDGET_S (default 420), BENCH_KIND=ntt.
"""

import json
import os
import signal
import sys
import time

import numpy as np

T0 = time.time()
BUDGET = float(os.environ.get("BENCH_BUDGET_S", "420"))
BEST = {"metric": "msm_g1_points_per_s", "value": 0.0, "unit": "points/s",
        "vs_baseline": 0.0}


def emit_and_exit(*_args):
    print(json.dumps(BEST), flush=True)
    os._exit(0)


def remaining():
    return BUDGET - (time.time() - T0)


def host_points(n_base: int):
    """n_base distinct G1 points ((i+1)·G) as Montgomery limb arrays, fast:
    a sequential host walk of affine adds, then vectorized limb encode."""
    from ezkl_tpu.fieldmath import hostcurve as hc
    from ezkl_tpu.fieldmath import limbs
    from ezkl_tpu.fieldmath.spec import bn254_fq

    fq = bn254_fq()
    pts = []
    p = hc.G1
    for _ in range(n_base):
        pts.append(p)
        p = hc.g1_add(p, hc.G1)
    xs = limbs.encode(fq, [q[0] for q in pts])
    ys = limbs.encode(fq, [q[1] for q in pts])
    zs = np.broadcast_to(limbs.encode(fq, [1]), xs.shape).copy()
    return xs, ys, zs


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
    np.asarray(nttmod.ntt_jit(fr, dev))  # warm-up; host copy forces sync
    ins = []
    for i in range(iters):
        w = v.copy()
        w[0] ^= np.uint32(i + 1)  # distinct inputs each iteration
        ins.append(jnp.asarray(w))
    jax.block_until_ready(ins)
    t0 = time.perf_counter()
    for w in ins:
        # tiny dependent slice fetched to host: forces completion without a
        # 16 MB transfer (block_until_ready lies on axon)
        np.asarray(nttmod.ntt_jit(fr, w)[:, :1])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"ntt_fr_2p{k}_per_s",
        "value": round(1.0 / dt, 3),
        "unit": "transforms/s",
        "vs_baseline": round((1.0 / dt) / 10.0, 4),  # anchor: 10 NTT/s @2^18
    }))


def main():
    if os.environ.get("BENCH_KIND") == "ntt":
        return bench_ntt()

    # The alarm must fire BEFORE the driver's own hard timeout (= BUDGET),
    # or the best-so-far line never prints and the round records 0.0 —
    # exactly what happened in r4 (alarm was BUDGET+15).
    signal.signal(signal.SIGALRM, emit_and_exit)
    signal.alarm(max(30, int(BUDGET) - 25))

    import jax
    import jax.numpy as jnp

    from ezkl_tpu.fieldmath import curve
    from ezkl_tpu.kernels import msm as msmmod

    c = int(os.environ.get("BENCH_C", "0")) or None
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    n_env = int(os.environ.get("BENCH_N", "0"))
    # Three-rung ladder: a cheap 2^14 rung that must land even on a
    # stone-cold machine (r4 lesson: the 2^16 first rung never completed
    # inside the driver budget on a fresh cache and the round recorded 0.0),
    # then 2^16, then the 2^20 headline size.
    ladder = [n_env] if n_env else [1 << 14, 1 << 16, 1 << 20]

    n_base = 1 << 13
    xs, ys, zs = host_points(min(n_base, min(ladder)))
    n_base = xs.shape[-1]
    rng = np.random.default_rng(7)

    for n in ladder:
        # budget gate: a fresh compile costs ~100-120 s on a cold TPU cache
        if BEST["value"] > 0 and remaining() < 150:
            break
        reps = n // n_base
        P = curve.PointP(jnp.asarray(np.tile(xs, reps)),
                         jnp.asarray(np.tile(ys, reps)),
                         jnp.asarray(np.tile(zs, reps)))

        def rand_sc():
            sc = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint64)
            sc = sc.astype(np.uint32)
            sc[15] &= 0x03FF  # < 2^250, safely below the Fr modulus
            return jnp.asarray(sc)

        out = msmmod.msm_jit(P, rand_sc(), c=c, affine=True)
        np.asarray(out.x)  # warm-up compile + run
        # fresh scalars per iteration so no caching can short-circuit, and a
        # host copy of each result: block_until_ready is NOT reliable on the
        # experimental axon TPU platform (measured: it returns early).
        scs = [rand_sc() for _ in range(iters)]
        jax.block_until_ready(scs)
        t0 = time.perf_counter()
        for s in scs:
            o = msmmod.msm_jit(P, s, c=c, affine=True)
            np.asarray(o.x)
        dt = (time.perf_counter() - t0) / iters
        pts_per_s = n / dt
        if pts_per_s > BEST["value"]:
            BEST.update(metric=f"msm_g1_n{n}_points_per_s",
                        value=round(pts_per_s, 1),
                        vs_baseline=round(pts_per_s / 1e6, 4))

    signal.alarm(0)
    print(json.dumps(BEST), flush=True)


if __name__ == "__main__":
    main()
