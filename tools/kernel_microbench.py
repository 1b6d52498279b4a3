#!/usr/bin/env python
"""Microbenchmark the hot device kernels on the real chip.

Prints per-kernel achieved throughput + a speed-of-light comparison, to
locate where MSM/NTT wall time goes (pallas mont_mul, pallas point add,
argsort, gather). Used to maintain docs/PERF.md's speed-of-light table.

Timing rule (TODO.md): block_until_ready is unreliable on the axon
platform — sync by copying a small dependent slice to host.
"""

import pathlib
import time
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from ezkl_tpu.fieldmath import limbs
from ezkl_tpu.fieldmath.spec import bn254_fq, bn254_fr

FQ = bn254_fq()
FR = bn254_fr()


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf[..., :1]))


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def rand_fq(rng, shape):
    v = rng.integers(0, 1 << 16, size=(16,) + shape, dtype=np.uint64)
    v = v.astype(np.uint32)
    v[15] &= 0x1FFF
    return jnp.asarray(v)


def main():
    rng = np.random.default_rng(0)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20

    print(f"backend={jax.default_backend()} n=2^{int(np.log2(n))}", flush=True)

    # --- pallas mont_mul ---------------------------------------------------
    a = rand_fq(rng, (n,))
    b = rand_fq(rng, (n,))
    f = jax.jit(lambda a, b: limbs.mont_mul(FQ, a, b))
    dt = timeit(f, a, b)
    print(f"mont_mul(pallas wide): {n/dt/1e6:9.1f} Mmul/s   ({dt*1e3:.2f} ms)", flush=True)

    # --- field add ----------------------------------------------------------
    g = jax.jit(lambda a, b: limbs.add(FQ, a, b))
    dt = timeit(g, a, b)
    print(f"field add (XLA):       {n/dt/1e6:9.1f} Madd/s   ({dt*1e3:.2f} ms)", flush=True)

    # --- pallas point add ----------------------------------------------------
    from ezkl_tpu.fieldmath.curve import PointP
    from ezkl_tpu.kernels import pcurve
    p = PointP(rand_fq(rng, (n,)), rand_fq(rng, (n,)), rand_fq(rng, (n,)))
    q = PointP(rand_fq(rng, (n,)), rand_fq(rng, (n,)), rand_fq(rng, (n,)))
    h = jax.jit(pcurve.add)
    dt = timeit(h, p, q)
    print(f"point add (pallas):    {n/dt/1e6:9.2f} Madd/s   ({dt*1e3:.2f} ms)"
          f"  [= {12*n/dt/1e6:.0f} Mmul/s equiv]", flush=True)

    # --- scan-structured point adds (the MSM inner loop shape) --------------
    from ezkl_tpu.kernels import msm as msmmod
    m = n // 32
    pr = jax.tree.map(lambda x: x.reshape(16, m, 32), p)
    s = jax.jit(msmmod._seq_inclusive)
    dt = timeit(s, pr)
    print(f"scan point adds (32x{m}): {n/dt/1e6:7.2f} Madd/s   ({dt*1e3:.2f} ms)", flush=True)

    # --- argsort + gather (per-window prep) ----------------------------------
    d = jnp.asarray(rng.integers(0, 1 << 16, size=(n,), dtype=np.int64), jnp.uint32)
    srt = jax.jit(lambda d: jnp.argsort(d))
    dt = timeit(srt, d)
    print(f"argsort u32:           {n/dt/1e6:9.1f} Melem/s  ({dt*1e3:.2f} ms)", flush=True)
    order = srt(d)
    gat = jax.jit(lambda p, o: jax.tree.map(lambda a: jnp.take(a, o, axis=-1), p))
    dt = timeit(gat, p, order)
    print(f"gather 3x(16,N):       {n/dt/1e6:9.1f} Melem/s  ({dt*1e3:.2f} ms)", flush=True)

    # --- one full MSM for reference -----------------------------------------
    if "--msm" in sys.argv:
        sc = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint64).astype(np.uint32)
        sc[15] &= 0x03FF
        scj = jnp.asarray(sc)
        dt = timeit(lambda: msmmod.msm_jit(p, scj), iters=3, warmup=1)
        print(f"msm 2^{int(np.log2(n))}:             {n/dt/1e3:9.1f} kpts/s   ({dt*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
