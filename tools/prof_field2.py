#!/usr/bin/env python
"""Honest microbench: chain K dependent ops inside one jit (lax.scan) and
divide. Avoids async-dispatch artifacts and measures steady-state HBM+VPU."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ezkl_tpu.fieldmath import limbs, curve
from ezkl_tpu.fieldmath.spec import bn254_fq, NLIMBS

FQ = bn254_fq()


def rand_fq(rng, shape):
    v = rng.integers(0, 1 << 16, size=(NLIMBS,) + shape, dtype=np.int64).astype(np.uint32)
    v[NLIMBS - 1] &= 0x1FFF
    return jnp.asarray(v)


def chain(opname, fn, x0, extra, K=64, iters=3):
    @jax.jit
    def run(x, e):
        def body(acc, _):
            return fn(acc, e), None
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    out = jax.block_until_ready(run(x0, extra))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(run(x0, extra))
    dt = (time.perf_counter() - t0) / iters / K
    B = int(np.prod(x0.shape[1:])) if hasattr(x0, "shape") else int(np.prod(x0.x.shape[1:]))
    print(f"{opname:18s}: {B/dt/1e6:10.2f} Melem/s   ({dt*1e6:9.2f} us/step @ B={B})")
    return dt


def main():
    rng = np.random.default_rng(0)
    for logB in (17, 20):
        B = 1 << logB
        print(f"--- width 2^{logB} ---")
        a = rand_fq(rng, (B,))
        b = rand_fq(rng, (B,))
        chain("mont_mul", lambda x, e: limbs.mont_mul(FQ, x, e), a, b)
        chain("field add", lambda x, e: limbs.add(FQ, x, e), a, b)
        if logB <= 17:
            P = curve.PointP(a, b, rand_fq(rng, (B,)))
            Q = curve.PointP(rand_fq(rng, (B,)), rand_fq(rng, (B,)), rand_fq(rng, (B,)))
            chain("curve add", lambda x, e: curve.add(x, e), P, Q, K=16)
            chain("curve add_mixed", lambda x, e: curve.add_mixed(x, e[0], e[1]), P, (Q.x, Q.y), K=16)


if __name__ == "__main__":
    main()
