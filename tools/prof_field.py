#!/usr/bin/env python
"""Microbenchmarks for the limb engine on the real TPU chip.

Measures element/s for: raw u32 mul, f32 mul, int8 MXU matmul,
mont_mul, curve.add, curve.add_mixed, batch_inv — to locate the MSM
bottleneck and compute a speed-of-light table.
"""
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


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def rand_fq(rng, shape):
    v = rng.integers(0, 1 << 16, size=(NLIMBS,) + shape, dtype=np.int64).astype(np.uint32)
    v[NLIMBS - 1] &= 0x1FFF
    return jnp.asarray(v)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    B = 1 << 20

    a = rand_fq(rng, (B,))
    b = rand_fq(rng, (B,))

    # raw u32 elementwise multiply (same footprint as one limb-product slice)
    u1 = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.int64).astype(np.uint32))
    u2 = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.int64).astype(np.uint32))
    f = jax.jit(lambda x, y: x * y)
    dt = timeit(f, u1, u2)
    print(f"u32 mul        : {16*B/dt/1e9:8.2f} Gop/s  ({dt*1e3:.3f} ms / {16*B:.0f} elems)")

    f1 = u1.astype(jnp.float32)
    f2 = u2.astype(jnp.float32)
    f = jax.jit(lambda x, y: x * y)
    dt = timeit(f, f1, f2)
    print(f"f32 mul        : {16*B/dt/1e9:8.2f} Gop/s")

    # u32 mul with 16-bit values cast to int16 path?
    i1 = u1.astype(jnp.int32)
    i2 = u2.astype(jnp.int32)
    f = jax.jit(lambda x, y: x * y)
    dt = timeit(f, i1, i2)
    print(f"s32 mul        : {16*B/dt/1e9:8.2f} Gop/s")

    # int8 MXU matmul throughput
    M = 4096
    m1 = jnp.asarray(rng.integers(-127, 127, size=(M, M), dtype=np.int8))
    m2 = jnp.asarray(rng.integers(-127, 127, size=(M, M), dtype=np.int8))
    f = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    dt = timeit(f, m1, m2)
    print(f"int8 matmul    : {2*M**3/dt/1e12:8.2f} Top/s")

    # bf16 matmul
    bm1 = m1.astype(jnp.bfloat16)
    bm2 = m2.astype(jnp.bfloat16)
    f = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    dt = timeit(f, bm1, bm2)
    print(f"bf16 matmul    : {2*M**3/dt/1e12:8.2f} Tflop/s")

    # mont_mul
    f = jax.jit(lambda x, y: limbs.mont_mul(FQ, x, y))
    dt = timeit(f, a, b)
    print(f"mont_mul       : {B/dt/1e6:8.2f} Melem/s  ({dt*1e3:.3f} ms @2^20)")

    # field add
    f = jax.jit(lambda x, y: limbs.add(FQ, x, y))
    dt = timeit(f, a, b)
    print(f"field add      : {B/dt/1e6:8.2f} Melem/s")

    # curve add (complete projective, 12 mul)
    P = curve.PointP(a, b, rand_fq(rng, (B,)))
    Q = curve.PointP(rand_fq(rng, (B,)), rand_fq(rng, (B,)), rand_fq(rng, (B,)))
    f = jax.jit(curve.add)
    dt = timeit(f, P, Q)
    print(f"curve add      : {B/dt/1e6:8.2f} Madd/s   ({dt*1e3:.3f} ms @2^20)")

    f = jax.jit(curve.add_mixed)
    dt = timeit(f, P, Q.x, Q.y)
    print(f"curve add_mixed: {B/dt/1e6:8.2f} Madd/s")

    # batch_inv
    f = jax.jit(lambda x: limbs.batch_inv(FQ, x))
    dt = timeit(f, a, iters=3)
    print(f"batch_inv      : {B/dt/1e6:8.2f} Melem/s  ({dt*1e3:.3f} ms @2^20)")


if __name__ == "__main__":
    main()
