#!/usr/bin/env python
"""Prototype: fusion-friendly mont_mul via unstacked limb lists.

Hypothesis: the shear/pad implementation defeats XLA fusion (measured 6.1
Melem/s at 2^20, ~15 GB HBM traffic per op). Computing the 31 product
columns as explicit elementwise sums over (B,) arrays should fuse into a
single kernel bounded by ~192 B/elem of HBM traffic.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ezkl_tpu.fieldmath import limbs
from ezkl_tpu.fieldmath.spec import bn254_fq, NLIMBS, LIMB_BITS, LIMB_MASK, int_to_limbs

FQ = bn254_fq()
_U32 = jnp.uint32


def _u(x):
    return _U32(x)


def unstack(a):
    return [a[i] for i in range(a.shape[0])]


# ---------- unstacked Kogge-Stone normalize ----------

def ks_carry_l(g, p):
    """List-form Kogge-Stone: g, p lists of K (B,) u32 in {0,1}."""
    K = len(g)
    c = list(g)
    pp = list(p)
    d = 1
    while d < K:
        c = [c[k] | (pp[k] & c[k - d]) if k >= d else c[k] for k in range(K)]
        pp = [pp[k] & pp[k - d] if k >= d else jnp.zeros_like(pp[k]) for k in range(K)]
        d *= 2
    return c


def normalize_l(cols, bound_bits):
    """cols: list of K (B,) u32 with values < 2^bound_bits -> (list of K
    16-bit limbs, carry_out)."""
    v = list(cols)
    K = len(v)
    bound = (1 << bound_bits) - 1
    while bound > (1 << LIMB_BITS):
        lo = [x & _u(LIMB_MASK) for x in v]
        hi = [x >> LIMB_BITS for x in v]
        v = [lo[k] + (hi[k - 1] if k >= 1 else 0) for k in range(K)]
        bound = LIMB_MASK + (bound >> LIMB_BITS)
    g = [(x >> LIMB_BITS).astype(_U32) for x in v]
    p = [(x == _u(LIMB_MASK)).astype(_U32) for x in v]
    c = ks_carry_l(g, p)
    out = [(v[k] + (c[k - 1] if k >= 1 else 0)) & _u(LIMB_MASK) for k in range(K)]
    return out, c[-1]


def mul_columns_l(a, b):
    """a, b: lists of 16 (B,) u32 (16-bit values) -> 32 columns < 2^21."""
    K = NLIMBS
    lo_cols = [None] * (2 * K)
    hi_cols = [None] * (2 * K)
    for i in range(K):
        for j in range(K):
            p = a[i] * b[j]
            plo = p & _u(LIMB_MASK)
            phi = p >> LIMB_BITS
            k = i + j
            lo_cols[k] = plo if lo_cols[k] is None else lo_cols[k] + plo
            hi_cols[k + 1] = phi if hi_cols[k + 1] is None else hi_cols[k + 1] + phi
    z = jnp.zeros_like(a[0])
    return [
        (lo_cols[k] if lo_cols[k] is not None else z)
        + (hi_cols[k] if hi_cols[k] is not None else z)
        for k in range(2 * K)
    ]


def mont_mul_l(spec, a, b):
    """Unstacked Montgomery multiply: a, b lists of 16 (B,) u32."""
    t_cols = mul_columns_l(a, b)
    t_lo, _ = normalize_l(t_cols[:NLIMBS], 21)
    np_limbs = int_to_limbs(pow(-spec.modulus, -1, 1 << (LIMB_BITS * NLIMBS))
                            % (1 << (LIMB_BITS * NLIMBS)))
    npl = [int(x) for x in np_limbs]
    m_cols = mul_columns_const(t_lo, npl)
    m, _ = normalize_l(m_cols[:NLIMBS], 21)
    pl = [int(x) for x in spec.mod_limbs]
    mn_cols = mul_columns_const(m, pl)
    s_cols = [t_cols[k] + mn_cols[k] for k in range(2 * NLIMBS)]
    s, top = normalize_l(s_cols, 22)
    res = s[NLIMBS:]
    return cond_sub_mod_l(spec, res)


def mul_columns_const(a, bconst):
    """a: list of 16 (B,) arrays; bconst: list of 16 python-int scalars."""
    K = NLIMBS
    lo_cols = [None] * (2 * K)
    hi_cols = [None] * (2 * K)
    for i in range(K):
        for j in range(K):
            if int(bconst[j]) == 0:
                continue
            p = a[i] * bconst[j]
            plo = p & _u(LIMB_MASK)
            phi = p >> LIMB_BITS
            k = i + j
            lo_cols[k] = plo if lo_cols[k] is None else lo_cols[k] + plo
            hi_cols[k + 1] = phi if hi_cols[k + 1] is None else hi_cols[k + 1] + phi
    z = jnp.zeros_like(a[0])
    return [
        (lo_cols[k] if lo_cols[k] is not None else z)
        + (hi_cols[k] if hi_cols[k] is not None else z)
        for k in range(2 * K)
    ]


def raw_sub_l(a, b):
    g = [(a[k] < b[k]).astype(_U32) for k in range(len(a))]
    p = [(a[k] == b[k]).astype(_U32) for k in range(len(a))]
    bor = ks_carry_l(g, p)
    out = [(a[k] + _u(1 << LIMB_BITS) - b[k] - (bor[k - 1] if k >= 1 else 0))
           & _u(LIMB_MASK) for k in range(len(a))]
    return out, bor[-1]


def cond_sub_mod_l(spec, a):
    pl = [np.uint32(int(x)) for x in spec.mod_limbs]
    plb = [jnp.broadcast_to(x, a[0].shape) for x in pl]
    d, borrow = raw_sub_l(a, plb)
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, a[k], d[k]) for k in range(len(a))]


def mont_mul_fused(spec, a, b):
    """(16, B) stacked API, unstacked internals."""
    al, bl = unstack(a), unstack(b)
    out = mont_mul_l(spec, al, bl)
    return jnp.stack(out, axis=0)


def rand_fq_np(rng, B):
    v = rng.integers(0, 1 << 16, size=(NLIMBS, B), dtype=np.int64).astype(np.uint32)
    v[NLIMBS - 1] &= 0x1FFF
    return v


def main():
    rng = np.random.default_rng(0)
    # correctness vs old
    B = 256
    a = rand_fq_np(rng, B)
    b = rand_fq_np(rng, B)
    old = np.asarray(jax.jit(lambda x, y: limbs.mont_mul(FQ, x, y))(a, b))
    new = np.asarray(jax.jit(lambda x, y: mont_mul_fused(FQ, x, y))(a, b))
    assert np.array_equal(old, new), "mismatch!"
    print("correctness OK")

    # throughput at 2^20: chain K dependent muls, force readback
    B = 1 << 20
    for K in (8, 32):
        @jax.jit
        def chain(x, e):
            def body(acc, _):
                return mont_mul_fused(FQ, acc, e), None
            out, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(out, dtype=jnp.uint32)

        args = [(jnp.asarray(rand_fq_np(rng, B)), jnp.asarray(rand_fq_np(rng, B)))
                for _ in range(3)]
        int(chain(*args[0]))
        t0 = time.perf_counter()
        for i in range(1, 3):
            int(chain(*args[i]))
        dt = (time.perf_counter() - t0) / 2 / K
        print(f"fused mont_mul chain K={K}: {dt*1e6:9.2f} us/op @2^20 -> {B/dt/1e6:9.1f} Melem/s")


if __name__ == "__main__":
    main()
