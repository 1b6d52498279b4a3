"""Pallas TPU kernel for the fused NTT butterfly.

One radix-2 stage computes t = b*w; (a+t, a-t). As three separate wide ops
(the XLA path after the mont_mul-pallas dispatch) that is 3 HBM round
trips per stage; fused here it is one kernel, one pass — and one more
bounded-shape kernel in the per-process lowering budget (see
`fieldmath/limbs.py` pallas notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fieldmath import limbs
from ..fieldmath.spec import FieldSpec, NLIMBS

_BLK = 1024
_BLK_NARROW = 128


def _blk_for(n: int) -> int:
    return _BLK if n >= _BLK else _BLK_NARROW


@functools.lru_cache(maxsize=None)
def _bfly_call(spec: FieldSpec, n: int):
    blk = _blk_for(n)
    assert n % blk == 0

    def kern(a_ref, b_ref, w_ref, o1_ref, o2_ref):
        al = [a_ref[i] for i in range(NLIMBS)]
        bl = [b_ref[i] for i in range(NLIMBS)]
        wl = [w_ref[i] for i in range(NLIMBS)]
        tl = limbs._mont_mul_l(spec, bl, wl)
        hi = limbs._add_l(spec, al, tl)
        lo = limbs._sub_l(spec, al, tl)
        for i in range(NLIMBS):
            o1_ref[i] = hi[i]
            o2_ref[i] = lo[i]

    spec_b = pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    return limbs.pallas_call(
        kern, grid=(n // blk,), in_specs=[spec_b] * 3,
        out_specs=(spec_b, spec_b),
        out_shape=tuple(jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32)
                        for _ in range(2)))


def bfly(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray):
    """(a + b*w, a - b*w) elementwise over (16, *batch) Montgomery limbs;
    all three inputs the same shape (broadcast on the caller side)."""
    shape = a.shape
    n = 1
    for d in shape[1:]:
        n *= d
    blk = _blk_for(n)
    target = max(blk, -(-n // blk) * blk)
    flat = []
    for t in (a, b, w):
        t = t.reshape(NLIMBS, n)
        if target != n:
            z = jnp.zeros((NLIMBS, target - n), jnp.uint32)
            t = jnp.concatenate([t, z], axis=-1)
        flat.append(t)
    hi, lo = _bfly_call(spec, target)(*flat)
    return hi[:, :n].reshape(shape), lo[:, :n].reshape(shape)
