"""Pallas TPU kernels for batched BN254 G1 point addition/doubling.

Why a kernel: the XLA-graph form of one complete point add is ~40k HLO ops
(12 fused limb multiplies); every `lax.scan` body that instantiates it costs
minutes of XLA compile time, and the MSM uses several such bodies. As a
`pallas_call` the add becomes ONE custom call in the enclosing graph —
Mosaic compiles the kernel body once per block shape in seconds — and all
limb intermediates provably live in VMEM/registers.

The kernel body reuses the limb-list math from `fieldmath.limbs` (pure
elementwise jnp on per-limb arrays, which is exactly what Mosaic wants) and
the RCB15 complete-addition schedule from `fieldmath.curve`.

Layout: coordinates are (16, B) u32 Montgomery limb arrays (same as
`curve.PointP`); the kernel grids over B in blocks of `_BLK` lanes shaped
(16, _BLK) in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fieldmath import limbs
from ..fieldmath.curve import PointP, B3
from ..fieldmath.spec import bn254_fq, NLIMBS

FQ = bn254_fq()
_BLK = 1024       # lanes per block for wide batches (8 sublane-tiles of 128)
_BLK_NARROW = 128  # block for narrow batches (padded up); keeps pad waste low


def _unstack_ref(ref):
    return [ref[i] for i in range(NLIMBS)]


def _mul(a, b):
    return limbs._mont_mul_l(FQ, a, b)


def _add(a, b):
    return limbs._add_l(FQ, a, b)


def _sub(a, b):
    return limbs._sub_l(FQ, a, b)


def _xb3(a):
    """Multiply by 3*b = 9 via doubling chain (9 = 8 + 1)."""
    t2 = _add(a, a)
    t4 = _add(t2, t2)
    t8 = _add(t4, t4)
    return _add(t8, a)


def _complete_add_l(X1, Y1, Z1, X2, Y2, Z2):
    """RCB15 algorithm 7 (a=0, b3=9) on limb lists."""
    t0 = _mul(X1, X2)
    t1 = _mul(Y1, Y2)
    t2 = _mul(Z1, Z2)
    t3 = _add(X1, Y1)
    t4 = _add(X2, Y2)
    t3 = _mul(t3, t4)
    t4 = _add(t0, t1)
    t3 = _sub(t3, t4)
    t4 = _add(Y1, Z1)
    X3 = _add(Y2, Z2)
    t4 = _mul(t4, X3)
    X3 = _add(t1, t2)
    t4 = _sub(t4, X3)
    X3 = _add(X1, Z1)
    Y3 = _add(X2, Z2)
    X3 = _mul(X3, Y3)
    Y3 = _add(t0, t2)
    Y3 = _sub(X3, Y3)
    X3 = _add(t0, t0)
    t0 = _add(X3, t0)
    t2 = _xb3(t2)
    Z3 = _add(t1, t2)
    t1 = _sub(t1, t2)
    Y3 = _xb3(Y3)
    X3 = _mul(t4, Y3)
    t2 = _mul(t3, t1)
    X3 = _sub(t2, X3)
    Y3 = _mul(Y3, t0)
    t1 = _mul(t1, Z3)
    Y3 = _add(t1, Y3)
    t0 = _mul(t0, t3)
    Z3 = _mul(Z3, t4)
    Z3 = _add(Z3, t0)
    return X3, Y3, Z3


def _dbl_l(X, Y, Z):
    """RCB15 algorithm 9 (a=0, b3=9) on limb lists."""
    t0 = _mul(Y, Y)
    Z3 = _add(t0, t0)
    Z3 = _add(Z3, Z3)
    Z3 = _add(Z3, Z3)
    t1 = _mul(Y, Z)
    t2 = _mul(Z, Z)
    t2 = _xb3(t2)
    X3 = _mul(t2, Z3)
    Y3 = _add(t0, t2)
    Z3 = _mul(t1, Z3)
    t1 = _add(t2, t2)
    t2 = _add(t1, t2)
    t0 = _sub(t0, t2)
    Y3 = _mul(t0, Y3)
    Y3 = _add(X3, Y3)
    t1 = _mul(X, Y)
    X3 = _mul(t0, t1)
    X3 = _add(X3, X3)
    return X3, Y3, Z3


def _add_kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
    X3, Y3, Z3 = _complete_add_l(
        _unstack_ref(x1), _unstack_ref(y1), _unstack_ref(z1),
        _unstack_ref(x2), _unstack_ref(y2), _unstack_ref(z2))
    for i in range(NLIMBS):
        ox[i] = X3[i]
        oy[i] = Y3[i]
        oz[i] = Z3[i]


def _dbl_kernel(x, y, z, ox, oy, oz):
    X3, Y3, Z3 = _dbl_l(_unstack_ref(x), _unstack_ref(y), _unstack_ref(z))
    for i in range(NLIMBS):
        ox[i] = X3[i]
        oy[i] = Y3[i]
        oz[i] = Z3[i]


# EXACTLY TWO block shapes — (16, 128) for narrow batches, (16, 1024) for
# wide — whatever the batch width: jax caches pallas kernel lowering per
# (kernel, block shapes), and tracing the ~15k-op limb kernel body costs
# ~30 s, so it must be paid a bounded number of times per process instead
# of once per distinct width (the round-2 bench timed out on exactly that).
# Narrow batches keep a small block so scalar-ish ops (Horner combine,
# fold tails) don't burn 1024 lanes of VPU per step.


def _blk_for(n: int) -> int:
    return _BLK if n >= _BLK else _BLK_NARROW


@functools.lru_cache(maxsize=64)
def _add_call(n: int):
    blk = _blk_for(n)
    assert n % blk == 0
    spec = pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _add_kernel,
        grid=(n // blk,),
        in_specs=[spec] * 6,
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32)
                        for _ in range(3)),
    )


@functools.lru_cache(maxsize=64)
def _dbl_call(n: int):
    blk = _blk_for(n)
    assert n % blk == 0
    spec = pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _dbl_kernel,
        grid=(n // blk,),
        in_specs=[spec] * 3,
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32)
                        for _ in range(3)),
    )


def _flatten_pad(arrs, n):
    """Flatten trailing batch dims to one axis; zero-pad to a block multiple
    (128-lane blocks below 1024 lanes, 1024-lane blocks above)."""
    blk = _blk_for(n)
    target = max(blk, -(-n // blk) * blk)
    out = []
    for a in arrs:
        a = a.reshape(NLIMBS, n)
        if target != n:
            z16 = jnp.zeros((NLIMBS, target - n), jnp.uint32)
            a = jnp.concatenate([a, z16], axis=-1)
        out.append(a)
    return out, target


def add(p: PointP, q: PointP) -> PointP:
    """Complete projective add via the pallas kernel (TPU path).

    Batch shapes must match (broadcast on the caller side); any batch rank,
    any width — inputs are padded to a multiple of the block (garbage lanes
    are computed and sliced away; compile-time beats the nil runtime waste).
    """
    bs = p.x.shape[1:]
    assert bs == q.x.shape[1:], f"batch mismatch {bs} vs {q.x.shape[1:]}"
    n = 1
    for d in bs:
        n *= d
    ins, t = _flatten_pad([p.x, p.y, p.z, q.x, q.y, q.z], n)
    ox, oy, oz = _add_call(t)(*ins)
    shape = (NLIMBS,) + bs
    return PointP(ox[:, :n].reshape(shape), oy[:, :n].reshape(shape),
                  oz[:, :n].reshape(shape))


def dbl(p: PointP) -> PointP:
    bs = p.x.shape[1:]
    n = 1
    for d in bs:
        n *= d
    ins, t = _flatten_pad([p.x, p.y, p.z], n)
    ox, oy, oz = _dbl_call(t)(*ins)
    shape = (NLIMBS,) + bs
    return PointP(ox[:, :n].reshape(shape), oy[:, :n].reshape(shape),
                  oz[:, :n].reshape(shape))
