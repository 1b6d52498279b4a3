"""Batched BN254 G1 arithmetic for TPU.

Points are projective (X:Y:Z) triples of Fq limb arrays ((16,*batch) each,
Montgomery form). We use the *complete* addition/doubling formulas of
Renes-Costello-Batina 2015 for short-Weierstrass curves with a=0 — no
exceptional cases, hence fully branchless: exactly what a SIMD machine
wants. Identity is (0:1:0).

Replaces the reference's G1 arithmetic which lives in halo2curves + ICICLE
(SURVEY.md §2.1); consumed by the MSM kernel (`ezkl_tpu.kernels.msm`) the
way the halo2 fork's `commit_lagrange` consumes its CUDA MSM
(`/root/reference/src/circuit/modules/polycommit.rs:45-81`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs
from .spec import FieldSpec, bn254_fq, NLIMBS

B_COEFF = 3       # y^2 = x^3 + 3
B3 = 9            # 3*b, used by the complete formulas

# BN254 G1 generator
G1_X = 1
G1_Y = 2


class PointP(NamedTuple):
    """Projective point; each coord is a (16, *batch) uint32 limb array."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[1:]


def identity(batch_shape=()) -> PointP:
    fq = bn254_fq()
    return PointP(
        x=limbs.zeros(batch_shape),
        y=limbs.ones_mont(fq, batch_shape),
        z=limbs.zeros(batch_shape),
    )


def is_identity(p: PointP):
    return limbs.is_zero(p.z)


def select_point(mask, a: PointP, b: PointP) -> PointP:
    """mask: batch bool -> a where true else b."""
    return PointP(
        limbs.select(mask, a.x, b.x),
        limbs.select(mask, a.y, b.y),
        limbs.select(mask, a.z, b.z),
    )


def add(p: PointP, q: PointP) -> PointP:
    """Complete projective addition (RCB15 algorithm 7, a=0, b3=9)."""
    fq = bn254_fq()
    mul = lambda a, b: limbs.mont_mul(fq, a, b)
    fadd = lambda a, b: limbs.add(fq, a, b)
    fsub = lambda a, b: limbs.sub(fq, a, b)
    xb3 = lambda a: limbs.small_mul(fq, a, B3)

    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = fadd(X1, Y1)
    t4 = fadd(X2, Y2)
    t3 = mul(t3, t4)
    t4 = fadd(t0, t1)
    t3 = fsub(t3, t4)
    t4 = fadd(Y1, Z1)
    X3 = fadd(Y2, Z2)
    t4 = mul(t4, X3)
    X3 = fadd(t1, t2)
    t4 = fsub(t4, X3)
    X3 = fadd(X1, Z1)
    Y3 = fadd(X2, Z2)
    X3 = mul(X3, Y3)
    Y3 = fadd(t0, t2)
    Y3 = fsub(X3, Y3)
    X3 = fadd(t0, t0)
    t0 = fadd(X3, t0)
    t2 = xb3(t2)
    Z3 = fadd(t1, t2)
    t1 = fsub(t1, t2)
    Y3 = xb3(Y3)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = fsub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = fadd(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = fadd(Z3, t0)
    return PointP(X3, Y3, Z3)


def add_mixed(p: PointP, qx, qy, q_is_identity=None) -> PointP:
    """p + (qx, qy, 1) via RCB15 algorithm 8 (11 muls). If `q_is_identity`
    (batch bool) is given, those lanes return p unchanged."""
    fq = bn254_fq()
    mul = lambda a, b: limbs.mont_mul(fq, a, b)
    fadd = lambda a, b: limbs.add(fq, a, b)
    fsub = lambda a, b: limbs.sub(fq, a, b)
    xb3 = lambda a: limbs.small_mul(fq, a, B3)

    X1, Y1, Z1 = p
    X2, Y2 = qx, qy
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = fadd(X2, Y2)
    t4 = fadd(X1, Y1)
    t3 = mul(t3, t4)
    t4 = fadd(t0, t1)
    t3 = fsub(t3, t4)
    t4 = mul(Y2, Z1)
    t4 = fadd(t4, Y1)
    Y3 = mul(X2, Z1)
    Y3 = fadd(Y3, X1)
    X3 = fadd(t0, t0)
    t0 = fadd(X3, t0)
    t2 = xb3(Z1)
    Z3 = fadd(t1, t2)
    t1 = fsub(t1, t2)
    Y3 = xb3(Y3)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = fsub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = fadd(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = fadd(Z3, t0)
    out = PointP(X3, Y3, Z3)
    if q_is_identity is not None:
        out = select_point(q_is_identity, p, out)
    return out


def dbl(p: PointP) -> PointP:
    """Complete projective doubling (RCB15 algorithm 9, a=0, b3=9)."""
    fq = bn254_fq()
    mul = lambda a, b: limbs.mont_mul(fq, a, b)
    fadd = lambda a, b: limbs.add(fq, a, b)
    fsub = lambda a, b: limbs.sub(fq, a, b)
    xb3 = lambda a: limbs.small_mul(fq, a, B3)

    X, Y, Z = p
    t0 = mul(Y, Y)
    Z3 = fadd(t0, t0)
    Z3 = fadd(Z3, Z3)
    Z3 = fadd(Z3, Z3)
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    t2 = xb3(t2)
    X3 = mul(t2, Z3)
    Y3 = fadd(t0, t2)
    Z3 = mul(t1, Z3)
    t1 = fadd(t2, t2)
    t2 = fadd(t1, t2)
    t0 = fsub(t0, t2)
    Y3 = mul(t0, Y3)
    Y3 = fadd(X3, Y3)
    t1 = mul(X, Y)
    X3 = mul(t0, t1)
    X3 = fadd(X3, X3)
    return PointP(X3, Y3, Z3)


def to_affine(p: PointP):
    """Batch-normalize to affine (x, y); identity lanes -> (0, 0)."""
    fq = bn254_fq()
    inf = is_identity(p)
    zinv = limbs.inv(fq, p.z)  # inv(0) == 0, so identity maps to (0,0)
    return limbs.mont_mul(fq, p.x, zinv), limbs.mont_mul(fq, p.y, zinv)


@jax.jit
def _to_affine_jit(p: PointP):
    return to_affine(p)


def from_affine(x, y, is_inf=None) -> PointP:
    fq = bn254_fq()
    z = limbs.ones_mont(fq, x.shape[1:])
    pt = PointP(x, y, z)
    if is_inf is not None:
        pt = select_point(is_inf, identity(x.shape[1:]), pt)
    return pt


def scalar_mul(p: PointP, scalar_bits) -> PointP:
    """Double-and-add over MSB-first scalar bits.

    scalar_bits: (256, *batch) uint32 of 0/1 (Fr scalars, NOT Montgomery).
    """

    def body(acc, bits):
        acc = dbl(acc)
        added = add(acc, p)
        acc = select_point(bits.astype(jnp.bool_), added, acc)
        return acc, None

    acc0 = identity(p.batch_shape)
    out, _ = jax.lax.scan(body, acc0, scalar_bits)
    return out


def scalars_to_bits(scalars_raw) -> jnp.ndarray:
    """(16, *batch) NON-Montgomery limb scalars -> (256, *batch) bits MSB-first."""
    parts = []
    for limb in range(NLIMBS - 1, -1, -1):
        for bit in range(15, -1, -1):
            parts.append((scalars_raw[limb] >> bit) & jnp.uint32(1))
    return jnp.stack(parts, axis=0)


def generator(batch_shape=()) -> PointP:
    fq = bn254_fq()
    gx = limbs.bcast_const(fq, G1_X, len(tuple(batch_shape)))
    gy = limbs.bcast_const(fq, G1_Y, len(tuple(batch_shape)))
    shape = (NLIMBS,) + tuple(batch_shape)
    return from_affine(jnp.broadcast_to(gx, shape), jnp.broadcast_to(gy, shape))


# ---------------------------------------------------------------------------
# host-side encode/decode
# ---------------------------------------------------------------------------

def encode_points(points) -> PointP:
    """List of (x, y) int tuples or None (identity) -> batched PointP."""
    fq = bn254_fq()
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append(1)
    return PointP(
        jnp.asarray(limbs.encode(fq, xs)),
        jnp.asarray(limbs.encode(fq, ys)),
        jnp.asarray(limbs.encode(fq, zs)),
    )


def decode_points(p: PointP):
    """Batched PointP -> list of (x, y) int tuples or None for identity."""
    fq = bn254_fq()
    ax, ay = _to_affine_jit(p)
    inf = np.asarray(is_identity(p)).reshape(-1)
    xs = limbs.decode(fq, ax).reshape(-1)
    ys = limbs.decode(fq, ay).reshape(-1)
    return [None if inf[i] else (int(xs[i]), int(ys[i])) for i in range(len(xs))]
