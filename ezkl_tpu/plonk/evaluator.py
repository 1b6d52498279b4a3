"""Batched expression evaluation over a whole domain.

Gate/lookup expressions evaluate with vectorized limb ops over all rows at
once — the TPU replacement for halo2's per-row `evaluate` closures (the
fork's quotient evaluation; SURVEY.md §3.4 step 5).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..fieldmath import limbs
from ..fieldmath.spec import bn254_fr, NLIMBS
from .cs import (
    Challenge, Constant, Expr, Product, Scaled, Sum, Var,
    FIXED, ADVICE, INSTANCE,
)

FR = bn254_fr()


@dataclasses.dataclass
class EvalCtx:
    """Column evaluations over some domain (lagrange or extended coset).

    columns: dict kind -> (num_cols, 16, m) Montgomery device arrays.
    rot_step: index shift per unit rotation (1 on H; n_ext/n on the
    extended coset).
    challenges: dict index -> (16,) Montgomery device scalar.
    """

    columns: dict
    rot_step: int
    challenges: dict

    def query(self, kind: str, index: int, rotation: int) -> jnp.ndarray:
        v = self.columns[kind][index]
        if rotation:
            v = jnp.roll(v, -rotation * self.rot_step, axis=-1)
        return v

    @property
    def m(self) -> int:
        return next(iter(self.columns.values())).shape[-1]


@dataclasses.dataclass
class ChunkCtx:
    """EvalCtx over one row chunk [start, start+size) of a length-n domain.

    Rotations become wraparound gathers into the full columns, so gate
    evaluation memory is O(size), independent of n — the MockProver path
    for k >= 20 domains (whole-domain jits ask for 100+ GB there).
    `start` may be a traced scalar: one compile serves every chunk.
    """

    columns: dict
    rot_step: int
    challenges: dict
    start: object
    size: int
    n: int

    def query(self, kind: str, index: int, rotation: int) -> jnp.ndarray:
        v = self.columns[kind][index]
        idx = (self.start + jnp.arange(self.size)
               + rotation * self.rot_step) % self.n
        return jnp.take(v, idx, axis=-1)

    @property
    def m(self) -> int:
        return self.size


def evaluate(expr: Expr, ctx: EvalCtx) -> jnp.ndarray:
    """-> (16, m) Montgomery evals of the expression over the domain."""
    if isinstance(expr, Constant):
        c = limbs.bcast_const(FR, expr.value, 1)
        return jnp.broadcast_to(c, (NLIMBS, ctx.m))
    if isinstance(expr, Var):
        q = expr.query
        return ctx.query(q.column.kind, q.column.index, q.rotation)
    if isinstance(expr, Challenge):
        c = ctx.challenges[expr.index]
        return jnp.broadcast_to(c[:, None], (NLIMBS, ctx.m))
    if isinstance(expr, Sum):
        return limbs.add(FR, evaluate(expr.a, ctx), evaluate(expr.b, ctx))
    if isinstance(expr, Product):
        return limbs.mont_mul(FR, evaluate(expr.a, ctx), evaluate(expr.b, ctx))
    if isinstance(expr, Scaled):
        a = evaluate(expr.a, ctx)
        k = expr.k % FR.modulus
        if k == FR.modulus - 1:
            return limbs.neg(FR, a)
        c = limbs.bcast_const(FR, k, 1)
        return limbs.mont_mul(FR, a, jnp.broadcast_to(c, a.shape))
    raise TypeError(f"unknown expr node {type(expr)}")


def evaluate_at_point(expr: Expr, query_values: dict, challenges: dict) -> int:
    """Host bigint evaluation given query values (the verifier's path).

    query_values: dict (kind, index, rotation) -> int.
    """
    p = FR.modulus
    if isinstance(expr, Constant):
        return expr.value % p
    if isinstance(expr, Var):
        q = expr.query
        return query_values[(q.column.kind, q.column.index, q.rotation)] % p
    if isinstance(expr, Challenge):
        return challenges[expr.index] % p
    if isinstance(expr, Sum):
        return (evaluate_at_point(expr.a, query_values, challenges)
                + evaluate_at_point(expr.b, query_values, challenges)) % p
    if isinstance(expr, Product):
        return (evaluate_at_point(expr.a, query_values, challenges)
                * evaluate_at_point(expr.b, query_values, challenges)) % p
    if isinstance(expr, Scaled):
        return (evaluate_at_point(expr.a, query_values, challenges) * expr.k) % p
    raise TypeError(f"unknown expr node {type(expr)}")
