"""G1 batched complete-formula ops vs Python bigint reference."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ezkl_tpu.fieldmath import bn254_fr, limbs, curve, hostcurve as hc


def host_points(n, seed=0):
    rng = random.Random(seed)
    pts = [hc.g1_mul(hc.G1, rng.randrange(1, hc.R)) for _ in range(n)]
    return pts


def test_add_batched():
    n = 8
    ps = host_points(n, seed=1)
    qs = host_points(n, seed=2)
    P = curve.encode_points(ps)
    Q = curve.encode_points(qs)
    got = curve.decode_points(jax.jit(curve.add)(P, Q))
    expect = [hc.g1_add(p, q) for p, q in zip(ps, qs)]
    assert got == expect


def test_add_special_cases():
    p = host_points(1, seed=3)[0]
    cases_p = [p, p, None, p, None]
    cases_q = [p, hc.g1_neg(p), p, None, None]
    P = curve.encode_points(cases_p)
    Q = curve.encode_points(cases_q)
    got = curve.decode_points(jax.jit(curve.add)(P, Q))
    expect = [hc.g1_add(a, b) for a, b in zip(cases_p, cases_q)]
    assert got == expect


def test_dbl():
    ps = host_points(4, seed=4) + [None]
    P = curve.encode_points(ps)
    got = curve.decode_points(jax.jit(curve.dbl)(P))
    expect = [hc.g1_add(p, p) for p in ps]
    assert got == expect


def test_add_mixed():
    n = 4
    ps = host_points(n, seed=5)
    qs = host_points(n, seed=6)
    P = curve.encode_points(ps)
    Q = curve.encode_points(qs)
    inf = jnp.zeros((n,), dtype=bool)
    got = curve.decode_points(jax.jit(curve.add_mixed)(P, Q.x, Q.y, inf))
    expect = [hc.g1_add(p, q) for p, q in zip(ps, qs)]
    assert got == expect
    # identity masking
    inf2 = jnp.asarray([True, False, True, False])
    got2 = curve.decode_points(jax.jit(curve.add_mixed)(P, Q.x, Q.y, inf2))
    expect2 = [ps[0], expect[1], ps[2], expect[3]]
    assert got2 == expect2


def test_scalar_mul():
    fr = bn254_fr()
    rng = random.Random(7)
    scalars = [0, 1, 2, rng.randrange(hc.R), rng.randrange(hc.R)]
    n = len(scalars)
    base = host_points(1, seed=8)[0]
    P = curve.encode_points([base] * n)
    sc = jnp.asarray(limbs.encode(fr, scalars, mont=False))
    bits = curve.scalars_to_bits(sc)
    got = curve.decode_points(jax.jit(curve.scalar_mul)(P, bits))
    expect = [hc.g1_mul(base, s) if s else None for s in scalars]
    assert got == expect


def test_generator_on_curve():
    g = curve.generator((2,))
    pts = curve.decode_points(g)
    assert pts == [hc.G1, hc.G1]
    assert hc.g1_is_on_curve(hc.G1)
