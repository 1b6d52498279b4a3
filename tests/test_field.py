"""Unit tests for the vectorized BN254 limb engine vs Python bigint ground truth.

Analog of the reference's halo2curves field test coverage (SURVEY.md §4 tier 1).
"""

import random

import numpy as np
import pytest

from ezkl_tpu.fieldmath import bn254_fq, bn254_fr, limbs


SPECS = [bn254_fr(), bn254_fq()]


def rand_elems(spec, n, seed=0):
    rng = random.Random(seed)
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    # sprinkle edge cases
    vals[:4] = [0, 1, spec.modulus - 1, spec.modulus - 2]
    return vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_encode_decode_roundtrip(spec):
    vals = rand_elems(spec, 16, seed=1)
    enc = limbs.encode(spec, vals, mont=True)
    dec = limbs.decode(spec, enc, mont=True)
    assert [int(x) for x in dec] == vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    n = 64
    a = rand_elems(spec, n, seed=2)
    b = rand_elems(spec, n, seed=3)
    A = limbs.encode(spec, a)
    B = limbs.encode(spec, b)
    got_add = limbs.decode(spec, limbs.jitted(spec).add(A, B))
    got_sub = limbs.decode(spec, limbs.jitted(spec).sub(A, B))
    got_neg = limbs.decode(spec, limbs.jitted(spec).neg(A))
    for i in range(n):
        assert int(got_add[i]) == (a[i] + b[i]) % spec.modulus
        assert int(got_sub[i]) == (a[i] - b[i]) % spec.modulus
        assert int(got_neg[i]) == (-a[i]) % spec.modulus


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_mul(spec):
    n = 64
    a = rand_elems(spec, n, seed=4)
    b = rand_elems(spec, n, seed=5)
    A = limbs.encode(spec, a)
    B = limbs.encode(spec, b)
    got = limbs.decode(spec, limbs.jitted(spec).mont_mul(A, B))
    for i in range(n):
        assert int(got[i]) == (a[i] * b[i]) % spec.modulus, f"i={i}"


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_to_from_mont(spec):
    vals = rand_elems(spec, 8, seed=6)
    raw = limbs.encode(spec, vals, mont=False)
    m = limbs.jitted(spec).to_mont(raw)
    back = limbs.jitted(spec).from_mont(m)
    dec = limbs.decode(spec, back, mont=False)
    assert [int(x) for x in dec] == vals


def test_inv():
    spec = bn254_fr()
    vals = rand_elems(spec, 16, seed=7)
    A = limbs.encode(spec, vals)
    got = limbs.decode(spec, limbs.jitted(spec).inv(A))
    for i, v in enumerate(vals):
        expect = 0 if v == 0 else pow(v, -1, spec.modulus)
        assert int(got[i]) == expect


def test_batch_inv():
    spec = bn254_fr()
    vals = rand_elems(spec, 16, seed=8)
    A = limbs.encode(spec, vals)
    got = limbs.decode(spec, limbs.jitted(spec).batch_inv(A))
    for i, v in enumerate(vals):
        expect = 0 if v == 0 else pow(v, -1, spec.modulus)
        assert int(got[i]) == expect


def test_pow_static_and_powers():
    spec = bn254_fr()
    vals = rand_elems(spec, 8, seed=9)
    A = limbs.encode(spec, vals)
    e = 0xDEADBEEF12345
    got = limbs.decode(spec, limbs.jitted(spec).pow_static(A, e))
    for i, v in enumerate(vals):
        assert int(got[i]) == pow(v, e, spec.modulus)
    base = 7
    P = limbs.decode(spec, limbs.jitted(spec).powers(base, 13))
    for i in range(13):
        assert int(P[i]) == pow(base, i, spec.modulus)


def test_small_mul_and_misc():
    spec = bn254_fq()
    vals = rand_elems(spec, 8, seed=10)
    A = limbs.encode(spec, vals)
    for k in (0, 1, 2, 3, 9, 27):
        got = limbs.decode(spec, limbs.jitted(spec).small_mul(A, k))
        for i, v in enumerate(vals):
            assert int(got[i]) == (v * k) % spec.modulus
    z = limbs.is_zero(A)
    assert bool(np.asarray(z)[0]) is True  # vals[0] == 0
    assert bool(np.asarray(z)[1]) is False


def test_root_of_unity_constants():
    fr = bn254_fr()
    assert fr.two_adicity == 28
    w = fr.root_of_unity
    assert pow(w, 1 << 28, fr.modulus) == 1
    assert pow(w, 1 << 27, fr.modulus) != 1


def test_fused_and_stacked_cores_agree():
    """The compile-cheap stacked core (CPU default) and the fused limb-list
    core (TPU default) must be bit-exact on add/sub/mont_mul."""
    import os

    spec = bn254_fq()
    xs = rand_elems(spec, 16, seed=77)
    ys = rand_elems(spec, 16, seed=78)
    A, B = limbs.encode(spec, xs), limbs.encode(spec, ys)

    def run_all():
        import jax
        return [
            np.asarray(jax.jit(lambda a, b: limbs.add(spec, a, b))(A, B)),
            np.asarray(jax.jit(lambda a, b: limbs.sub(spec, a, b))(A, B)),
            np.asarray(jax.jit(lambda a, b: limbs.mont_mul(spec, a, b))(A, B)),
        ]

    os.environ["EZKL_TPU_FUSED_LIMBS"] = "0"
    try:
        stacked = run_all()
    finally:
        os.environ["EZKL_TPU_FUSED_LIMBS"] = "1"
    try:
        fused = run_all()
    finally:
        del os.environ["EZKL_TPU_FUSED_LIMBS"]
    for s, f in zip(stacked, fused):
        assert np.array_equal(s, f)
