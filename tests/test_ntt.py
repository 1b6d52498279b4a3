"""NTT kernel vs O(n^2) bigint DFT oracle."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from ezkl_tpu.fieldmath import limbs
from ezkl_tpu.fieldmath.spec import bn254_fr
from ezkl_tpu.kernels import ntt as nttmod

FR = bn254_fr()
rng = random.Random(1234)


def rand_fr(n):
    return [rng.randrange(FR.modulus) for _ in range(n)]


@pytest.mark.parametrize("k", [0, 1, 3, 6])
def test_forward_matches_host(k):
    n = 1 << k
    vals = rand_fr(n)
    dev = jnp.asarray(limbs.encode(FR, vals))
    out = nttmod.ntt_jit(FR, dev)
    got = list(limbs.decode(FR, out))
    want = nttmod.host_ntt(FR, vals)
    assert got == want


@pytest.mark.parametrize("k", [1, 4, 7])
def test_roundtrip(k):
    n = 1 << k
    vals = rand_fr(n)
    dev = jnp.asarray(limbs.encode(FR, vals))
    back = nttmod.intt_jit(FR, nttmod.ntt_jit(FR, dev))
    assert list(limbs.decode(FR, back)) == vals


@pytest.mark.parametrize("k", [1, 5])
def test_coset_roundtrip_and_values(k):
    n = 1 << k
    vals = rand_fr(n)
    dev = jnp.asarray(limbs.encode(FR, vals))
    ev = nttmod.coset_ntt_jit(FR, dev)
    # check a few evaluations P(g * w^i) directly
    p = FR.modulus
    w = nttmod.root_of_unity(FR, k)
    g = FR.generator
    got = list(limbs.decode(FR, ev))
    for i in [0, 1, n - 1]:
        x = (g * pow(w, i, p)) % p
        want = 0
        for c in reversed(vals):
            want = (want * x + c) % p
        assert got[i] == want
    back = nttmod.coset_intt_jit(FR, ev)
    assert list(limbs.decode(FR, back)) == vals


def test_ntt_is_polynomial_eval():
    # evals[i] == P(w^i) on the plain domain
    k, n = 3, 8
    vals = rand_fr(n)
    dev = jnp.asarray(limbs.encode(FR, vals))
    got = list(limbs.decode(FR, nttmod.ntt_jit(FR, dev)))
    p = FR.modulus
    w = nttmod.root_of_unity(FR, k)
    for i in range(n):
        x = pow(w, i, p)
        want = 0
        for c in reversed(vals):
            want = (want * x + c) % p
        assert got[i] == want
