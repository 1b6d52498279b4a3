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


def test_fourstep_matches_radix2(monkeypatch):
    """The four-step (Bailey) decomposition must equal the radix-2 path,
    including batched inputs and the inverse roundtrip (the TPU uses
    four-step for k >= 14; forced on here via its env knob)."""
    monkeypatch.setenv("EZKL_TPU_FOURSTEP", "1")
    k = 14
    n = 1 << k
    import numpy as np
    rng = np.random.default_rng(8)
    v = rng.integers(0, 1 << 16, size=(16, n), dtype=np.int64).astype(np.uint32)
    v[15] &= 0x03FF
    dev = jnp.asarray(v)
    four = np.asarray(nttmod._ntt_four_step(FR, dev, k, False))
    rad = np.asarray(nttmod._ntt_radix2(FR, dev, k, False))
    np.testing.assert_array_equal(four, rad)
    # batched (16, 2, n)
    dev2 = jnp.stack([dev, dev], axis=1)
    four2 = np.asarray(nttmod._ntt_four_step(FR, dev2, k, False))
    np.testing.assert_array_equal(four2[:, 0], rad)
    # inverse roundtrip through the dispatching entry point
    back = np.asarray(nttmod.ntt(FR, nttmod.ntt(FR, dev), inverse=True))
    np.testing.assert_array_equal(back, np.asarray(dev))
