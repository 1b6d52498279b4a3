"""Poseidon permutation/hash: device kernel vs host bigint; constants sanity."""

import random

import jax
import jax.numpy as jnp

from ezkl_tpu.fieldmath import limbs
from ezkl_tpu.fieldmath.spec import bn254_fr
from ezkl_tpu.kernels import poseidon as pos

FR = bn254_fr()
rng = random.Random(99)


def test_constants_sane():
    rc, mds = pos.generate_parameters()
    assert len(rc) == 64 and all(len(r) == 2 for r in rc)
    p = FR.modulus
    # MDS must be invertible (det != 0)
    det = (mds[0][0] * mds[1][1] - mds[0][1] * mds[1][0]) % p
    assert det != 0
    assert all(0 < c < p for row in rc for c in row)


def test_device_permute_matches_host():
    states = [[rng.randrange(FR.modulus), rng.randrange(FR.modulus)] for _ in range(4)]
    # (16, 2, 4): limb, state word, batch
    cols = [[s[i] for s in states] for i in range(2)]
    dev = jnp.asarray(limbs.encode(FR, cols))
    out = jax.jit(lambda s: pos.permute(FR, s))(dev)
    got0 = list(limbs.decode(FR, out[:, 0]))
    got1 = list(limbs.decode(FR, out[:, 1]))
    for i, st in enumerate(states):
        want = pos.host_permute(st)
        assert [got0[i], got1[i]] == want


def test_device_hash_matches_host():
    L, B = 3, 5
    msgs = [[rng.randrange(FR.modulus) for _ in range(L)] for _ in range(B)]
    # inputs (16, L, B)
    cols = [[msgs[b][i] for b in range(B)] for i in range(L)]
    dev = jnp.asarray(limbs.encode(FR, cols))
    out = jax.jit(lambda x: pos.hash_fixed_len(FR, x))(dev)
    got = list(limbs.decode(FR, out))
    for b in range(B):
        assert got[b] == pos.host_hash(msgs[b])


def test_grain_generator_other_width():
    # non-standard config exercises the Grain path; constants in range, MDS invertible
    rc, mds = pos.generate_parameters(t=3, r_f=8, r_p=57)
    p = FR.modulus
    assert len(rc) == 65 and len(rc[0]) == 3
    assert all(0 <= c < p for row in rc for c in row)
