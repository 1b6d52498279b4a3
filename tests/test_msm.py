"""Pippenger MSM vs host bigint oracle."""

import random

import jax.numpy as jnp
import pytest

from ezkl_tpu.fieldmath import limbs, curve, hostcurve
from ezkl_tpu.fieldmath.spec import bn254_fr
from ezkl_tpu.kernels import msm as msmmod

FR = bn254_fr()
rng = random.Random(77)


def rand_points(n):
    """Random small multiples of G1 (host side)."""
    ks = [rng.randrange(1, 1 << 30) for _ in range(n)]
    return [hostcurve.g1_mul(hostcurve.G1, k) for k in ks]


def run_msm(points_host, scalars_host, c):
    import jax

    pts = curve.encode_points(points_host)
    sc = jnp.asarray(limbs.encode(FR, scalars_host, mont=False))
    out = msmmod.msm_jit(pts, sc, c=c, group=2)
    batched = jax.tree.map(lambda a: a[:, None], out)
    return curve.decode_points(batched)[0]


@pytest.mark.parametrize("n,c", [(8, 4), (32, 4)])
def test_msm_matches_host(n, c):
    pts = rand_points(n)
    scalars = [rng.randrange(FR.modulus) for _ in range(n)]
    got = run_msm(pts, scalars, c)
    want = hostcurve.g1_msm(pts, scalars)
    assert got == want


def test_msm_with_identity_and_zero_scalars():
    pts = rand_points(6) + [None, None]
    scalars = [rng.randrange(FR.modulus) for _ in range(5)] + [0, 3, 5]
    got = run_msm(pts, scalars, c=4)
    want = hostcurve.g1_msm(pts, scalars)
    assert got == want


def test_extract_digits():
    s = rng.randrange(FR.modulus)
    sc = jnp.asarray(limbs.encode(FR, [s], mont=False))
    for c in (4, 7, 13, 16):
        d = msmmod.extract_digits(sc, c)
        recon = sum(int(d[w, 0]) << (w * c) for w in range(d.shape[0]))
        assert recon == s
