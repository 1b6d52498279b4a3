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


def test_extract_digits_signed():
    """Signed recoding: value reconstructs, magnitudes stay <= 2^(c-1),
    and c=17 needs only 15 windows over reduced Fr scalars."""
    vals = [0, 1, FR.modulus - 1, (1 << 254) % FR.modulus] + \
        [rng.randrange(FR.modulus) for _ in range(12)]
    sc = jnp.asarray(limbs.encode(FR, vals, mont=False))
    import numpy as np
    for c in (4, 16, 17):
        mags, negs = msmmod.extract_digits_signed(sc, c)
        mags = np.asarray(mags).astype(np.int64)
        negs = np.asarray(negs)
        assert mags.max() <= 1 << (c - 1)
        signed = np.where(negs, -mags, mags)
        for i, want in enumerate(vals):
            got = sum(int(signed[w, i]) << (w * c)
                      for w in range(signed.shape[0]))
            assert got == want, (c, i)
    assert len(msmmod._signed_windows(17)) == 15


def test_msm_signed_matches_host():
    """Signed-digit MSM path (default on) vs host oracle, incl. identity
    lanes, zero scalars and near-modulus scalars (max-magnitude digits)."""
    pts = rand_points(6) + [None, None]
    scalars = [FR.modulus - 1, FR.modulus - 2] + \
        [rng.randrange(FR.modulus) for _ in range(3)] + [0, 3, 5]
    want = hostcurve.g1_msm(pts, scalars)
    enc = curve.encode_points(pts)
    sc = jnp.asarray(limbs.encode(FR, scalars, mont=False))
    import jax
    for signed in (False, True):
        out = msmmod.msm(enc, sc, c=5, group=2, signed=signed)
        got = curve.decode_points(jax.tree.map(lambda a: a[:, None], out))[0]
        assert got == want, f"signed={signed}"


def test_pack_unpack_roundtrip():
    import numpy as np
    v = np.random.default_rng(0).integers(
        0, 1 << 16, size=(16, 3, 5), dtype=np.int64).astype(np.uint32)
    dev = jnp.asarray(v)
    packed = msmmod._pack2(dev)
    assert packed.shape == (8, 3, 5)
    back = np.asarray(msmmod._unpack2(packed))
    np.testing.assert_array_equal(back, v)
