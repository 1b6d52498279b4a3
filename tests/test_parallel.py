"""Sharded MSM / four-step NTT on the 8-device virtual CPU mesh."""

import random

import jax
import jax.numpy as jnp
import pytest

from ezkl_tpu.fieldmath import limbs, curve, hostcurve
from ezkl_tpu.fieldmath.spec import bn254_fr
from ezkl_tpu.kernels import ntt as nttmod
from ezkl_tpu.parallel import sharded

FR = bn254_fr()
rng = random.Random(42)


def test_mesh_has_8_devices():
    mesh = sharded.make_mesh()
    assert mesh.devices.size == 8


def test_msm_sharded_matches_host():
    n = 8
    pts_host = [hostcurve.g1_mul(hostcurve.G1, rng.randrange(1, 1 << 28)) for _ in range(n)]
    scalars = [rng.randrange(FR.modulus) for _ in range(n)]
    mesh = sharded.make_mesh(2)
    pts = curve.encode_points(pts_host)
    sc = jnp.asarray(limbs.encode(FR, scalars, mont=False))
    out = sharded.msm_sharded(mesh, pts, sc, c=3)
    got = curve.decode_points(jax.tree.map(lambda a: a[:, None], out))[0]
    assert got == hostcurve.g1_msm(pts_host, scalars)


def test_ntt_sharded_matches_single_and_roundtrip():
    k = 4
    n = 1 << k
    R = C = 4
    vals = [rng.randrange(FR.modulus) for _ in range(n)]
    dev = jnp.asarray(limbs.encode(FR, vals))
    mesh = sharded.make_mesh(2)
    mat = sharded.to_fourstep_layout(dev, R, C)
    out = sharded.ntt_sharded(mesh, FR, mat)
    flat = sharded.from_fourstep_layout(out)
    want = list(limbs.decode(FR, nttmod.ntt_jit(FR, dev)))
    assert list(limbs.decode(FR, flat)) == want
    back = sharded.ntt_sharded(
        mesh, FR, sharded.to_fourstep_layout(flat, R, C), inverse=True
    )
    assert list(limbs.decode(FR, sharded.from_fourstep_layout(back))) == vals


def test_prover_commits_via_mesh_match_single_device():
    """With an active mesh, create_proof's commits ride msm_sharded; a
    det-prove seed makes the proof byte-identical to the single-device one."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from test_plonk import K, build_circuit, build_assignment
    from ezkl_tpu.plonk import keygen, prover, srs as srsmod, verifier
    from ezkl_tpu.parallel import sharded

    cs, cols = build_circuit()
    asg = build_assignment(cs, cols)
    srs = srsmod.gen_srs(K)
    pk = keygen.keygen(cs, K, srs, asg)
    p_single = prover.create_proof(pk, srs, asg, seed=7)
    mesh = sharded.make_mesh(8)
    sharded.set_mesh(mesh)
    try:
        p_mesh = prover.create_proof(pk, srs, asg, seed=7)
    finally:
        sharded.set_mesh(None)
    assert p_mesh.to_json() == p_single.to_json()
    assert verifier.verify(pk.vk, srs.g2, srs.s_g2, p_mesh)


def test_ntt_sharded_batched_matches_single():
    """Batched four-step sharded NTT == single-device NTT, forward and
    inverse, multiple polys at once (the prover's to_ext transform path)."""
    import numpy as np
    mesh = sharded.make_mesh(4)
    B, n = 3, 256                       # shard_factors(4, 256) = (16, 16)
    assert sharded.shard_factors(mesh, n) is not None
    vals = np.array([[rng.randrange(FR.modulus) for _ in range(n)]
                     for _ in range(B)], object)
    x = jnp.asarray(limbs.encode(FR, vals))            # (16, B, n)
    got = np.asarray(sharded.ntt_sharded_batched(mesh, FR, x))
    want = np.asarray(nttmod.ntt(FR, x))
    assert (got == want).all()
    back = np.asarray(sharded.ntt_sharded_batched(
        mesh, FR, jnp.asarray(got), inverse=True))
    assert (back == np.asarray(x)).all()


def test_to_ext_sharded_matches_domain():
    """Sharded lagrange->extended == Domain.coeff_to_extended(intt(v)),
    bit-for-bit, for a column stack."""
    import numpy as np
    from ezkl_tpu.plonk.domain import domain
    mesh = sharded.make_mesh(4)
    dom = domain(4)                     # n=16, ext=128; ext shards on d=4
    assert sharded.shard_factors(mesh, dom.n_ext) is not None
    C, n = 2, dom.n
    vals = np.array([[rng.randrange(FR.modulus) for _ in range(n)]
                     for _ in range(C)], object)
    stack = jnp.moveaxis(jnp.asarray(limbs.encode(FR, vals)), 0, 1)  # (C,16,n)
    got = np.asarray(sharded.to_ext_sharded(mesh, dom, stack))
    want = np.asarray(jax.vmap(
        lambda v: dom.coeff_to_extended(nttmod.intt(FR, v)))(stack))
    assert (got == want).all()
