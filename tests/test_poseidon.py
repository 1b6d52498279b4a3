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


def test_sponge_trace_matches_host_hash():
    """host_sponge_traces (the batched in-circuit layout path) must agree
    with the host_hash oracle at every chain position."""
    p = FR.modulus
    xs = [rng.randrange(p) for _ in range(23)]
    traces, absorbed = pos.host_sponge_traces(xs, p)
    assert len(traces) == len(absorbed) == 23
    for i in range(1, 23):
        # prefix property: state after i absorbs == hash chain state
        assert traces[i - 1][-1][0] == (absorbed[i] - xs[i]) % p
    assert traces[-1][-1][0] == pos.host_hash(xs, p)
    # per-permutation trace rows match the generic oracle
    tr0 = pos.host_permute_trace([absorbed[0], (23 << 64) % p], p)
    assert [tuple(s) for s in tr0] == list(traces[0])


def test_large_hash_layout_is_batched():
    """Hashing a conv-weight-sized tensor (4096 elements) lays out in one
    batched pass — bounded wall time, no per-element Python layout loop
    (r4 verdict item 9)."""
    import time

    import numpy as np

    from ezkl_tpu.graph.layout import BaseConfig, LayoutCtx, TVal
    from ezkl_tpu.graph.modules import get_poseidon
    L = 4096
    cfg = BaseConfig()
    k = 19  # 4096 permutations * 65 rows needs ~2^18.1 usable rows
    ctx = LayoutCtx(cfg, k)
    vals = np.arange(L, dtype=np.int64) - L // 2
    tv = TVal(vals.copy(), 7, None)
    tv.witness = True
    t0 = time.time()
    hv, span = get_poseidon(cfg).hash(ctx, tv)
    dt = time.time() - t0
    assert hv == pos.host_hash([int(v) % FR.modulus for v in vals])
    assert dt < 30, f"batched hash layout took {dt:.1f}s for {L} elements"
