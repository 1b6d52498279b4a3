"""Module tests: in-circuit Poseidon (hashed visibility) and the Freivalds
phase-2 einsum argument — mock-level (prove-level covered in test_plonk)."""

import numpy as np
import pytest

from ezkl_tpu.graph.layout import BaseConfig, LayoutCtx, TVal
from ezkl_tpu.graph.modules import get_freivalds, get_poseidon
from ezkl_tpu.kernels.poseidon import host_hash
from ezkl_tpu.plonk import mock

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
rng = np.random.default_rng(5)


def _freivalds_case(tamper: bool):
    cfg = BaseConfig()
    ctx = LayoutCtx(cfg, 10)
    A = TVal(rng.integers(-50, 50, (6, 8)).astype(np.int64), 7, None)
    B = TVal(rng.integers(-50, 50, (8, 5)).astype(np.int64), 7, None)
    mod = get_freivalds(cfg)
    C = A.ints @ B.ints
    if tamper:
        C = C.copy()
        C[2, 3] += 1
    mod.matmul(ctx, A, B, C)
    asg = ctx.finalize()
    ch = {0: 0xDEADBEEF1234567}
    asg.apply_phase1(ch)
    return mock.verify(asg, ch)


def test_freivalds_clean():
    assert _freivalds_case(False) == []


def test_freivalds_catches_tamper():
    assert _freivalds_case(True)


def _bmm_case(tamper: bool, shared_b: bool):
    cfg = BaseConfig()
    ctx = LayoutCtx(cfg, 10)
    Bt, M, K, N = 3, 4, 6, 5
    A = TVal(rng.integers(-50, 50, (Bt, M, K)).astype(np.int64), 7, None)
    bsh = (K, N) if shared_b else (Bt, K, N)
    B = TVal(rng.integers(-50, 50, bsh).astype(np.int64), 7, None)
    mod = get_freivalds(cfg)
    C = A.ints @ (B.ints if not shared_b else B.ints[None])
    if tamper:
        C = C.copy()
        C[1, 2, 3] += 1
    mod.bmm(ctx, A, B, C, shared_b=shared_b)
    asg = ctx.finalize()
    ch = {0: 0xDEADBEEF1234567}
    asg.apply_phase1(ch)
    return mock.verify(asg, ch)


def test_bmm_batched_clean():
    assert _bmm_case(False, shared_b=False) == []


def test_bmm_batched_tamper():
    assert _bmm_case(True, shared_b=False)


def test_bmm_shared_b_clean():
    assert _bmm_case(False, shared_b=True) == []


def test_bmm_shared_b_tamper():
    assert _bmm_case(True, shared_b=True)


def test_poseidon_module_matches_host():
    cfg = BaseConfig()
    ctx = LayoutCtx(cfg, 10)
    vals = np.asarray([3, -7, 11], np.int64)
    tv = TVal(vals, 4, None)
    ctx.materialize(tv, col=cfg.a0)
    mod = get_poseidon(cfg)
    hv, span = mod.hash(ctx, tv)
    assert hv == host_hash([int(v) % P for v in vals])
    asg = ctx.finalize()
    assert mock.verify(asg) == []
