"""General einsum -> Freivalds routing (the reference's universal einsum
argument, `src/circuit/ops/chip/einsum/{mod,analysis}.rs`): label
classification, broadcast sharing, pre-reduction, output reordering."""

import numpy as np

from ezkl_tpu.graph.layout import BaseConfig, LayoutCtx, TVal
from ezkl_tpu.graph.model import Model
from ezkl_tpu.graph.run_args import RunArgs
from ezkl_tpu.plonk import mock

rng = np.random.default_rng(11)
P = 21888242871839275222246405745257275088548364400416034343698204186575808495617


def _model():
    m = Model.__new__(Model)
    m.run_args = RunArgs()
    return m


def _run(fn):
    cfg = BaseConfig()
    ctx = LayoutCtx(cfg, 11)
    out = fn(ctx)
    asg = ctx.finalize()
    ch = None
    if asg.phase_callback is not None:
        ch = {i: pow(0xDEADBEEF1234567, i + 1, P)
              for i in range(cfg.cs.num_challenges)}
        asg.apply_phase1(ch)
    assert mock.verify(asg, ch) == []
    return out, cfg


def test_einsum_batched_matmul_freivalds():
    m = _model()
    A = rng.integers(-30, 30, (2, 8, 9)).astype(np.int64)
    B = rng.integers(-30, 30, (2, 9, 8)).astype(np.int64)

    def fn(ctx):
        return m._einsum(ctx, "bik,bkj->bij",
                         TVal(A, 3, None), TVal(B, 3, None))

    out, cfg = _run(fn)
    assert getattr(cfg, "_freivalds", None) is not None, "expected RLC route"
    np.testing.assert_array_equal(out.ints, np.einsum("bik,bkj->bij", A, B))
    assert out.scale == 6


def test_einsum_output_reorder():
    m = _model()
    A = rng.integers(-20, 20, (2, 8, 9)).astype(np.int64)
    B = rng.integers(-20, 20, (2, 9, 8)).astype(np.int64)

    def fn(ctx):
        return m._einsum(ctx, "bik,bkj->jbi",
                         TVal(A, 2, None), TVal(B, 2, None))

    out, _ = _run(fn)
    np.testing.assert_array_equal(out.ints, np.einsum("bik,bkj->jbi", A, B))


def test_einsum_pre_reduces_operand_only_axis():
    m = _model()
    A = rng.integers(-10, 10, (8, 3, 9)).astype(np.int64)
    B = rng.integers(-10, 10, (9, 8)).astype(np.int64)

    def fn(ctx):
        return m._einsum(ctx, "ixk,kj->ij",
                         TVal(A, 2, None), TVal(B, 2, None))

    out, cfg = _run(fn)
    assert getattr(cfg, "_freivalds", None) is not None
    np.testing.assert_array_equal(out.ints, np.einsum("ixk,kj->ij", A, B))


def test_einsum_small_falls_back_to_base():
    m = _model()
    A = rng.integers(-10, 10, (3, 4)).astype(np.int64)
    B = rng.integers(-10, 10, (4, 3)).astype(np.int64)

    def fn(ctx):
        return m._einsum(ctx, "ik,kj->ij", TVal(A, 2, None), TVal(B, 2, None))

    out, cfg = _run(fn)
    assert getattr(cfg, "_freivalds", None) is None, "small: base-op route"
    np.testing.assert_array_equal(out.ints, A @ B)


def test_batched_matmul_shared_b():
    m = _model()
    A = rng.integers(-30, 30, (2, 8, 9)).astype(np.int64)
    B = rng.integers(-30, 30, (9, 8)).astype(np.int64)

    def fn(ctx):
        return m._batched_matmul(ctx, TVal(A, 3, None), TVal(B, 3, None))

    out, cfg = _run(fn)
    assert getattr(cfg, "_freivalds", None) is not None
    np.testing.assert_array_equal(out.ints, A @ B)


def test_batched_matmul_shared_a_flip():
    m = _model()
    A = rng.integers(-30, 30, (8, 9)).astype(np.int64)
    B = rng.integers(-30, 30, (2, 9, 8)).astype(np.int64)

    def fn(ctx):
        return m._batched_matmul(ctx, TVal(A, 3, None), TVal(B, 3, None))

    out, cfg = _run(fn)
    assert getattr(cfg, "_freivalds", None) is not None
    np.testing.assert_array_equal(out.ints, A @ B)


def test_batched_matmul_full_batch():
    m = _model()
    A = rng.integers(-30, 30, (2, 2, 6, 7)).astype(np.int64)
    B = rng.integers(-30, 30, (2, 2, 7, 6)).astype(np.int64)

    def fn(ctx):
        return m._batched_matmul(ctx, TVal(A, 3, None), TVal(B, 3, None))

    out, _ = _run(fn)
    np.testing.assert_array_equal(out.ints, A @ B)
