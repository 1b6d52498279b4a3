"""Dynamic-lookup argument (advice-valued table; reference
`layouts.rs:1483`, `ops/chip.rs:619-714`): gate-level mock tests and the
gather reductions built on it."""

import numpy as np
import pytest

from ezkl_tpu.graph import ops
from ezkl_tpu.graph.layout import BaseConfig, LayoutCtx, TVal
from ezkl_tpu.plonk import mock

K = 9


def make_ctx():
    cfg = BaseConfig()
    return cfg, LayoutCtx(cfg, K)


def test_dynamic_lookup_gather_values_and_mock():
    cfg, ctx = make_ctx()
    data = TVal(np.array([10, 20, 30, 40, 50], np.int64), 2, None)
    ctx.materialize(data, col=cfg.a0)
    idx = TVal(np.array([4, 0, 2, 2, 1], np.int64), 0, None, witness=True)
    ctx.materialize(idx)
    out = ctx.dynamic_lookup_gather(data, idx)
    assert list(out.ints) == [50, 10, 30, 30, 20]
    assert out.scale == 2
    assert mock.verify(ctx.finalize()) == []


def test_dynamic_lookup_gather_tamper_fails():
    cfg, ctx = make_ctx()
    data = TVal(np.array([10, 20, 30], np.int64), 0, None)
    ctx.materialize(data, col=cfg.a0)
    idx = TVal(np.array([1, 2], np.int64), 0, None, witness=True)
    ctx.materialize(idx)
    out = ctx.dynamic_lookup_gather(data, idx)
    assert mock.verify(ctx.finalize()) == []
    # corrupt the gathered output cell: (idx, out) no longer in the table
    arr = ctx._arr(cfg.a1)
    row = int(out.span.rows[0])
    arr[row] += 1
    assert mock.verify(ctx.finalize()) != []


def test_dynamic_lookup_rejects_out_of_range_index():
    cfg, ctx = make_ctx()
    data = TVal(np.array([10, 20, 30], np.int64), 0, None)
    ctx.materialize(data, col=cfg.a0)
    idx = TVal(np.array([3], np.int64), 0, None, witness=True)
    ctx.materialize(idx)
    with pytest.raises(ValueError, match="out of range"):
        ctx.dynamic_lookup_gather(data, idx)


def test_model_dynamic_gather_axis():
    """_dynamic_gather through the Model helper: 2-D data, witness indices,
    middle-axis gather — matches numpy take."""
    from ezkl_tpu.graph.model import Model
    cfg, ctx = make_ctx()
    rng = np.random.default_rng(1)
    data_np = rng.integers(-50, 50, size=(3, 4, 2))
    idx_np = np.array([2, 0, 3], np.int64)
    data = TVal(data_np.astype(np.int64), 1, None)
    ctx.materialize(data, col=cfg.a0)
    idx = TVal(idx_np, 0, None, witness=True)
    ctx.materialize(idx)
    m = Model.__new__(Model)  # only _dynamic_gather is exercised
    out = m._dynamic_gather(ctx, data, idx, axis=1)
    assert out.ints.shape == (3, 3, 2)
    assert np.array_equal(out.ints, np.take(data_np, idx_np, axis=1))
    assert mock.verify(ctx.finalize()) == []


def test_model_gather_elements_dyn():
    from ezkl_tpu.graph.model import Model
    cfg, ctx = make_ctx()
    data_np = np.array([[1, 2], [3, 4]], np.int64)
    idx_np = np.array([[0, 0], [1, 0]], np.int64)
    data = TVal(data_np, 0, None)
    ctx.materialize(data, col=cfg.a0)
    idx = TVal(idx_np, 0, None, witness=True)
    ctx.materialize(idx)
    m = Model.__new__(Model)
    out = m._gather_elements_dyn(ctx, data, idx, axis=0)
    assert np.array_equal(out.ints, np.take_along_axis(data_np, idx_np, 0))
    assert mock.verify(ctx.finalize()) == []
