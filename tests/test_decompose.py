"""Decompose / range-check op family (reference `layouts.rs:6321-6423`):
gate-level mock tests (the `circuit/tests.rs` analog) plus the
fixed-columns-input-independence property that keeps claimed witness values
out of keygen."""

import json
import pathlib

import numpy as np
import pytest

from ezkl_tpu.graph import ops
from ezkl_tpu.graph.layout import BaseConfig, LayoutCtx, TVal
from ezkl_tpu.plonk import mock

K = 9


def make_ctx():
    cfg = BaseConfig()
    return cfg, LayoutCtx(cfg, K)


def finalize_ok(ctx):
    fails = mock.verify(ctx.finalize())
    assert fails == [], fails


def test_decompose_roundtrip_and_values():
    cfg, ctx = make_ctx()
    x = np.array([-300, -1, 0, 1, 7, 255, 256, 9999], np.int64)
    tv = TVal(x, 0, None)
    ctx.materialize(tv, col=cfg.a0)
    s, d, ab = ops.decompose(ctx, tv, base=16, legs=4)
    assert list(s.ints) == [int(v) for v in np.sign(x)]
    assert list(ab.ints) == [int(v) for v in np.abs(x)]
    finalize_ok(ctx)


def test_decompose_rejects_out_of_range():
    cfg, ctx = make_ctx()
    tv = TVal(np.array([70000], np.int64), 0, None)
    ctx.materialize(tv, col=cfg.a0)
    with pytest.raises(ValueError, match="base\\^legs"):
        ops.decompose(ctx, tv, base=16, legs=4)


def test_decompose_tamper_digit_fails_mock():
    cfg, ctx = make_ctx()
    x = np.array([37, -200], np.int64)
    tv = TVal(x, 0, None)
    ctx.materialize(tv, col=cfg.a0)
    ops.decompose(ctx, tv, base=16, legs=4)
    # corrupt a recomposition accumulator cell and refinalize: mock must fail
    assert mock.verify(ctx.finalize()) == []
    arr = ctx._arr(cfg.a2)
    nz = np.nonzero(arr)[0]
    arr[nz[0]] += 1
    assert mock.verify(ctx.finalize()) != []


def test_equals_zero_gate():
    cfg, ctx = make_ctx()
    x = np.array([0, 5, -3, 0, 1], np.int64)
    tv = TVal(x, 0, None)
    ctx.materialize(tv, col=cfg.a0)
    iz = ops.equals_zero(ctx, tv)
    assert list(iz.ints) == [1, 0, 0, 1, 0]
    finalize_ok(ctx)


def test_comparisons_beyond_table_range():
    """greater/equals work on values far outside the lookup table when the
    decompose path is enabled."""
    cfg, ctx = make_ctx()
    a = TVal(np.array([100000, -50000, 77], np.int64), 0, None)
    b = TVal(np.array([99999, -50000, 100000], np.int64), 0, None)
    ctx.materialize(a, col=cfg.a0)
    ctx.materialize(b, col=cfg.a0)
    g = ops.greater(ctx, a, b, (-128, 127), decomp=(64, 4))
    assert list(g.ints) == [1, 0, 0]
    e = ops.equals(ctx, a, b, (-128, 127), decomp=(64, 4))
    assert list(e.ints) == [0, 1, 0]
    finalize_ok(ctx)


def test_sign_abs_decomp():
    cfg, ctx = make_ctx()
    a = TVal(np.array([-123456, 0, 98765], np.int64), 3, None)
    ctx.materialize(a, col=cfg.a0)
    s = ops.sign_decomp(ctx, a, 64, 4)
    ab = ops.abs_decomp(ctx, a, 64, 4)
    assert list(s.ints) == [-1, 0, 1]
    assert s.scale == 0
    assert list(ab.ints) == [123456, 0, 98765]
    assert ab.scale == 3
    finalize_ok(ctx)


REF = pathlib.Path("/root/reference/examples/onnx")


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_fixed_columns_input_independent():
    """Claimed witness values (div quotients, decomposition digits) must
    NEVER land in fixed columns: keygen bakes fixed columns into the vk, so
    any input-dependence there breaks proofs for other inputs."""
    from ezkl_tpu.graph.circuit import GraphCircuit
    from ezkl_tpu.graph.run_args import RunArgs
    import ezkl_tpu.plonk.cs as csmod

    ra = RunArgs(input_scale=4, param_scale=4, lookup_range=(-512, 512),
                 logrows=11)
    gc = GraphCircuit.from_onnx(str(REF / "1l_relu" / "network.onnx"), ra)
    shape = gc.model.input_shapes()[0]
    inp = json.loads((REF / "1l_relu" / "input.json").read_text())
    x1 = np.array(inp["input_data"][0], np.float64).reshape(shape)
    rng = np.random.default_rng(0)
    x2 = rng.uniform(-1, 1, size=shape)
    gc.gen_settings([x1])

    def fixed_cols(x):
        _, ctx, _ = gc.forward([x])
        ctx.finalize()  # fills table columns
        return {
            (kind, idx): ctx._cols[(kind, idx)].copy()
            for (kind, idx) in list(ctx._cols)
            if kind == csmod.FIXED
        }

    f1 = fixed_cols(x1)
    f2 = fixed_cols(x2)
    assert f1.keys() == f2.keys()
    for key in f1:
        assert np.array_equal(f1[key], f2[key]), (
            f"fixed column {key} depends on the input — witness data is "
            "leaking into keygen")
