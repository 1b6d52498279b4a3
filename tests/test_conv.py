"""Grouped / dilated convolution vs the torch oracle (reference Conv
handles group/dilation attrs, `src/graph/utilities.rs` Conv mapping)."""

import numpy as np
import pytest

from ezkl_tpu.graph import ops
from ezkl_tpu.graph.layout import BaseConfig, LayoutCtx, TVal
from ezkl_tpu.plonk import mock

torch = pytest.importorskip("torch")

K = 12


def run_conv(x_np, w_np, groups=1, dilations=(1, 1), strides=(1, 1),
             padding=(0, 0, 0, 0)):
    cfg = BaseConfig()
    ctx = LayoutCtx(cfg, K)
    x = TVal(x_np.astype(np.int64), 0, None)
    ctx.materialize(x, col=cfg.a0)
    w = TVal(w_np.astype(np.int64), 0, None)
    if groups == 1:
        out = ops.conv2d(ctx, x, w, None, strides, padding,
                         dilations=dilations)
    else:
        # group loop lives in Model._conv; emulate it here
        from ezkl_tpu.graph.model import Model
        m = Model.__new__(Model)

        class RA:
            lookup_range = (-512, 512)
        m.run_args = RA()

        class Node:
            op_type = "Conv"
            attrs = {"group": groups, "dilations": list(dilations),
                     "strides": list(strides),
                     "pads": [padding[0], padding[1], padding[2], padding[3]]}
        m._matmul = lambda ctx, a, b: ops.matmul(ctx, a, b)
        out = m._conv(ctx, Node(), [x, w], lambda t: t)
    assert mock.verify(ctx.finalize()) == []
    return out.ints


@pytest.mark.parametrize("groups,dil", [(1, (2, 2)), (2, (1, 1)),
                                        (2, (2, 1)), (4, (1, 1))])
def test_conv_group_dilation_matches_torch(groups, dil):
    rng = np.random.default_rng(3)
    N, C, H, W = 1, 4, 7, 8
    O, KH, KW = 4, 3, 2
    x = rng.integers(-6, 7, size=(N, C, H, W))
    w = rng.integers(-4, 5, size=(O, C // groups, KH, KW))
    got = run_conv(x, w, groups=groups, dilations=dil)
    want = torch.nn.functional.conv2d(
        torch.tensor(x, dtype=torch.float64),
        torch.tensor(w, dtype=torch.float64),
        groups=groups, dilation=dil).numpy().astype(np.int64)
    assert np.array_equal(got, want)
