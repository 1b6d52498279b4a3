"""Multi-column (chunked) lookup tables: tables larger than the usable
rows of the domain split across several fixed column sets, one logup
argument per chunk — the analog of the reference's multi-column table
split (`/root/reference/src/circuit/table.rs:136-204`)."""

import numpy as np

from ezkl_tpu.graph.layout import BaseConfig, LayoutCtx, TVal
from ezkl_tpu.plonk import mock

K = 6  # 64 rows; usable ≈ 64 - blinding - 1


def _relu_table(lo: int, hi: int):
    xs = np.arange(lo, hi + 1, dtype=np.int64)
    return xs, np.maximum(xs, 0)


def test_table_splits_into_chunks():
    cfg = BaseConfig()
    ctx = LayoutCtx(cfg, K)
    xs, ys = _relu_table(-100, 99)  # 200 rows >> usable at k=6
    x = TVal(np.array([-100, -3, 0, 7, 99, 50], np.int64), 1, None,
             witness=True)
    ctx.materialize(x)
    out = ctx.apply_lookup("relu_big", xs, ys, x, 1)
    assert list(out.ints) == [0, 0, 0, 7, 99, 50]
    info = cfg.tables["relu_big"]
    assert len(info["chunks"]) >= 4
    # every chunk individually fits the usable rows
    assert all(ch["inputs"].size <= ctx.usable for ch in info["chunks"])
    assert mock.verify(ctx.finalize()) == []


def test_chunked_table_tamper_fails():
    cfg = BaseConfig()
    ctx = LayoutCtx(cfg, K)
    xs, ys = _relu_table(-100, 99)
    x = TVal(np.array([-50, 20], np.int64), 1, None, witness=True)
    ctx.materialize(x)
    out = ctx.apply_lookup("relu_big", xs, ys, x, 1)
    assert mock.verify(ctx.finalize()) == []
    # corrupt one looked-up output: (in, out) is in no chunk's table
    ctx._arr(cfg.a1)[int(out.span.rows[0])] += 1
    assert mock.verify(ctx.finalize()) != []


def test_single_chunk_unchanged():
    cfg = BaseConfig()
    ctx = LayoutCtx(cfg, K)
    xs, ys = _relu_table(-8, 7)  # fits: one chunk, one lookup argument
    x = TVal(np.array([-8, 3], np.int64), 1, None, witness=True)
    ctx.materialize(x)
    ctx.apply_lookup("relu_small", xs, ys, x, 1)
    assert len(cfg.tables["relu_small"]["chunks"]) == 1
    assert len(cfg.cs.lookups) == 1
    assert mock.verify(ctx.finalize()) == []
