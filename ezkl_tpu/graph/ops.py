"""Circuit op library: quantized forward + constraint layout per op.

Counterpart of the reference's PolyOp/LookupOp/HybridOp layout functions
(`/root/reference/src/circuit/ops/{poly,lookup,hybrid}.rs` dispatching into
`layouts.rs` — SURVEY.md §2.2). Every op here computes its witness with
vectorized numpy int64 AND emits constraints through the span layout engine
in the same pass (the reference's combined witness_gen+layout mode,
`region.rs RegionSettings`).

Lookup table contents reproduce `tensor/ops.rs::nonlinearities` semantics:
dequantize -> f64 function -> round-half-even requantize.
"""

from __future__ import annotations

import numpy as np

from .layout import BaseConfig, LayoutCtx, Span, TVal
from .quantize import quantize, dequantize, check_range


def _broadcast_indices(shape, out_shape) -> np.ndarray:
    """Flat source indices that broadcast `shape` to `out_shape` (row-major)."""
    idx = np.arange(int(np.prod(shape, dtype=np.int64)) or 1).reshape(shape)
    return np.ascontiguousarray(np.broadcast_to(idx, out_shape)).reshape(-1)


# ---------------------------------------------------------------------------
# elementwise
# ---------------------------------------------------------------------------

def pairwise(ctx: LayoutCtx, kind: str, a: TVal, b: TVal) -> TVal:
    """add | sub | mul with numpy broadcasting. Scales must already match
    for add/sub; mul adds scales (reference `poly.rs:367-426`)."""
    cfg = ctx.cfg
    out_shape = np.broadcast_shapes(a.shape, b.shape)
    L = int(np.prod(out_shape, dtype=np.int64)) or 1
    idx_a = _broadcast_indices(a.shape, out_shape)
    idx_b = _broadcast_indices(b.shape, out_shape)
    r = ctx.alloc(L)
    va = ctx.stage_operand(a, cfg.a0, r, idx_a)
    vb = ctx.stage_operand(b, cfg.a1, r, idx_b)
    if kind == "add":
        assert a.scale == b.scale, f"add scale mismatch {a.scale} vs {b.scale}"
        out, scale = va + vb, a.scale
    elif kind == "sub":
        assert a.scale == b.scale, f"sub scale mismatch {a.scale} vs {b.scale}"
        out, scale = va - vb, a.scale
    elif kind == "mul":
        out, scale = va * vb, a.scale + b.scale
    else:
        raise ValueError(kind)
    check_range(out)
    ctx.write(cfg.a2, r, out)
    ctx.enable(kind, r, L)
    return TVal(out.reshape(out_shape), scale, Span.contiguous(cfg.a2, r, L))


def const_mul(ctx: LayoutCtx, a: TVal, k: int, scale_delta: int = 0) -> TVal:
    """Multiply by integer constant k (e.g. 2^d for scale alignment)."""
    c = TVal(np.full(1, k, np.int64), scale_delta, None)
    return pairwise(ctx, "mul", a, c)


# ---------------------------------------------------------------------------
# accumulation (dot / sum) — rotation(-1) running gates
# ---------------------------------------------------------------------------

def _accumulate(ctx: LayoutCtx, kind: str, idx_a, idx_b, a: TVal,
                b: TVal | None, runs: int, run_len: int):
    """Generic contiguous-run accumulator layout. Returns (acc_values,
    out_rows) where out_rows are the run-final accumulator cells."""
    cfg = ctx.cfg
    L = runs * run_len
    r = ctx.alloc(L)
    va = ctx.stage_operand(a, cfg.a0, r, idx_a)
    if b is not None:
        vb = ctx.stage_operand(b, cfg.a1, r, idx_b)
        prod = check_range(va * vb)
    else:
        prod = va
    acc = np.cumsum(prod.reshape(runs, run_len), axis=1).reshape(-1) \
        if kind == "dot" or kind == "sum" else \
        np.cumprod(prod.reshape(runs, run_len), axis=1).reshape(-1)
    check_range(acc)
    ctx.write(cfg.a2, r, acc)
    init_rows = r + np.arange(runs) * run_len
    init_gate = {"dot": "dot_init", "sum": "sum_init", "prod": "prod_init"}[kind]
    sel_init = ctx._arr(cfg.sel[init_gate])
    sel_rest = ctx._arr(cfg.sel[kind])
    mask = np.zeros(L, bool)
    mask[np.arange(runs) * run_len] = True
    rows_all = r + np.arange(L)
    sel_init[rows_all[mask]] = 1
    sel_rest[rows_all[~mask]] = 1
    out_rows = r + np.arange(runs) * run_len + (run_len - 1)
    out_vals = acc.reshape(runs, run_len)[:, -1]
    return out_vals, out_rows


def matmul(ctx: LayoutCtx, a: TVal, b: TVal) -> TVal:
    """(.., M, K) x (K, N) -> (.., M, N) via dot-accumulation runs.

    The reference routes einsums either to Freivalds or base-op dots
    (`chip/einsum/analysis.rs`); this is the base-op path.
    """
    A, B = a.ints, b.ints
    assert A.shape[-1] == B.shape[0], f"matmul dims {A.shape} x {B.shape}"
    lead = A.shape[:-2] if A.ndim > 1 else ()
    M = A.shape[-2] if A.ndim >= 2 else 1
    K = A.shape[-1]
    N = B.shape[1] if B.ndim == 2 else 1
    batch = int(np.prod(lead, dtype=np.int64)) or 1
    # flat index arrays for each (batch, i, j, k) row
    bidx, iidx, jidx, kidx = np.meshgrid(
        np.arange(batch), np.arange(M), np.arange(N), np.arange(K),
        indexing="ij")
    idx_a = ((bidx * M + iidx) * K + kidx).reshape(-1)
    idx_b = (kidx * N + jidx).reshape(-1)
    runs = batch * M * N
    out_vals, out_rows = _accumulate(ctx, "dot", idx_a, idx_b, a, b, runs, K)
    out_shape = lead + (M, N) if A.ndim >= 2 else (N,)
    if B.ndim == 1:
        out_shape = lead + (M,)
    return TVal(out_vals.reshape(out_shape), a.scale + b.scale,
                Span(ctx.cfg.a2, out_rows))


def sum_reduce(ctx: LayoutCtx, a: TVal) -> TVal:
    """Full sum() of a tensor -> scalar (shape ())."""
    L = int(a.ints.size)
    out_vals, out_rows = _accumulate(
        ctx, "sum", np.arange(L), None, a, None, 1, L)
    return TVal(out_vals.reshape(()), a.scale, Span(ctx.cfg.a2, out_rows))


# ---------------------------------------------------------------------------
# nonlinearities via lookup (reference `lookup.rs` + nonlinearities)
# ---------------------------------------------------------------------------

def _table_range(ctx: LayoutCtx, lookup_range) -> np.ndarray:
    lo, hi = lookup_range
    n_needed = hi - lo + 1
    if n_needed > ctx.n:
        raise ValueError(
            f"lookup table of {n_needed} rows exceeds 2^{ctx.k} domain; "
            "raise logrows or shrink lookup_range")
    return np.arange(lo, hi + 1, dtype=np.int64)


def lookup_fn(ctx: LayoutCtx, name: str, a: TVal, fn, in_scale: int,
              out_scale: int, lookup_range) -> TVal:
    """Generic quantized nonlinearity: out = quant(fn(dequant(in)))."""
    xs = _table_range(ctx, lookup_range)
    with np.errstate(all="ignore"):
        ys = quantize(fn(dequantize(xs, in_scale)), out_scale)
    ys = np.nan_to_num(ys, nan=0.0, posinf=0, neginf=0).astype(np.int64)
    tname = f"{name}_si{in_scale}_so{out_scale}_r{lookup_range[0]}_{lookup_range[1]}"
    return ctx.apply_lookup(tname, xs, ys, a, out_scale)


def relu(ctx, a: TVal, lookup_range) -> TVal:
    return lookup_fn(ctx, "relu", a, lambda x: np.maximum(x, 0.0),
                     a.scale, a.scale, lookup_range)


def sigmoid(ctx, a: TVal, out_scale: int, lookup_range) -> TVal:
    return lookup_fn(ctx, "sigmoid", a, lambda x: 1.0 / (1.0 + np.exp(-x)),
                     a.scale, out_scale, lookup_range)


def exp_op(ctx, a: TVal, out_scale: int, lookup_range) -> TVal:
    return lookup_fn(ctx, "exp", a, np.exp, a.scale, out_scale, lookup_range)


def tanh_op(ctx, a: TVal, out_scale: int, lookup_range) -> TVal:
    return lookup_fn(ctx, "tanh", a, np.tanh, a.scale, out_scale, lookup_range)


def div_rebase(ctx, a: TVal, shift: int, lookup_range) -> TVal:
    """Divide by 2^shift with round-half-even (the RebaseScale divisor,
    reference `node.rs:142-290`), via lookup."""
    out = lookup_fn(ctx, f"div2p{shift}", a,
                    lambda x: x,  # identity in float domain...
                    a.scale, a.scale - shift, lookup_range)
    return out
