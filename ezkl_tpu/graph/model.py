"""Model: ONNX graph -> quantized circuit ops (the reference's
`Model`/`Node::new`/`new_op_from_onnx` pipeline, `/root/reference/src/graph/
{model.rs,node.rs,utilities.rs}` — SURVEY.md §3.1).

Scale algebra follows the reference: inputs at input_scale, params at
param_scale, multiplicative ops add scales, and any result whose scale
exceeds input_scale * scale_rebase_multiplier is rebased down by a
rounding division (RebaseScale, `node.rs:142-290`). Add/sub operands are
aligned by constant multiplication (Rescaled, `node.rs:86-137`).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import onnx_parser, ops
from .layout import BaseConfig, LayoutCtx, TVal
from .quantize import quantize
from .run_args import RunArgs

SUPPORTED = {
    "Relu", "Sigmoid", "Tanh", "Exp", "Gemm", "MatMul", "Add", "Sub", "Mul",
    "Reshape", "Flatten", "Identity", "Constant", "Cast", "Softmax",
}


@dataclasses.dataclass
class Model:
    onnx: onnx_parser.OnnxModel
    run_args: RunArgs

    @classmethod
    def load(cls, path, run_args: RunArgs) -> "Model":
        return cls(onnx=onnx_parser.load(path), run_args=run_args.validate())

    # -- shape resolution ---------------------------------------------------

    def input_shapes(self) -> list[tuple]:
        out = []
        for ti in self.onnx.graph.inputs:
            shape = tuple(
                self.run_args.variables.get(d, d) if isinstance(d, str) else int(d)
                for d in ti.shape
            )
            out.append(tuple(int(s) for s in shape))
        return out

    # -- the layout pass (witness gen + constraints in one walk) ------------

    def layout(self, ctx: LayoutCtx, input_arrays: list[np.ndarray]) -> list[TVal]:
        ra = self.run_args
        g = self.onnx.graph
        values: dict[str, TVal] = {}

        # graph inputs: quantize + place in advice
        for ti, arr in zip(g.inputs, input_arrays):
            q = quantize(arr, ra.input_scale)
            tv = TVal(q, ra.input_scale, None)
            ctx.materialize(tv, col=ctx.cfg.a0)
            values[ti.name] = tv

        # initializers: params, quantized at param_scale, lazily placed
        for name, arr in g.initializers.items():
            if np.issubdtype(arr.dtype, np.floating):
                values[name] = TVal(quantize(arr, ra.param_scale),
                                    ra.param_scale, None)
            else:
                values[name] = TVal(arr.astype(np.int64), 0, None)

        max_scale = ra.input_scale * ra.scale_rebase_multiplier

        def rebase(tv: TVal) -> TVal:
            if tv.scale > max_scale:
                return ops.div_rebase(ctx, tv, tv.scale - ra.input_scale,
                                      ra.lookup_range)
            return tv

        def align(a: TVal, b: TVal):
            """Equalize scales for add/sub by const-multiplying the lower."""
            if a.scale == b.scale:
                return a, b
            if a.scale < b.scale:
                a = ops.const_mul(ctx, a, 1 << (b.scale - a.scale),
                                  b.scale - a.scale)
            else:
                b = ops.const_mul(ctx, b, 1 << (a.scale - b.scale),
                                  a.scale - b.scale)
            return a, b

        for node in g.nodes:
            op = node.op_type
            ins = [values[i] for i in node.inputs if i]
            if op == "Relu":
                out = ops.relu(ctx, ins[0], ra.lookup_range)
            elif op == "Sigmoid":
                out = ops.sigmoid(ctx, ins[0], ra.input_scale, ra.lookup_range)
            elif op == "Tanh":
                out = ops.tanh_op(ctx, ins[0], ra.input_scale, ra.lookup_range)
            elif op == "Exp":
                out = ops.exp_op(ctx, ins[0], ra.input_scale, ra.lookup_range)
            elif op in ("MatMul", "Gemm"):
                a, b = ins[0], ins[1]
                if op == "Gemm" and node.attrs.get("transB"):
                    b = TVal(np.ascontiguousarray(b.ints.T), b.scale, None) \
                        if b.span is None else _transposed(ctx, b)
                out = ops.matmul(ctx, a, b)
                if op == "Gemm" and len(ins) > 2:
                    bias = ins[2]
                    if bias.span is None and bias.scale != out.scale:
                        # re-quantize an unplaced constant directly at the
                        # needed scale (reference rescale_const_with_single_use)
                        orig = bias.ints.astype(np.float64) / (1 << bias.scale)
                        bias = TVal(quantize(orig, out.scale), out.scale, None)
                    a2, b2 = align(out, bias)
                    out = ops.pairwise(ctx, "add", a2, b2)
                out = rebase(out)
            elif op in ("Add", "Sub", "Mul"):
                kind = op.lower()
                if kind in ("add", "sub"):
                    a, b = align(ins[0], ins[1])
                    out = ops.pairwise(ctx, kind, a, b)
                else:
                    out = rebase(ops.pairwise(ctx, "mul", ins[0], ins[1]))
            elif op in ("Reshape", "Flatten", "Identity", "Cast"):
                src = ins[0]
                if op == "Reshape":
                    shape_t = values[node.inputs[1]].ints
                    new_shape = _resolve_reshape(src.shape, shape_t)
                elif op == "Flatten":
                    axis = node.attrs.get("axis", 1)
                    lead = int(np.prod(src.shape[:axis], dtype=np.int64)) or 1
                    new_shape = (lead, int(src.ints.size // lead))
                else:
                    new_shape = src.shape
                out = TVal(src.ints.reshape(new_shape), src.scale, src.span)
            elif op == "Constant":
                arr = node.attrs.get("value")
                if np.issubdtype(arr.dtype, np.floating):
                    out = TVal(quantize(arr, ra.param_scale), ra.param_scale, None)
                else:
                    out = TVal(arr.astype(np.int64), 0, None)
            elif op == "Softmax":
                out = _softmax(ctx, ins[0], ra)
            else:
                raise NotImplementedError(f"op {op} not yet supported")
            values[node.outputs[0]] = out

        outputs = [values[o.name] for o in g.outputs]
        # place any output that is still a bare constant
        for tv in outputs:
            ctx.materialize(tv)
        return outputs


def forward_float(model: "Model", input_arrays: list[np.ndarray]) -> list[np.ndarray]:
    """Plain float64 reference forward (no quantization) — the calibration
    ground truth (the reference uses tract `run_onnx_predictions`,
    `model.rs:992-1026`; we evaluate the graph directly)."""
    g = model.onnx.graph
    vals: dict[str, np.ndarray] = {}
    for ti, arr in zip(g.inputs, input_arrays):
        vals[ti.name] = np.asarray(arr, np.float64)
    for name, arr in g.initializers.items():
        vals[name] = np.asarray(arr, np.float64)
    for node in g.nodes:
        op = node.op_type
        ins = [vals[i] for i in node.inputs if i]
        if op == "Relu":
            out = np.maximum(ins[0], 0.0)
        elif op == "Sigmoid":
            out = 1.0 / (1.0 + np.exp(-ins[0]))
        elif op == "Tanh":
            out = np.tanh(ins[0])
        elif op == "Exp":
            out = np.exp(ins[0])
        elif op in ("MatMul", "Gemm"):
            b = ins[1].T if (op == "Gemm" and node.attrs.get("transB")) else ins[1]
            out = ins[0] @ b
            if op == "Gemm" and len(ins) > 2:
                out = out + ins[2]
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Sub":
            out = ins[0] - ins[1]
        elif op == "Mul":
            out = ins[0] * ins[1]
        elif op == "Reshape":
            out = ins[0].reshape(_resolve_reshape(ins[0].shape, vals[node.inputs[1]]))
        elif op == "Flatten":
            axis = node.attrs.get("axis", 1)
            lead = int(np.prod(ins[0].shape[:axis])) or 1
            out = ins[0].reshape(lead, -1)
        elif op in ("Identity", "Cast"):
            out = ins[0]
        elif op == "Constant":
            out = np.asarray(node.attrs.get("value"), np.float64)
        elif op == "Softmax":
            e = np.exp(ins[0] - ins[0].max())
            out = e / e.sum()
        else:
            raise NotImplementedError(f"float forward: op {op}")
        vals[node.outputs[0]] = out
    return [vals[o.name] for o in g.outputs]


def _transposed(ctx, tv: TVal) -> TVal:
    """Transpose a placed 2D tensor: same cells, permuted element order."""
    perm = np.arange(tv.ints.size).reshape(tv.shape).T.reshape(-1)
    return TVal(np.ascontiguousarray(tv.ints.T), tv.scale,
                dataclasses.replace(tv.span, rows=tv.span.rows[perm]))


def _resolve_reshape(cur_shape, shape_t) -> tuple:
    tgt = [int(s) for s in shape_t.reshape(-1)]
    total = int(np.prod(cur_shape, dtype=np.int64)) or 1
    if -1 in tgt:
        known = int(np.prod([s for s in tgt if s != -1], dtype=np.int64)) or 1
        tgt = [total // known if s == -1 else s for s in tgt]
    tgt = [cur_shape[i] if s == 0 else s for i, s in enumerate(tgt)]
    return tuple(tgt)


def _softmax(ctx, a: TVal, ra: RunArgs) -> TVal:
    """softmax = exp lookup -> sum -> recip lookup -> mul (reference
    `layouts.rs:6687`). Percent-style normalization at input_scale."""
    ex = ops.exp_op(ctx, a, ra.input_scale, ra.lookup_range)
    denom = ops.sum_reduce(ctx, ex)
    # recip at doubled scale to keep precision, then multiply and rebase
    inv = ops.lookup_fn(
        ctx, "recip", denom, lambda x: np.where(x == 0, 0.0, 1.0 / x),
        denom.scale, 2 * ra.input_scale, ra.lookup_range)
    prod = ops.pairwise(ctx, "mul", ex, inv)
    return ops.div_rebase(ctx, prod, prod.scale - ra.input_scale, ra.lookup_range)
