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
        ctx._input_tvals = []
        for ti, arr in zip(g.inputs, input_arrays):
            q = quantize(arr, ra.input_scale)
            tv = TVal(q, ra.input_scale, None)
            ctx.materialize(tv, col=ctx.cfg.a0)
            values[ti.name] = tv
            ctx._input_tvals.append(tv)

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
                out = self._matmul(ctx, a, b)
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
                axis = node.attrs.get("axis", -1)
                out = _softmax(ctx, ins[0], ra, axis)
            elif op == "Conv":
                out = self._conv(ctx, node, ins, rebase)
            elif op == "ConvTranspose":
                x, w = ins[0], ins[1]
                bias = ins[2] if len(ins) > 2 else None
                if bias is not None and bias.span is None:
                    orig = bias.ints.astype(np.float64) / (1 << bias.scale)
                    bias = TVal(quantize(orig, x.scale + w.scale),
                                x.scale + w.scale, None)
                strides = tuple(node.attrs.get("strides", [1, 1]))
                p = node.attrs.get("pads", [0, 0, 0, 0])
                opad = tuple(node.attrs.get("output_padding", [0, 0]))
                out = rebase(ops.deconv2d(
                    ctx, x, w, bias, strides, (p[0], p[1], p[2], p[3]), opad,
                    matmul_fn=self._matmul))
            elif op in ("Resize", "Upsample"):
                src = ins[0]
                if len(ins) > 2 and ins[2].ints.size:      # Resize: scales in
                    scales = ins[2].ints.astype(np.float64)
                    if ins[2].scale:
                        scales = scales / (1 << ins[2].scale)
                elif len(ins) > 1 and ins[1].ints.size:
                    scales = ins[1].ints.astype(np.float64)
                    if ins[1].scale:
                        scales = scales / (1 << ins[1].scale)
                else:
                    scales = np.asarray(node.attrs.get("scales", [1.0] * src.ints.ndim))
                out = ops.resize_nearest(ctx, src, scales.reshape(-1).tolist())
            elif op in ("MaxPool", "AveragePool", "GlobalAveragePool"):
                out = self._pool(ctx, node, ins, rebase)
            elif op == "Concat":
                axis = node.attrs.get("axis", 0)
                scales = {t.scale for t in ins}
                if len(scales) > 1:
                    tgt = max(scales)
                    ins = [t if t.scale == tgt else
                           ops.const_mul(ctx, t, 1 << (tgt - t.scale), tgt - t.scale)
                           for t in ins]
                out = ops.concat(ctx, ins, axis)
            elif op == "Transpose":
                perm = node.attrs.get("perm") or list(range(ins[0].ints.ndim))[::-1]
                out = ops.transpose(ctx, ins[0], perm)
            elif op in ("Unsqueeze", "Squeeze"):
                axes = node.attrs.get("axes")
                if axes is None and len(node.inputs) > 1:
                    axes = values[node.inputs[1]].ints.reshape(-1).tolist()
                src = ins[0]
                shape = list(src.shape)
                if op == "Unsqueeze":
                    for ax in sorted(axes):
                        shape.insert(ax if ax >= 0 else len(shape) + ax + 1, 1)
                else:
                    if axes:
                        for ax in sorted(axes, reverse=True):
                            assert shape[ax] == 1
                            shape.pop(ax)
                    else:
                        shape = [s for s in shape if s != 1]
                out = TVal(src.ints.reshape(shape), src.scale, src.span)
            elif op == "Slice":
                out = self._slice(ctx, node, ins, values)
            elif op == "Pad":
                out = self._pad(ctx, node, ins, values)
            elif op == "Neg":
                neg1 = TVal(np.full(1, -1, np.int64), 0, None)
                out = ops.pairwise(ctx, "mul", ins[0], neg1)
            elif op == "LeakyRelu":
                alpha = node.attrs.get("alpha", 0.01)
                out = ops.lookup_fn(
                    ctx, f"leaky{alpha}", ins[0],
                    lambda x: np.where(x > 0, x, alpha * x),
                    ins[0].scale, ins[0].scale, ra.lookup_range)
            elif op in ("Sqrt", "Erf", "Ln", "Log", "Cos", "Sin", "Rsqrt",
                        "Reciprocal", "HardSwish", "Elu", "Celu", "Gelu",
                        "Softplus", "Softsign", "HardSigmoid", "Selu", "Mish"):
                alpha = node.attrs.get("alpha", 1.0)
                fn = {
                    "Sqrt": lambda x: np.sqrt(np.maximum(x, 0)),
                    "Rsqrt": lambda x: np.where(x > 0, 1.0 / np.sqrt(np.abs(x) + 1e-12), 0.0),
                    "Erf": lambda x: _erf(x),
                    "Ln": np.log, "Log": np.log,
                    "Cos": np.cos, "Sin": np.sin,
                    "Reciprocal": lambda x: np.where(x == 0, 0.0, 1.0 / x),
                    "HardSwish": lambda x: x * np.clip(x / 6 + 0.5, 0, 1),
                    "Elu": lambda x: np.where(x > 0, x, alpha * (np.exp(x) - 1)),
                    "Celu": lambda x: np.maximum(x, 0) + np.minimum(
                        0, alpha * (np.exp(x / alpha) - 1)),
                    "Gelu": lambda x: 0.5 * x * (1 + _erf(x / np.sqrt(2))),
                    "Softplus": lambda x: np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0),
                    "Softsign": lambda x: x / (1 + np.abs(x)),
                    "HardSigmoid": lambda x: np.clip(
                        node.attrs.get("alpha", 0.2) * x + node.attrs.get("beta", 0.5), 0, 1),
                    "Selu": lambda x: 1.0507 * np.where(x > 0, x, 1.67326 * (np.exp(x) - 1)),
                    "Mish": lambda x: x * np.tanh(np.log1p(np.exp(-np.abs(x)) ) + np.maximum(x, 0)),
                }[op]
                out = ops.lookup_fn(ctx, op.lower(), ins[0], fn,
                                    ins[0].scale, ra.input_scale, ra.lookup_range)
            elif op == "PRelu":
                # prelu(x) = relu(x) - alpha * relu(-x), per-channel alpha
                x, alpha = ins[0], ins[1]
                pos = ops.relu(ctx, x, ra.lookup_range)
                neg1 = TVal(np.full(1, -1, np.int64), 0, None)
                negx = ops.pairwise(ctx, "mul", x, neg1)
                negpart = ops.relu(ctx, negx, ra.lookup_range)
                a_shaped = TVal(alpha.ints.reshape(
                    (1, -1) + (1,) * (x.ints.ndim - 2)) if alpha.ints.size > 1
                    else alpha.ints, alpha.scale, alpha.span)
                scaled = ops.pairwise(ctx, "mul", negpart, a_shaped)
                scaled = rebase(scaled)
                a2, b2 = align(pos, scaled)
                out = ops.pairwise(ctx, "sub", a2, b2)
            elif op == "Pow":
                expo = ins[1].ints.reshape(-1)
                e = float(expo[0]) / (1 << ins[1].scale) if ins[1].scale else float(expo[0])
                if e == int(e) and e >= 1:
                    out = rebase(ops.pow_int(ctx, ins[0], int(e)))
                else:
                    out = ops.lookup_fn(ctx, f"pow{e}", ins[0],
                                        lambda x: np.sign(x) * np.abs(x) ** e,
                                        ins[0].scale, ra.input_scale, ra.lookup_range)
            elif op == "Div":
                out = self._div(ctx, node, ins, rebase)
            elif op in ("ReduceSum", "ReduceMean"):
                out = self._reduce(ctx, node, ins, values, mean=(op == "ReduceMean"))
            elif op == "Einsum":
                eq = node.attrs.get("equation")
                eq = eq.decode() if isinstance(eq, bytes) else eq
                out = rebase(ops.einsum(ctx, eq, *ins[:2]))
            elif op in ("Greater", "Less", "Equal"):
                a, b = align(ins[0], ins[1])
                fn = {"Greater": ops.greater, "Less": ops.less,
                      "Equal": ops.equals}[op]
                out = fn(ctx, a, b, ra.lookup_range)
            elif op == "Where":
                a, b = align(ins[1], ins[2])
                out = ops.iff(ctx, ins[0], a, b)
            elif op in ("And", "Or", "Xor", "Not"):
                out = ops.logical(ctx, op.lower(), ins[0],
                                  ins[1] if len(ins) > 1 else None)
            elif op == "BatchNormalization":
                out = rebase(self._batchnorm(ctx, node, ins, align))
            elif op in ("Floor", "Ceil", "Round"):
                fn = {"Floor": np.floor, "Ceil": np.ceil,
                      "Round": np.rint}[op]
                out = ops.lookup_fn(ctx, op.lower(), ins[0], fn,
                                    ins[0].scale, ins[0].scale, ra.lookup_range)
            elif op == "Sign":
                out = ops.lookup_fn(ctx, "sign", ins[0], np.sign,
                                    ins[0].scale, 0, ra.lookup_range)
            elif op == "Abs":
                out = ops.lookup_fn(ctx, "abs", ins[0], np.abs,
                                    ins[0].scale, ins[0].scale, ra.lookup_range)
            elif op in ("Max", "Min") and len(ins) == 2:
                a, b = align(ins[0], ins[1])
                if op == "Max":
                    out = ops.pairwise_max(ctx, a, b, ra.lookup_range)
                else:
                    # min(a,b) = a - relu(a-b)
                    diff = ops.pairwise(ctx, "sub", a, b)
                    r = ops.relu(ctx, diff, ra.lookup_range)
                    out = ops.pairwise(ctx, "sub", a, r)
            elif op == "Gather":
                data, indices = ins[0], ins[1]
                if indices.span is not None:
                    raise NotImplementedError("dynamic Gather (data-dependent"
                                              " indices) not yet supported")
                axis = node.attrs.get("axis", 0)
                idx_grid = np.take(
                    np.arange(data.ints.size).reshape(data.shape),
                    indices.ints.astype(np.int64), axis=axis)
                out = ops.reindex(data, idx_grid.reshape(-1), idx_grid.shape)
            elif op in ("Expand", "Tile"):
                src = ins[0]
                if op == "Expand":
                    tgt = tuple(int(v) for v in ins[1].ints.reshape(-1))
                    tgt = np.broadcast_shapes(src.shape, tgt)
                    idx = ops._broadcast_indices(src.shape, tgt)
                    out = ops.reindex(src, idx, tgt)
                else:
                    reps = tuple(int(v) for v in ins[1].ints.reshape(-1))
                    idx = np.tile(np.arange(src.ints.size).reshape(src.shape), reps)
                    out = ops.reindex(src, idx.reshape(-1), idx.shape)
            elif op == "ReduceMax":
                out = self._reduce_max(ctx, node, ins, values)
            elif op == "Clip":
                lo = float(ins[1].ints.reshape(-1)[0]) / (1 << ins[1].scale) if len(ins) > 1 else node.attrs.get("min", -np.inf)
                hi = float(ins[2].ints.reshape(-1)[0]) / (1 << ins[2].scale) if len(ins) > 2 else node.attrs.get("max", np.inf)
                out = ops.lookup_fn(ctx, f"clip{lo}_{hi}", ins[0],
                                    lambda x: np.clip(x, lo, hi),
                                    ins[0].scale, ins[0].scale, ra.lookup_range)
            else:
                raise NotImplementedError(f"op {op} not yet supported")
            values[node.outputs[0]] = out

        outputs = [values[o.name] for o in g.outputs]
        # place any output that is still a bare constant
        for tv in outputs:
            ctx.materialize(tv)
        return outputs

    # -- op helpers ---------------------------------------------------------

    def _matmul(self, ctx, a: TVal, b: TVal) -> TVal:
        """Route matmul to Freivalds (phase-2 RLC) or base-op dots —
        the reference's strategy choice (`chip/einsum/analysis.rs:170-198`)."""
        from .modules import get_freivalds
        from ezkl_tpu.graph.quantize import check_range

        use_fre = False
        if (not self.run_args.disable_freivalds
                and a.ints.ndim == 2 and b.ints.ndim == 2):
            M, K = a.ints.shape
            N = b.ints.shape[1]
            base_rows = M * N * K
            fre_rows = K * N + M * N + M * K
            use_fre = base_rows > 2 * fre_rows and base_rows > 512
        if not use_fre:
            return ops.matmul(ctx, a, b)
        mod = get_freivalds(ctx.cfg)
        out_ints = check_range(a.ints @ b.ints)
        span = mod.matmul(ctx, a, b, out_ints)
        return TVal(out_ints, a.scale + b.scale, span)

    def _conv(self, ctx, node, ins, rebase):
        ra = self.run_args
        x, w = ins[0], ins[1]
        bias = ins[2] if len(ins) > 2 else None
        if node.attrs.get("group", 1) != 1:
            raise NotImplementedError("grouped conv not yet supported")
        if any(d != 1 for d in node.attrs.get("dilations", [1, 1])):
            raise NotImplementedError("dilated conv not yet supported")
        strides = tuple(node.attrs.get("strides", [1, 1]))
        pads = node.attrs.get("pads", [0, 0, 0, 0])
        padding = (pads[0], pads[1], pads[2], pads[3])
        if bias is not None and bias.span is None:
            orig = bias.ints.astype(np.float64) / (1 << bias.scale)
            bias = TVal(quantize(orig, x.scale + w.scale), x.scale + w.scale, None)
        out = ops.conv2d(ctx, x, w, bias, strides, padding, ra.lookup_range,
                         matmul_fn=self._matmul)
        return rebase(out)

    def _pool(self, ctx, node, ins, rebase):
        ra = self.run_args
        x = ins[0]
        if node.op_type == "GlobalAveragePool":
            kernel = (x.shape[2], x.shape[3])
            strides = (1, 1)
            pads = (0, 0, 0, 0)
        else:
            kernel = tuple(node.attrs.get("kernel_shape"))
            strides = tuple(node.attrs.get("strides", [1, 1]))
            p = node.attrs.get("pads", [0, 0, 0, 0])
            pads = (p[0], p[1], p[2], p[3])
        if node.op_type == "MaxPool":
            return ops.maxpool2d(ctx, x, kernel, strides, pads, ra.lookup_range)
        s = ops.sumpool2d(ctx, x, kernel, strides, pads)
        area = kernel[0] * kernel[1]
        return ops.div_known(ctx, s, area, s.scale)

    def _slice(self, ctx, node, ins, values):
        src = ins[0]
        if len(node.inputs) > 1:
            starts = values[node.inputs[1]].ints.reshape(-1).tolist()
            ends = values[node.inputs[2]].ints.reshape(-1).tolist()
            axes = (values[node.inputs[3]].ints.reshape(-1).tolist()
                    if len(node.inputs) > 3 else list(range(len(starts))))
            steps = (values[node.inputs[4]].ints.reshape(-1).tolist()
                     if len(node.inputs) > 4 else [1] * len(starts))
        else:
            starts = node.attrs.get("starts")
            ends = node.attrs.get("ends")
            axes = node.attrs.get("axes", list(range(len(starts))))
            steps = [1] * len(starts)
        slicer = [slice(None)] * src.ints.ndim
        for st, en, ax, sp in zip(starts, ends, axes, steps):
            slicer[ax] = slice(st, None if en >= 2**31 else en, sp)
        idx = np.arange(src.ints.size).reshape(src.shape)[tuple(slicer)]
        return ops.reindex(src, idx.reshape(-1), idx.shape)

    def _pad(self, ctx, node, ins, values):
        src = ins[0]
        if len(node.inputs) > 1:
            p = values[node.inputs[1]].ints.reshape(-1).tolist()
        else:
            p = node.attrs.get("pads")
        nd = src.ints.ndim
        pads = tuple((p[i], p[i + nd]) for i in range(nd))
        return ops.pad(ctx, src, pads)

    def _div(self, ctx, node, ins, rebase):
        ra = self.run_args
        a, b = ins[0], ins[1]
        if b.span is None and b.ints.size == 1:
            # constant divisor d: x/d = x * round(2^s/d) / 2^s — one const
            # mul then a claimed-quotient rebase (no table-range limits)
            d = float(b.ints.reshape(-1)[0]) / (1 << b.scale)
            s = ra.param_scale
            mul_c = TVal(np.asarray([round((1 << s) / d)], np.int64), s, None)
            prod = ops.pairwise(ctx, "mul", a, mul_c)
            return ops.div_rebase(ctx, prod, prod.scale - a.scale)
        inv = ops.lookup_fn(ctx, "recip", b,
                            lambda x: np.where(x == 0, 0.0, 1.0 / x),
                            b.scale, 2 * ra.input_scale, ra.lookup_range)
        return rebase(ops.pairwise(ctx, "mul", a, inv))

    def _reduce(self, ctx, node, ins, values, mean: bool):
        ra = self.run_args
        src = ins[0]
        axes = node.attrs.get("axes")
        if axes is None and len(node.inputs) > 1:
            axes = values[node.inputs[1]].ints.reshape(-1).tolist()
        if axes is None:
            axes = list(range(src.ints.ndim))
        axes = [a % src.ints.ndim for a in axes]
        keep = [i for i in range(src.ints.ndim) if i not in axes]
        perm = keep + axes
        moved = ops.transpose(ctx, src, perm)
        out_shape = tuple(src.shape[i] for i in keep)
        runs = int(np.prod(out_shape, dtype=np.int64)) or 1
        rl = int(moved.ints.size // runs)
        flat = TVal(moved.ints.reshape(runs, rl), moved.scale, moved.span)
        out = ops.einsum(ctx, "rk->r", flat)
        out = TVal(out.ints.reshape(out_shape), out.scale,
                   out.span)
        if mean:
            out = ops.div_known(ctx, out, rl, out.scale)
        keepdims = node.attrs.get("keepdims", 1)
        if keepdims:
            shp = list(src.shape)
            for a in axes:
                shp[a] = 1
            out = TVal(out.ints.reshape(shp), out.scale, out.span)
        return out

    def _reduce_max(self, ctx, node, ins, values):
        """ReduceMax via iterated pairwise max along the reduced axes."""
        ra = self.run_args
        src = ins[0]
        axes = node.attrs.get("axes")
        if axes is None and len(node.inputs) > 1:
            axes = values[node.inputs[1]].ints.reshape(-1).tolist()
        if axes is None:
            axes = list(range(src.ints.ndim))
        axes = [a % src.ints.ndim for a in axes]
        keep = [i for i in range(src.ints.ndim) if i not in axes]
        perm = keep + axes
        moved = ops.transpose(ctx, src, perm)
        out_shape = tuple(src.shape[i] for i in keep)
        runs = int(np.prod(out_shape, dtype=np.int64)) or 1
        rl = int(moved.ints.size // runs)
        flat = TVal(moved.ints.reshape(runs, rl), moved.scale, moved.span)
        acc = ops.reindex(flat, np.arange(runs) * rl, (runs,))
        for j in range(1, rl):
            elem = ops.reindex(flat, np.arange(runs) * rl + j, (runs,))
            acc = ops.pairwise_max(ctx, acc, elem, ra.lookup_range)
        out = TVal(acc.ints.reshape(out_shape), acc.scale, acc.span)
        if node.attrs.get("keepdims", 1):
            shp = list(src.shape)
            for a in axes:
                shp[a] = 1
            out = TVal(out.ints.reshape(shp), out.scale, out.span)
        return out

    def _batchnorm(self, ctx, node, ins, align):
        """Fold BN into a constant affine: y = x*gn + bn (host-folded)."""
        ra = self.run_args
        x, gamma, beta, mean, var = ins
        eps = node.attrs.get("epsilon", 1e-5)
        def fl(tv):
            return tv.ints.astype(np.float64) / (1 << tv.scale)
        g, b, m, v = fl(gamma), fl(beta), fl(mean), fl(var)
        scale_f = g / np.sqrt(v + eps)
        shift_f = b - m * scale_f
        shp = (1, -1) + (1,) * (x.ints.ndim - 2)
        sc = TVal(quantize(scale_f.reshape(shp), ra.param_scale), ra.param_scale, None)
        sh = TVal(quantize(shift_f.reshape(shp), x.scale + ra.param_scale),
                  x.scale + ra.param_scale, None)
        prod = ops.pairwise(ctx, "mul", x, sc)
        a2, b2 = align(prod, sh)
        return ops.pairwise(ctx, "add", a2, b2)


def _erf(x):
    import math
    return np.vectorize(math.erf)(np.asarray(x, np.float64))


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


def _softmax(ctx, a: TVal, ra: RunArgs, axis: int = -1) -> TVal:
    """softmax = exp lookup -> per-slice sum -> recip lookup -> mul
    (reference `layouts.rs:6687`)."""
    nd = a.ints.ndim
    axis = axis % nd
    perm = [i for i in range(nd) if i != axis] + [axis]
    moved = ops.transpose(ctx, a, perm)
    rl = a.shape[axis]
    runs = int(a.ints.size // rl)
    flat = TVal(moved.ints.reshape(runs, rl), moved.scale, moved.span)
    ex = ops.exp_op(ctx, flat, ra.input_scale, ra.lookup_range)
    denom = ops.einsum(ctx, "rk->r", ex)
    inv = ops.lookup_fn(
        ctx, "recip", denom, lambda x: np.where(x == 0, 0.0, 1.0 / x),
        denom.scale, 2 * ra.input_scale, ra.lookup_range)
    inv2 = TVal(inv.ints.reshape(runs, 1), inv.scale, inv.span)
    prod = ops.pairwise(ctx, "mul", ex, inv2)
    out = ops.div_rebase(ctx, prod, prod.scale - ra.input_scale, ra.lookup_range)
    # undo the transpose
    inv_perm = np.argsort(perm)
    shaped = TVal(out.ints.reshape(tuple(a.shape[p] for p in perm)),
                  out.scale, out.span)
    return ops.transpose(ctx, shaped, inv_perm.tolist())
