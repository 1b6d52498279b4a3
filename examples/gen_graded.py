"""Generate the graded-config example models (BASELINE.md configs 2-4).

The reference ships these as hand-built Rust circuits / ONNX files:
  - config 2: `mlp_4d_einsum` (`/root/reference/examples/mlp_4d_einsum.rs:15`,
    K=15): a columnar ReLU MLP — input(4) -> affine 4x4 -> relu -> affine
    4x4 -> relu, public output.
  - config 3: `conv2d_mnist` (`/root/reference/examples/conv2d_mnist/
    main.rs:294-308`, K=20): 1x28x28 image -> conv(4ch, 5x5, stride 2,
    no pad) -> relu -> sumpool 2x2 -> flatten -> affine -> 10 classes.
  - config 4: MobileNet-class k~20 model (the reference corpus ships
    `examples/onnx/mobilenet`).

The image has no `onnx` package, so models are serialized with the
in-repo protobuf writer (`ezkl_tpu.graph.onnx_writer`). Weights are
seeded random (the reference's examples also use random weights —
`mlp_4d_einsum.rs` main(), OsRng).

Usage: python examples/gen_graded.py <outdir>
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from ezkl_tpu.graph import onnx_writer as w  # noqa: E402


def gen_mlp_4d(outdir: pathlib.Path):
    rng = np.random.default_rng(42)
    w0 = rng.uniform(-1, 1, (4, 4)).astype(np.float32)
    b0 = rng.uniform(-0.5, 0.5, (4,)).astype(np.float32)
    w1 = rng.uniform(-1, 1, (4, 4)).astype(np.float32)
    b1 = rng.uniform(-0.5, 0.5, (4,)).astype(np.float32)
    nodes = [
        w.node("Gemm", ["x", "w0", "b0"], ["h0"], name="l0"),
        w.node("Relu", ["h0"], ["a0"], name="relu0"),
        w.node("Gemm", ["a0", "w1", "b1"], ["h1"], name="l1"),
        w.node("Relu", ["h1"], ["y"], name="relu1"),
    ]
    w.save(outdir / "mlp_4d.onnx", nodes, {"x": (1, 4)}, {"y": (1, 4)},
           {"w0": w0.T.copy(), "b0": b0, "w1": w1.T.copy(), "b1": b1})
    x = rng.uniform(-1, 1, (1, 4)).astype(np.float64)
    (outdir / "mlp_4d_input.json").write_text(
        json.dumps({"input_data": [x.reshape(-1).tolist()]}))


def gen_conv2d_mnist(outdir: pathlib.Path):
    rng = np.random.default_rng(7)
    # conv: 4 out-channels, 1 in-channel, 5x5 kernel, stride 2, no padding
    k = rng.uniform(-0.3, 0.3, (4, 1, 5, 5)).astype(np.float32)
    kb = rng.uniform(-0.1, 0.1, (4,)).astype(np.float32)
    # 28x28 -> conv s2 -> 12x12 -> sumpool 2x2 s1 -> 11x11; LEN = 4*11*11
    fcw = rng.uniform(-0.2, 0.2, (4 * 11 * 11, 10)).astype(np.float32)
    fcb = rng.uniform(-0.1, 0.1, (10,)).astype(np.float32)
    nodes = [
        w.node("Conv", ["x", "k", "kb"], ["c0"], name="conv",
               kernel_shape=[5, 5], strides=[2, 2], pads=[0, 0, 0, 0]),
        w.node("Relu", ["c0"], ["a0"], name="relu0"),
        # reference SumPool 2x2 stride 1 == AveragePool * 4; the affine
        # weights absorb the constant factor so AveragePool is equivalent
        w.node("AveragePool", ["a0"], ["p0"], name="pool",
               kernel_shape=[2, 2], strides=[1, 1]),
        w.node("Flatten", ["p0"], ["f0"], name="flat"),
        w.node("Gemm", ["f0", "fcw", "fcb"], ["y"], name="fc"),
    ]
    w.save(outdir / "conv2d_mnist.onnx", nodes,
           {"x": (1, 1, 28, 28)}, {"y": (1, 10)},
           {"k": k, "kb": kb, "fcw": fcw, "fcb": fcb})
    # MNIST-style input: pixels quantized to [0, 16) like the reference's
    # `trn_img / 16` (conv2d_mnist/main.rs:329)
    x = (rng.integers(0, 256, (1, 1, 28, 28)) // 16).astype(np.float64)
    (outdir / "conv2d_mnist_input.json").write_text(
        json.dumps({"input_data": [x.reshape(-1).tolist()]}))


def main():
    outdir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else ".")
    outdir.mkdir(parents=True, exist_ok=True)
    gen_mlp_4d(outdir)
    gen_conv2d_mnist(outdir)
    print(f"wrote mlp_4d + conv2d_mnist to {outdir}")


if __name__ == "__main__":
    main()
