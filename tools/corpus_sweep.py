#!/usr/bin/env python
"""Sweep the reference ONNX example corpus: parse -> settings -> witness ->
mock; compare rescaled outputs to the example's recorded output_data.

The single-process analog of the reference's mock test matrix + accuracy
gate (`tests/integration_tests.rs` + `tests/output_comparison.py`,
SURVEY.md §4). Usage: python tools/corpus_sweep.py [model ...]
"""

import json
import os
import pathlib
import sys
import traceback

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import ezkl_tpu  # noqa: E402
jax.config.update("jax_compilation_cache_dir", ezkl_tpu.cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from ezkl_tpu.graph.circuit import GraphCircuit  # noqa: E402
from ezkl_tpu.graph.run_args import RunArgs  # noqa: E402

REF = pathlib.Path("/root/reference/examples/onnx")

DEFAULT_MODELS = [
    "1l_relu", "1l_sigmoid", "1l_tanh", "1l_leakyrelu", "1l_erf", "1l_sqrt",
    "1l_identity", "1l_reshape", "1l_flatten", "1l_linear", "1l_mlp",
    "1l_average", "1l_div", "1l_pad", "1l_slice", "1l_concat",
    "1l_batch_norm", "1l_conv", "1l_max_pool", "1l_softmax",
    "1l_mean", "1l_powf", "2l_relu_small", "2l_relu_sigmoid_small",
    "2l_sigmoid_small", "2l_relu_fc", "1l_where", "exp", "clip",
    "3l_relu_conv_fc", "1l_average", "2l_relu_sigmoid_conv", "4l_relu_conv_fc",
    "2l_relu_sigmoid", "1l_conv_transpose", "1l_upsample", "1l_prelu",
    "1l_elu", "1l_gelu_noappx", "1l_downsample", "1l_var",
]


# the reference CI-gates mean error vs onnxruntime at 2.6%
# (`tests/integration_tests.rs:385`, `tests/output_comparison.py`)
ERR_GATE = 0.026


def run_one(name: str, check_mock=True, ra=None):
    d = REF / name
    inp = json.loads((d / "input.json").read_text())
    ra = ra or RunArgs(input_scale=7, param_scale=7,
                       lookup_range=(-32768, 32768), logrows=17)
    gc = GraphCircuit.from_onnx(str(d / "network.onnx"), ra)
    shapes = gc.model.input_shapes()
    arrays = [np.asarray(x, np.float64).reshape(s)
              for x, s in zip(inp["input_data"], shapes)]
    st = gc.gen_settings(arrays)
    w = gc.gen_witness(arrays)
    got = np.concatenate([np.asarray(o, np.float64).reshape(-1)
                          for o in w["pretty_elements"]["rescaled_outputs"]])
    err = None
    if inp.get("output_data") is not None:
        want = np.concatenate([np.asarray(o, np.float64).reshape(-1)
                               for o in inp["output_data"]])
        if want.size == got.size:
            denom = np.maximum(np.abs(want), 1.0)
            err = float(np.mean(np.abs(got - want) / denom))
    mock_ok = None
    if check_mock:
        mock_ok = not gc.mock_prove(arrays)
    return dict(rows=st.num_rows, k=st.run_args.logrows, err=err, mock=mock_ok)


def calibrated_retry(name: str, check_mock: bool):
    """Scale-grid retry for models over the accuracy gate (the sweep-side
    analog of api.calibrate_settings with target=accuracy)."""
    best = None
    for s in (8, 9, 10, 11):
        span = max(2 ** (s + 5), 1 << 14)
        ra = RunArgs(input_scale=s, param_scale=s,
                     lookup_range=(-span, span), logrows=17)
        try:
            r = run_one(name, check_mock=check_mock, ra=ra)
        except Exception:
            continue
        if r["err"] is not None and (best is None or r["err"] < best["err"]):
            best = dict(r, input_scale=s)
        if best and best["err"] < ERR_GATE:
            break
    return best


def all_models():
    """Every reference example dir with real model+input files."""
    out = []
    for d in sorted(REF.iterdir()):
        if (d / "network.onnx").exists() and (d / "input.json").exists():
            out.append(d.name)
    return out


def main():
    models = [a for a in sys.argv[1:] if not a.startswith("-")] or DEFAULT_MODELS
    if "--all" in sys.argv:
        models = all_models()
    check_mock = "--no-mock" not in sys.argv
    gate = "--no-gate" not in sys.argv
    results = {}
    for name in models:
        try:
            r = run_one(name, check_mock=check_mock)
            if r["err"] is not None and r["err"] >= ERR_GATE:
                cal = calibrated_retry(name, check_mock)
                if cal is not None and cal["err"] < r["err"]:
                    cal["calibrated"] = True
                    r = cal
            bad_err = r["err"] is not None and r["err"] >= ERR_GATE
            bad_mock = r["mock"] is False
            tag = "FAIL" if (bad_err or bad_mock) else "OK  "
            print(f"{tag} {name:28s} rows={r['rows']:<7d} k={r['k']:<3d} "
                  f"err={r['err'] if r['err'] is None else round(r['err'], 5)} "
                  f"mock={r['mock']}"
                  f"{' (calibrated s=' + str(r['input_scale']) + ')' if r.get('calibrated') else ''}",
                  flush=True)
            results[name] = r
        except Exception as e:
            print(f"FAIL {name:28s} {type(e).__name__}: {e}", flush=True)
            if "-v" in sys.argv:
                traceback.print_exc()
            results[name] = dict(error=str(e))
        # incremental flush: a timeout mid-sweep still leaves a fresh report
        report = pathlib.Path(__file__).resolve().parent / "corpus_report.json"
        report.write_text(json.dumps(results, indent=1, default=str))
    ok = sum(1 for r in results.values() if "error" not in r)
    failures = [n for n, r in results.items()
                if "error" in r
                or (r.get("err") is not None and r["err"] >= ERR_GATE)
                or r.get("mock") is False]
    print(f"\n{ok}/{len(results)} models ran; "
          f"{len(failures)} over the {ERR_GATE} accuracy/mock gate"
          + (f": {failures}" if failures else ""))
    if gate and failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
