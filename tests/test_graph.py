"""Graph layer: ONNX -> settings/witness/mock on reference example models.

Mirror of the reference's `mock_*` integration flows
(SURVEY.md §4 tier 2, tests/integration_tests.rs).
"""

import json
import pathlib

import numpy as np
import pytest

from ezkl_tpu.graph.circuit import GraphCircuit
from ezkl_tpu.graph.run_args import RunArgs

REF = pathlib.Path("/root/reference/examples/onnx")

needs_ref = pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")


def load_example(name):
    inp = json.loads((REF / name / "input.json").read_text())
    return str(REF / name / "network.onnx"), inp


@needs_ref
def test_1l_relu_witness_and_mock():
    path, inp = load_example("1l_relu")
    ra = RunArgs(input_scale=4, param_scale=4, lookup_range=(-512, 512), logrows=11)
    gc = GraphCircuit.from_onnx(path, ra)
    x = np.array(inp["input_data"][0], dtype=np.float64).reshape(
        gc.model.input_shapes()[0])
    s = gc.gen_settings([x])
    assert "relu_si4_so4_r-512_512" in s.required_lookups
    w = gc.gen_witness([x])
    got = np.array(w["pretty_elements"]["rescaled_outputs"][0])
    want = np.array(inp["output_data"][0])
    assert np.allclose(got, want, atol=0.1)
    assert gc.mock_prove([x]) == []


@needs_ref
def test_1l_mlp_exact_outputs():
    path, inp = load_example("1l_mlp")
    ra = RunArgs(input_scale=6, param_scale=6, lookup_range=(-8192, 8192))
    gc = GraphCircuit.from_onnx(path, ra)
    x = np.array(inp["input_data"][0], dtype=np.float64).reshape(
        gc.model.input_shapes()[0])
    gc.gen_settings([x])
    w = gc.gen_witness([x])
    got = np.array(w["pretty_elements"]["rescaled_outputs"][0])
    want = np.array(inp["output_data"][0])
    assert np.allclose(got, want, atol=1e-6), (got, want)
    assert gc.mock_prove([x]) == []


@needs_ref
def test_mock_catches_bad_instance():
    path, inp = load_example("1l_relu")
    ra = RunArgs(input_scale=4, param_scale=4, lookup_range=(-512, 512), logrows=11)
    gc = GraphCircuit.from_onnx(path, ra)
    x = np.array(inp["input_data"][0], dtype=np.float64).reshape(
        gc.model.input_shapes()[0])
    gc.gen_settings([x])
    cfg, ctx, _ = gc.forward([x])
    ctx.instance_vals[0] = (ctx.instance_vals[0] + 1)
    from ezkl_tpu.plonk import mock
    fails = mock.verify(ctx.finalize())
    assert any(f.kind == "copy" for f in fails)


@needs_ref
@pytest.mark.parametrize("name,ra_kwargs", [
    ("tril", dict(input_scale=4, param_scale=4, lookup_range=(-512, 512))),
    ("boolean", dict(input_scale=4, param_scale=4, lookup_range=(-512, 512))),
    ("hard_max", dict(input_scale=4, param_scale=4, lookup_range=(-1024, 1024))),
    ("1l_topk", dict(input_scale=4, param_scale=4, lookup_range=(-1024, 1024))),
])
def test_new_op_witness_and_mock(name, ra_kwargs):
    """Ops added for corpus parity: Trilu, bool inputs + logicals,
    ArgMax (claimed-index), TopK (iterative extraction)."""
    path, inp = load_example(name)
    gc = GraphCircuit.from_onnx(path, RunArgs(**ra_kwargs))
    shapes = gc.model.input_shapes()
    arrays = [np.asarray(x, np.float64).reshape(s)
              for x, s in zip(inp["input_data"], shapes)]
    gc.gen_settings(arrays)
    w = gc.gen_witness(arrays)
    assert w["max_row"] > 0
    assert gc.mock_prove(arrays) == []


def test_settings_roundtrip():
    from ezkl_tpu.graph.circuit import GraphSettings
    ra = RunArgs(input_scale=5)
    s = GraphSettings(run_args=ra, num_rows=10, total_assignments=10,
                      model_input_scales=[5], model_output_scales=[5],
                      model_instance_shapes=[[1, 3]],
                      required_lookups=["relu"])
    s2 = GraphSettings.from_json(s.to_json())
    assert s2.run_args.input_scale == 5
    assert s2.model_instance_shapes == [[1, 3]]
