"""File-API pipeline tests (settings -> compile -> witness -> mock) in a
tempdir — the CLI-parity layer without the expensive prove step."""

import json
import pathlib
import shutil

import numpy as np
import pytest

from ezkl_tpu import api
from ezkl_tpu.graph.run_args import RunArgs

REF = pathlib.Path("/root/reference/examples/onnx/1l_relu")
needs_ref = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


@needs_ref
def test_pipeline_files(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    shutil.copy(REF / "network.onnx", "network.onnx")
    shutil.copy(REF / "input.json", "input.json")
    ra = RunArgs(input_scale=4, param_scale=4, lookup_range=(-512, 512),
                 logrows=11)
    s = api.gen_settings("network.onnx", "settings.json", ra)
    assert pathlib.Path("settings.json").exists()
    api.compile_circuit("network.onnx", "settings.json", "model.compiled")
    w = api.gen_witness("model.compiled", "input.json", "witness.json")
    assert pathlib.Path("witness.json").exists()
    outs = w["pretty_elements"]["rescaled_outputs"][0]
    want = json.loads((REF / "input.json").read_text())["output_data"][0]
    assert np.allclose(outs, want, atol=0.1)
    assert api.mock("model.compiled", "input.json")


@needs_ref
def test_onnx_e2e_prove_verify_tamper(tmp_path, monkeypatch):
    """Full ONNX file-API pipeline THROUGH prove (the reference's
    accuracy_measurement_prove flow, `tests/integration_tests.rs`):
    settings -> compile -> srs -> witness -> setup -> prove -> verify,
    plus a tampered-proof rejection. k=10 keeps the prove affordable and
    exercises the multi-chunk lookup table (1025-row relu table over
    ~1017 usable rows)."""
    monkeypatch.chdir(tmp_path)
    shutil.copy(REF / "network.onnx", "network.onnx")
    shutil.copy(REF / "input.json", "input.json")
    ra = RunArgs(input_scale=4, param_scale=4, lookup_range=(-512, 512),
                 logrows=10)
    api.gen_settings("network.onnx", "settings.json", ra)
    api.compile_circuit("network.onnx", "settings.json", "model.compiled")
    api.gen_srs("kzg.srs", 10)
    api.gen_witness("model.compiled", "input.json", "witness.json")
    api.setup("model.compiled", "input.json", srs_path="kzg.srs")
    api.prove("model.compiled", "input.json", pk_path="pk.key",
              srs_path="kzg.srs", proof_path="proof.json")
    assert api.verify("proof.json", "vk.key", srs_path="kzg.srs")
    pj = json.loads(pathlib.Path("proof.json").read_text())
    klabel = sorted(pj["evals"])[0]
    pj["evals"][klabel] = hex(int(pj["evals"][klabel], 16) ^ 1)
    pathlib.Path("proof_bad.json").write_text(json.dumps(pj))
    assert not api.verify("proof_bad.json", "vk.key", srs_path="kzg.srs")


@needs_ref
def test_gen_random_data_and_table(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    shutil.copy(REF / "network.onnx", "network.onnx")
    d = api.gen_random_data("network.onnx", "rand.json", seed=3)
    assert pathlib.Path("rand.json").exists()
    assert len(d["input_data"]) == 1
    t = api.table("network.onnx")
    assert "Relu" in t


def test_poseidon_hash_api():
    assert api.poseidon_hash([1, 2, 3]) == api.poseidon_hash([1, 2, 3])
    assert api.poseidon_hash([1]) != api.poseidon_hash([2])


def test_input_polymorphism_bool_field(tmp_path):
    """FileSourceInner{Float,Bool,Field} analog (reference input.rs:25-168):
    bools -> 0/1, 0x-hex felts -> signed int de-scaled by input scale."""
    import json
    from ezkl_tpu.api import _load_input
    from ezkl_tpu.fieldmath.spec import bn254_fr
    p = bn254_fr().modulus
    neg3_felt = hex(p - 3 * 4)  # -3.0 at scale 2, as a field element
    d = {"input_data": [[1.5, True, False, neg3_felt]]}
    f = tmp_path / "input.json"
    f.write_text(json.dumps(d))
    (arr,) = _load_input(f, scales=[2])
    assert arr.tolist() == [1.5, 1.0, 0.0, -3.0]
