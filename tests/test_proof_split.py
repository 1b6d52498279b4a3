"""Proof splitting end-to-end: a model cut into two circuits linked by a
shared KZG commitment on the boundary tensor.

Reference flow: `ProofSplitCommit` + `swap_proof_commitments`
(`/root/reference/src/pfsys/mod.rs:317-373,492-554`, proof_splitting
notebook): part 1 commits its OUTPUT (kzgcommit visibility), part 2 commits
its INPUT; the two commitments are byte-identical iff the tensors agree, so
verifying both proofs + comparing the commitment links the computation.
"""

import json
import pathlib

import numpy as np
import pytest

from ezkl_tpu.graph.circuit import GraphCircuit
from ezkl_tpu.graph.run_args import RunArgs
from ezkl_tpu.graph import onnx_writer as w
from ezkl_tpu.plonk import srs as srsmod


@pytest.fixture(scope="module")
def split_models(tmp_path_factory):
    d = tmp_path_factory.mktemp("split")
    # part 1: h = Relu(x); part 2: y = Relu(h) (same scale across the cut)
    w.save(d / "part1.onnx", [w.node("Relu", ["x"], ["h"], name="r1")],
           {"x": (1, 4)}, {"h": (1, 4)}, {})
    w.save(d / "part2.onnx", [w.node("Relu", ["h"], ["y"], name="r2")],
           {"h": (1, 4)}, {"y": (1, 4)}, {})
    return d


def _pipeline(model_path, x, iv, ov):
    ra = RunArgs(input_scale=2, param_scale=2, lookup_range=(-64, 64),
                 decomp_base=32, input_visibility=iv, output_visibility=ov)
    gc = GraphCircuit.from_onnx(str(model_path), ra)
    gc.gen_settings([x])
    srs = srsmod.get_or_create(gc.run_args.logrows)
    wit = gc.gen_witness([x], srs=srs)
    proof, pk = gc.prove([x], srs)
    assert gc.verify(pk.vk, srs, proof)
    return gc, wit, proof, pk, srs


def test_split_proofs_link_via_commitment(split_models):
    x = np.array([[0.75, -0.5, 1.25, 0.25]])
    gc1, w1, p1, pk1, srs1 = _pipeline(split_models / "part1.onnx", x,
                                       "private", "kzgcommit")
    # feed part 2 the dequantized boundary tensor (exact at matching scale)
    h = np.array(w1["pretty_elements"]["rescaled_outputs"][0]).reshape(1, 4)
    gc2, w2, p2, pk2, srs2 = _pipeline(split_models / "part2.onnx", h,
                                       "kzgcommit", "public")
    c_out = w1["processed_commitments"]["polycommit"]
    c_in = w2["processed_commitments"]["polycommit"]
    assert len(c_out) == 1 and len(c_in) == 1
    # the LINK: part1's output commitment == part2's input commitment
    assert [int(v, 16) for v in c_out[0]] == [int(v, 16) for v in c_in[0]]
    # and each proof carries that commitment in its advice (swap no-op)
    for proof, wit in ((p1, w1), (p2, w2)):
        pj = json.loads(proof.to_json())
        pc = wit["processed_commitments"]
        for idx, comm in zip(pc["advice_indices"], pc["polycommit"]):
            got = pj["advice"][idx]
            assert int(got[0], 16) == int(comm[0], 16)
            assert int(got[1], 16) == int(comm[1], 16)


def test_split_link_breaks_on_different_boundary(split_models):
    x = np.array([[0.75, -0.5, 1.25, 0.25]])
    _, w1, _, _, _ = _pipeline(split_models / "part1.onnx", x,
                               "private", "kzgcommit")
    h_bad = np.array(w1["pretty_elements"]["rescaled_outputs"][0]).reshape(1, 4)
    h_bad[0, 0] += 0.25                   # one quantization step off
    _, w2, _, _, _ = _pipeline(split_models / "part2.onnx", h_bad,
                               "kzgcommit", "public")
    c_out = w1["processed_commitments"]["polycommit"][0]
    c_in = w2["processed_commitments"]["polycommit"][0]
    assert [int(v, 16) for v in c_out] != [int(v, 16) for v in c_in]


def test_split_model_api(tmp_path):
    """api.split_model cuts a sequential model at a single-tensor boundary;
    parts compose to the original under the float forward."""
    from ezkl_tpu import api
    from ezkl_tpu.graph.model import Model, forward_float
    d = tmp_path
    r = np.random.default_rng(3)
    w0 = r.uniform(-1, 1, (4, 4)).astype(np.float32)
    w1 = r.uniform(-1, 1, (4, 4)).astype(np.float32)
    w.save(d / "mlp.onnx",
           [w.node("Gemm", ["x", "w0"], ["h0"], name="g0"),
            w.node("Relu", ["h0"], ["a0_"], name="r0"),
            w.node("Gemm", ["a0_", "w1"], ["h1"], name="g1"),
            w.node("Relu", ["h1"], ["y"], name="r1")],
           {"x": (1, 4)}, {"y": (1, 4)},
           {"w0": w0.T.copy(), "w1": w1.T.copy()})
    x = r.uniform(-1, 1, (1, 4))
    (d / "input.json").write_text(json.dumps(
        {"input_data": [x.reshape(-1).tolist()]}))
    parts = api.split_model(str(d / "mlp.onnx"), str(d / "input.json"),
                            parts=2)
    assert len(parts) == 2
    (p0, in0, out0), (p1, in1, out1) = parts
    assert out0 == in1, "boundary tensor must link the parts"
    m_full = Model.load(str(d / "mlp.onnx"), RunArgs())
    m0 = Model.load(p0, RunArgs())
    m1 = Model.load(p1, RunArgs())
    want = forward_float(m_full, [x])[0]
    mid = forward_float(m0, [x])[0]
    got = forward_float(m1, [mid])[0]
    assert np.allclose(got, want)
