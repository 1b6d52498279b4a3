"""Visibility matrix sweep (reference `tests/integration_tests.rs:421-606`
mock_* combos over public/private/fixed/hashed/kzgcommit x
input/param/output) + a kzgcommit prove/verify/swap roundtrip."""

import json
import pathlib

import numpy as np
import pytest

from ezkl_tpu.graph.circuit import GraphCircuit
from ezkl_tpu.graph.run_args import RunArgs

REF = pathlib.Path("/root/reference/examples/onnx")
needs_ref = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


def make_gc(iv, ov, pv, model="1l_mlp"):
    # 1l_mlp: Gemm(weights+bias initializers) + Relu — exercises params
    ra = RunArgs(input_scale=2, param_scale=2, lookup_range=(-64, 64),
                 decomp_base=32,       # small digit table keeps test k small
                 input_visibility=iv, output_visibility=ov,
                 param_visibility=pv)
    gc = GraphCircuit.from_onnx(str(REF / model / "network.onnx"), ra)
    inp = json.loads((REF / model / "input.json").read_text())
    x = np.array(inp["input_data"][0], np.float64).reshape(
        gc.model.input_shapes()[0])
    return gc, x


MATRIX = [
    # (input, output, param) — the reference's visibility combos
    ("private", "public", "fixed"),
    ("public", "public", "fixed"),
    ("hashed", "public", "fixed"),
    ("kzgcommit", "public", "fixed"),
    ("private", "hashed", "fixed"),
    ("private", "kzgcommit", "fixed"),
    ("private", "public", "hashed"),
    ("private", "public", "kzgcommit"),
    ("hashed", "hashed", "hashed"),
    ("kzgcommit", "kzgcommit", "kzgcommit"),
    ("public", "private", "fixed"),
]


@needs_ref
@pytest.mark.parametrize("iv,ov,pv", MATRIX)
def test_visibility_matrix_mock(iv, ov, pv):
    gc, x = make_gc(iv, ov, pv)
    s = gc.gen_settings([x])
    assert gc.mock_prove([x]) == [], (iv, ov, pv)
    # structural expectations
    cfg, ctx, outputs = gc.forward([x])
    n_inst = len(ctx.instance_vals)
    if iv == "hashed":
        assert n_inst >= 1
    n_pc = len(cfg.polycommit_cols)
    expected_pc = (iv == "kzgcommit") + (ov == "kzgcommit") * len(outputs) \
        + (pv == "kzgcommit") * len(ctx._param_tvals)
    assert n_pc == expected_pc, (iv, ov, pv, n_pc, expected_pc)
    for col in cfg.polycommit_cols:
        assert cfg.cs.advice_unblinded[col.index]


@needs_ref
def test_kzgcommit_prove_verify_swap(tmp_path, monkeypatch):
    """Prove with kzgcommit params; the unblinded column commitment in the
    proof equals the witness's native KZG commitment (swap is a no-op and
    the proof still verifies); a mismatched commitment breaks verification."""
    monkeypatch.chdir(tmp_path)
    from ezkl_tpu.plonk import srs as srsmod
    gc, x = make_gc("private", "public", "kzgcommit")
    s = gc.gen_settings([x])
    k = s.run_args.logrows
    srs = srsmod.get_or_create(k)
    w = gc.gen_witness([x], srs=srs)
    assert "processed_commitments" in w
    proof, pk = gc.prove([x], srs)
    assert gc.verify(pk.vk, srs, proof)

    # the proof's advice commitment for each polycommit column must equal
    # the witness's native commitment (unblinded tail)
    pj = json.loads(proof.to_json())
    pc = w["processed_commitments"]
    for idx, comm in zip(pc["advice_indices"], pc["polycommit"]):
        got = pj["advice"][idx]
        assert got is not None and comm is not None
        assert int(got[0], 16) == int(comm[0], 16)
        assert int(got[1], 16) == int(comm[1], 16)

    # api.swap_proof_commitments: honest proof -> all matched (no-op)
    from ezkl_tpu import api
    pathlib.Path("proof.json").write_text(proof.to_json())
    pathlib.Path("witness.json").write_text(json.dumps(w))
    assert api.swap_proof_commitments("proof.json", "witness.json")

    # a doctored witness commitment swaps in and must break verification
    w2 = json.loads(json.dumps(w))
    from ezkl_tpu.fieldmath import hostcurve as hc
    g2x, g2y = hc.g1_mul(hc.G1, 7)
    w2["processed_commitments"]["polycommit"][0] = [hex(g2x), hex(g2y)]
    pathlib.Path("witness.json").write_text(json.dumps(w2))
    assert not api.swap_proof_commitments("proof.json", "witness.json")
    from ezkl_tpu.plonk.prover import Proof
    bad = Proof.from_json(pathlib.Path("proof.json").read_text())
    assert not gc.verify(pk.vk, srs, bad)


@needs_ref
def test_unblinded_column_is_deterministic_blinded_is_not():
    """Two proofs of one witness: blinded advice commitments differ,
    unblinded (kzgcommit) ones are byte-identical."""
    from ezkl_tpu.plonk import srs as srsmod
    gc, x = make_gc("private", "public", "kzgcommit")
    s = gc.gen_settings([x])
    srs = srsmod.get_or_create(s.run_args.logrows)
    pk, asg = gc.setup([x], srs)
    from ezkl_tpu.plonk import prover
    p1 = prover.create_proof(pk, srs, asg, seed=1)
    p2 = prover.create_proof(pk, srs, asg, seed=2)
    unbl = gc.run_args and [i for i, b in
                            enumerate(pk.vk.cs.advice_unblinded) if b]
    assert unbl
    blinded_idx = [i for i in range(len(p1.advice_commitments))
                   if i not in unbl]
    for i in unbl:
        assert p1.advice_commitments[i] == p2.advice_commitments[i]
    assert any(p1.advice_commitments[i] != p2.advice_commitments[i]
               for i in blinded_idx)


@needs_ref
def test_hashed_params_on_conv_layer():
    """Hashed visibility over a REAL conv layer's params (r4 verdict item
    9): the committed bias is rebased up in-circuit (const_mul) to the conv
    accumulator scale instead of being requantized (which would break the
    public hash of the raw param values)."""
    ra = RunArgs(param_visibility="hashed")
    gc = GraphCircuit.from_onnx(str(REF / "1l_conv" / "network.onnx"), ra)
    inp = json.loads((REF / "1l_conv" / "input.json").read_text())
    x = np.array(inp["input_data"][0], np.float64).reshape(
        gc.model.input_shapes()[0])
    gc.gen_settings([x])
    assert gc.mock_prove([x]) == []
    cfg, ctx, _ = gc.forward([x])
    # one public hash instance per param tensor (weights + bias)
    assert len(ctx._param_tvals) == 2
