"""EVM layer: EvmTranscript proofs, Solidity verifier generation, and the
expression-codegen equivalence oracle (reference L6; the environment has no
solc/EVM, so the contract's logic is validated through its Python-rendered
twin + the transcript it replays)."""

import numpy as np
import pytest

from ezkl_tpu.fieldmath.spec import FR_MODULUS
from ezkl_tpu.plonk import cs as csmod
from ezkl_tpu.plonk import keygen, prover, srs as srsmod, verifier
from ezkl_tpu.plonk.transcript import EvmTranscript
from ezkl_tpu.evm import solidity

from test_plonk import K, build_circuit, build_assignment


@pytest.fixture(scope="module")
def proven():
    cs, cols = build_circuit()
    asg = build_assignment(cs, cols)
    srs = srsmod.gen_srs(K)
    pk = keygen.keygen(cs, K, srs, asg)
    proof = prover.create_proof(pk, srs, asg, transcript=EvmTranscript())
    return cs, pk, srs, proof


def test_evm_transcript_prove_verify(proven):
    cs, pk, srs, proof = proven
    assert verifier.verify(pk.vk, srs.g2, srs.s_g2, proof,
                           transcript=EvmTranscript())
    # default (blake2b) transcript derives different challenges -> reject
    assert not verifier.verify(pk.vk, srs.g2, srs.s_g2, proof)


def test_generated_solidity_structure(proven):
    cs, pk, srs, proof = proven
    sol = solidity.generate_verifier(pk.vk, srs.g2, srs.s_g2)
    assert sol.count("{") == sol.count("}")
    assert "function verifyProof(bytes calldata proof" in sol
    assert "staticcall(gas(), 0x08" in sol           # pairing precompile
    assert hex(FR_MODULUS) in sol
    # proof length in the contract == calldata length minus the instances
    import json
    labels = solidity.eval_label_list(pk.vk)
    assert sorted(proof.evals) == labels
    n_inst = sum(len(c) for c in proof.instances)
    from ezkl_tpu import api
    import pathlib, tempfile
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "proof.json"
        p.write_text(proof.to_json())
        data = api.encode_evm_calldata(str(p), output=None)
    expect = len(data) - 32 * n_inst
    assert f"proof.length == {expect}" in sol


def test_reusable_verifier_and_vka(proven):
    """Reusable split: per-circuit constants leave the verifier for the
    VKA blob; the verifier reads them by offset via extcodecopy."""
    cs, pk, srs, proof = proven
    vk = pk.vk
    sol = solidity.generate_verifier(vk, srs.g2, srs.s_g2, reusable=True)
    vka = solidity.generate_vka(vk, srs.g2, srs.s_g2)
    lay = solidity.vka_layout(vk)
    assert sol.count("{") == sol.count("}")
    assert "function verifyProof(address vka, bytes calldata proof" in sol
    assert "extcodecopy(vka" in sol
    assert f"VKA_SIZE = {lay['size']}" in sol
    # no inline vk constants left in the reusable verifier
    assert "VK_REPR" not in sol.replace("VKR_OFF", "").replace("VKR_LEN", "")
    for pt in vk.fixed_commitments + vk.sigma_commitments:
        if pt is not None and pt[0]:
            assert hex(pt[0]) not in sol, "fixed commitment leaked inline"
    # the VKA blob holds exactly the constants at the layout offsets
    blob = bytes.fromhex(vka.split('hex"')[1].split('"')[0])
    assert len(blob) == lay["size"]
    for i, pt in enumerate(vk.fixed_commitments):
        x, y = (0, 0) if pt is None else pt
        o = lay["fixed"] + 64 * i
        assert int.from_bytes(blob[o:o + 32], "big") == x
        assert int.from_bytes(blob[o + 32:o + 64], "big") == y
    for i, pt in enumerate(vk.sigma_commitments):
        x, y = (0, 0) if pt is None else pt
        o = lay["sigma"] + 64 * i
        assert int.from_bytes(blob[o:o + 32], "big") == x
        assert int.from_bytes(blob[o + 32:o + 64], "big") == y
    assert blob[lay["vkr"]:] == vk.transcript_repr()
    (x0, x1), (y0, y1) = srs.s_g2[0], srs.s_g2[1]
    o = lay["sg2"]
    assert int.from_bytes(blob[o:o + 32], "big") == x1
    assert int.from_bytes(blob[o + 96:o + 128], "big") == y0


def test_api_reusable_writes_vka(tmp_path, monkeypatch, proven):
    cs, pk, srs, proof = proven
    from ezkl_tpu import api
    from ezkl_tpu.plonk import serde as serde_mod
    monkeypatch.chdir(tmp_path)
    serde_mod.save_vk(pk.vk, "vk.key")
    srsmod.save(srs, "kzg.srs")
    api.create_evm_verifier("vk.key", "kzg.srs", "Verifier.sol",
                            reusable=True)
    assert (tmp_path / "Verifier.sol").exists()
    assert (tmp_path / "VerifierVKA.sol").exists()
    assert "EzklTpuVKA" in (tmp_path / "VerifierVKA.sol").read_text()


def test_opening_groups_match_verifier(proven):
    """The generator's multiopen group tables must mirror the live verifier:
    same rotation set and same number of opening commitments."""
    cs, pk, srs, proof = proven
    groups = solidity.opening_groups(pk.vk)
    assert len(groups) == len(proof.opening_commitments)
    total_items = sum(len(v) for v in groups.values())
    labels = solidity.eval_label_list(pk.vk)
    assert total_items >= len(labels)  # every eval is opened at least once


def test_expr_codegen_matches_evaluator():
    """Render gate expressions to Python (same tree walk as the Solidity
    render) and check against evaluate_at_point on random assignments."""
    from ezkl_tpu.plonk.evaluator import evaluate_at_point

    cs, cols = build_circuit()
    rng = np.random.default_rng(0)
    qv = {}
    for q in cs.all_queries():
        qv[(q.column.kind, q.column.index, q.rotation)] = int(
            rng.integers(0, 2**63))

    def var_ref(kind, index, rotation):
        return f"qv[({kind!r}, {index}, {rotation})]"

    def ch_ref(i):
        raise AssertionError("no challenges in this circuit")

    ns = {
        "qv": qv,
        "R": FR_MODULUS,
        "mulmod": lambda a, b, m: (a * b) % m,
        "addmod": lambda a, b, m: (a + b) % m,
    }
    for g in cs.gates:
        code = solidity.expr_code(g.poly, var_ref, ch_ref, lang="py")
        got = eval(code, ns)
        want = evaluate_at_point(g.poly, qv, {})
        assert got == want % FR_MODULUS


def test_api_create_evm_verifier(tmp_path, monkeypatch, proven):
    cs, pk, srs, proof = proven
    monkeypatch.chdir(tmp_path)
    from ezkl_tpu import api
    from ezkl_tpu.plonk import serde as serde_mod
    serde_mod.save_vk(pk.vk, "vk.key")
    srsmod.save(srs, "kzg.srs")
    sol = api.create_evm_verifier("vk.key", "kzg.srs", "Verifier.sol")
    assert (tmp_path / "Verifier.sol").exists()
    assert "contract EzklTpuVerifier" in sol
    # no n_inst known and no proof.json adjacent -> no bytecode artifact
    assert not (tmp_path / "Verifier.bin").exists()
    # full artifact flow: proof.json adjacent -> .bin emitted -> deploy ->
    # on-EVM verify (the in-repo devnet analog; live RPC still refuses)
    (tmp_path / "proof.json").write_text(proof.to_json())
    api.create_evm_verifier("vk.key", "kzg.srs", "Verifier.sol")
    assert (tmp_path / "Verifier.bin").exists()
    api.deploy_evm("Verifier.bin", "contract.addr", "chain.json")
    assert api.verify_evm("proof.json", "contract.addr", "chain.json")
    with pytest.raises(RuntimeError, match="zero-egress"):
        api.deploy_evm(rpc_url="http://localhost:8545")


# ---------------------------------------------------------------------------
# EVM EXECUTION: the bytecode artifact runs on the in-repo EVM interpreter
# (reference runs generated Solidity on anvil, `src/eth.rs:238`,
# `tests/integration_tests.rs:299-323`; here the artifact is emitted as
# bytecode and executed — not validated through the Python twin)
# ---------------------------------------------------------------------------

def _calldata_of(proof):
    import pathlib
    import tempfile
    from ezkl_tpu import api
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "proof.json"
        p.write_text(proof.to_json())
        return api.encode_evm_calldata(str(p), output=None)


@pytest.fixture(scope="module")
def deployed(proven):
    from ezkl_tpu.evm import bytecode, vm as evm_vm
    cs, pk, srs, proof = proven
    n_inst = sum(len(c) for c in proof.instances)
    rt = bytecode.emit_verifier(pk.vk, srs.g2, srs.s_g2, n_inst)
    E = evm_vm.EVM()
    addr = E.deploy(bytecode.initcode(rt))
    assert E.code[addr] == rt, "constructor must return the runtime code"
    return E, addr, proof


def test_bytecode_accepts_valid_proof(deployed):
    E, addr, proof = deployed
    out = E.call(addr, _calldata_of(proof))
    assert out == (1).to_bytes(32, "big")


def test_bytecode_rejects_tampered_eval(deployed):
    E, addr, proof = deployed
    import dataclasses
    bad_evals = dict(proof.evals)
    klabel = sorted(bad_evals)[0]
    bad_evals[klabel] = (bad_evals[klabel] + 1) % FR_MODULUS
    bad = dataclasses.replace(proof, evals=bad_evals)
    out = E.call(addr, _calldata_of(bad))
    assert out != (1).to_bytes(32, "big")


def test_bytecode_rejects_tampered_instance(deployed):
    E, addr, proof = deployed
    import dataclasses
    bad = dataclasses.replace(
        proof, instances=[[(proof.instances[0][0] + 1) % FR_MODULUS]])
    out = E.call(addr, _calldata_of(bad))
    assert out != (1).to_bytes(32, "big")


def test_bytecode_rejects_tampered_commitment(deployed):
    """An off-curve commitment point must REVERT (checkPoint), and an
    on-curve-but-wrong point must fail the pairing."""
    from ezkl_tpu.evm import vm as evm_vm
    from ezkl_tpu.fieldmath import hostcurve as hc
    E, addr, proof = deployed
    data = bytearray(_calldata_of(proof))
    # off-curve: x+1 keeps range but leaves the curve almost surely
    x = int.from_bytes(data[0:32], "big")
    data[0:32] = ((x + 1)).to_bytes(32, "big")
    with pytest.raises(evm_vm.EvmRevert):
        E.call(addr, bytes(data))
    # on-curve wrong point: replace first advice commitment with 3*G
    data = bytearray(_calldata_of(proof))
    gx, gy = hc.g1_mul(hc.G1, 3)
    data[0:32] = int(gx).to_bytes(32, "big")
    data[32:64] = int(gy).to_bytes(32, "big")
    out = E.call(addr, bytes(data))
    assert out != (1).to_bytes(32, "big")


def test_bytecode_rejects_bad_length(deployed):
    from ezkl_tpu.evm import vm as evm_vm
    E, addr, proof = deployed
    with pytest.raises(evm_vm.EvmRevert):
        E.call(addr, _calldata_of(proof)[:-1])
