"""End-to-end proof system test: mock check, then real KZG prove + verify.

Mirrors the reference's MockProver-based gate tests + prove/verify pipeline
(SURVEY.md §4 tiers 1-2) on a hand-built mul+copy+lookup circuit.
"""

import numpy as np
import pytest

from ezkl_tpu.plonk import cs as csmod
from ezkl_tpu.plonk.assign import Assignment
from ezkl_tpu.plonk import mock, keygen, prover, verifier, srs as srsmod

K = 4
N = 1 << K


def build_circuit():
    cs = csmod.ConstraintSystem()
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    q_mul = cs.fixed_column()
    table = cs.fixed_column()
    inst = cs.instance_column()
    va, vb, vc = cs.query(a), cs.query(b), cs.query(c)
    cs.create_gate("mul", cs.query(q_mul) * (va * vb - vc))
    cs.add_lookup("a_in_table", [(va,)], (cs.query(table),))
    for col in (a, b, c, inst):
        cs.enable_equality(col)
    return cs, (a, b, c, q_mul, table, inst)


def build_assignment(cs, cols, tamper=False):
    a, b, c, q_mul, table, inst = cols
    asg = Assignment.empty(cs, K)
    # chain: a0*b0=c0, c0 copied to a1, etc. a values stay < 8 for the lookup
    avals, bvals, cvals = [2], [3], []
    for i in range(4):
        cvals.append(avals[i] * bvals[i] % 1_000_000_007)
        if i < 3:
            avals.append(cvals[i] % 8)
            bvals.append(1)
    # keep a in table range
    avals = [v % 8 for v in avals]
    cvals = [av * bv for av, bv in zip(avals, bvals)]
    if tamper:
        cvals[2] += 1
    asg.set_ints(a, 0, avals)
    asg.set_ints(b, 0, bvals)
    asg.set_ints(c, 0, cvals)
    asg.set_ints(q_mul, 0, [1] * 4)
    asg.set_ints(table, 0, list(range(8)))
    asg.set_instance(inst, [cvals[3]])
    for i in range(3):
        asg.copy(c, i, a, i + 1)
    asg.copy(c, 3, inst, 0)
    return asg


def test_mock_ok_and_tampered():
    cs, cols = build_circuit()
    asg = build_assignment(cs, cols)
    fails = mock.verify(asg)
    assert fails == [], fails
    bad = build_assignment(cs, cols, tamper=True)
    fails = mock.verify(bad)
    assert any(f.kind == "gate" for f in fails)


def test_mock_chunked_matches_whole_domain(monkeypatch):
    """The chunked gate path (k>=20 domains) must report exactly the same
    failures as the whole-domain jit."""
    cs, cols = build_circuit()
    ok = build_assignment(cs, cols)
    bad = build_assignment(cs, cols, tamper=True)
    whole = [(f.kind, f.name, f.rows) for f in mock.verify(bad)]
    monkeypatch.setattr(mock, "_GATE_CHUNK", 4)  # force chunking (n=16)
    assert mock.verify(ok) == []
    chunked = [(f.kind, f.name, f.rows) for f in mock.verify(bad)]
    assert chunked == whole


def test_prove_and_verify_roundtrip():
    cs, cols = build_circuit()
    asg = build_assignment(cs, cols)
    srs = srsmod.gen_srs(K)
    pk = keygen.keygen(cs, K, srs, asg)
    proof = prover.create_proof(pk, srs, asg)
    ok = verifier.verify(pk.vk, srs.g2, srs.s_g2, proof)
    assert ok, "honest proof must verify"

    # serialization roundtrip
    p2 = prover.Proof.from_json(proof.to_json())
    assert verifier.verify(pk.vk, srs.g2, srs.s_g2, p2)

    # tampered instance must fail
    import dataclasses
    bad = dataclasses.replace(p2, instances=[[p2.instances[0][0] + 1]])
    assert not verifier.verify(pk.vk, srs.g2, srs.s_g2, bad)

    # tampered eval must fail
    bad_evals = dict(p2.evals)
    klabel = sorted(bad_evals)[0]
    bad_evals[klabel] = (bad_evals[klabel] + 1) % (2**250)
    bad2 = dataclasses.replace(p2, evals=bad_evals)
    assert not verifier.verify(pk.vk, srs.g2, srs.s_g2, bad2)

    # off-curve opening point must be rejected before any group math
    bad3 = dataclasses.replace(
        p2, opening_commitments=[(1, 1)] + p2.opening_commitments[1:])
    assert not verifier.verify(pk.vk, srs.g2, srs.s_g2, bad3)


def build_shuffle_circuit():
    """Column `b` must be a permutation of column `a` (shuffle argument),
    and additionally both are selector-tagged so inactive rows pair up."""
    cs = csmod.ConstraintSystem()
    a = cs.advice_column()
    b = cs.advice_column()
    sel = cs.fixed_column()
    va, vb, vs = cs.query(a), cs.query(b), cs.query(sel)
    cs.add_shuffle("b_perm_of_a", (vs * va, vs), (vs * vb, vs))
    return cs, (a, b, sel)


def build_shuffle_assignment(cs, cols, tamper=False):
    a, b, sel = cols
    asg = Assignment.empty(cs, K)
    avals = [5, 3, 9, 1, 7, 2]
    bvals = sorted(avals)
    if tamper:
        bvals[2] = 99
    asg.set_ints(a, 0, avals)
    asg.set_ints(b, 0, bvals)
    asg.set_ints(sel, 0, [1] * len(avals))
    return asg


def test_shuffle_mock_and_prove():
    cs, cols = build_shuffle_circuit()
    asg = build_shuffle_assignment(cs, cols)
    assert mock.verify(asg) == []
    bad = build_shuffle_assignment(cs, cols, tamper=True)
    assert any(f.kind == "shuffle" for f in mock.verify(bad))

    srs = srsmod.gen_srs(K)
    pk = keygen.keygen(cs, K, srs, asg)
    p = prover.create_proof(pk, srs, asg, seed=3)
    assert verifier.verify(pk.vk, srs.g2, srs.s_g2, p)
    # proof of the tampered (non-permutation) assignment must not verify
    p_bad = prover.create_proof(pk, srs, bad, seed=3)
    assert not verifier.verify(pk.vk, srs.g2, srs.s_g2, p_bad)


def test_zero_knowledge_blinding():
    """Two proofs of the same witness differ byte-wise (fresh blinding), both
    verify; a fixed seed reproduces a byte-identical proof (det-prove)."""
    cs, cols = build_circuit()
    asg = build_assignment(cs, cols)
    srs = srsmod.gen_srs(K)
    pk = keygen.keygen(cs, K, srs, asg)
    p1 = prover.create_proof(pk, srs, asg, seed=1)
    p2 = prover.create_proof(pk, srs, asg, seed=2)
    assert p1.to_json() != p2.to_json(), "blinding must randomize proofs"
    assert verifier.verify(pk.vk, srs.g2, srs.s_g2, p1)
    assert verifier.verify(pk.vk, srs.g2, srs.s_g2, p2)
    # advice commitments themselves must be rerandomized (hiding), not just
    # the opening side
    assert p1.advice_commitments != p2.advice_commitments
    p1b = prover.create_proof(pk, srs, asg, seed=1)
    assert p1.to_json() == p1b.to_json(), "det-prove seed must reproduce"
