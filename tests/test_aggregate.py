"""Batch proof aggregation: N proofs -> one pairing check.

TPU-native counterpart of the reference `aggregate` flow
(`/root/reference/src/execute.rs` aggregate): inner proofs reduce to
(L, R) pairing pairs which fold under a Fiat-Shamir RLC.
"""

import json

import pytest

from ezkl_tpu.plonk import aggregate as aggr
from ezkl_tpu.plonk import keygen, prover, srs as srsmod
from test_plonk import K, build_assignment, build_circuit


@pytest.fixture(scope="module")
def proved():
    cs, cols = build_circuit()
    asg = build_assignment(cs, cols)
    srs = srsmod.gen_srs(K)
    pk = keygen.keygen(cs, K, srs, asg)
    p1 = prover.create_proof(pk, srs, asg, seed=1)
    p2 = prover.create_proof(pk, srs, asg, seed=2)
    return srs, pk, [p1, p2]


def test_aggregate_roundtrip(proved):
    srs, pk, proofs = proved
    vks = [pk.vk, pk.vk]
    agg = aggr.aggregate(vks, proofs)
    assert agg["num_proofs"] == 2
    # JSON roundtrip like the file API
    agg = json.loads(json.dumps(agg))
    assert aggr.verify_aggregated(vks, agg, srs.g2, srs.s_g2)


def test_aggregate_rejects_tampered_inner(proved):
    srs, pk, proofs = proved
    vks = [pk.vk, pk.vk]
    agg = json.loads(json.dumps(aggr.aggregate(vks, proofs)))
    # flip one eval bit in the second inner proof
    klabel = sorted(agg["proofs"][1]["evals"])[0]
    c0 = agg["proofs"][1]["evals"][klabel]
    agg["proofs"][1]["evals"][klabel] = hex(int(c0, 16) ^ 1)
    assert not aggr.verify_aggregated(vks, agg, srs.g2, srs.s_g2)


def test_aggregate_refuses_invalid_proof(proved):
    srs, pk, proofs = proved
    import dataclasses
    bad = dataclasses.replace(
        proofs[1], instances=[[proofs[1].instances[0][0] + 1]])
    with pytest.raises(ValueError, match="failed verification"):
        aggr.aggregate([pk.vk, pk.vk], [proofs[0], bad])


def test_aggregate_wrong_count_fails(proved):
    srs, pk, proofs = proved
    agg = json.loads(json.dumps(aggr.aggregate([pk.vk] * 2, proofs)))
    assert not aggr.verify_aggregated([pk.vk], agg, srs.g2, srs.s_g2)
