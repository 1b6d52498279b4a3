"""Restartable prover phases: crash mid-prove, resume from checkpoint.

The resumed proof must be BYTE-IDENTICAL to an uninterrupted run with the
same seed (same blinding, same transcript), and checkpoints must clear on
success. (Reference has no analog — failure recovery for long k>=20 TPU
runs, SURVEY.md §5.)
"""

import pytest

from ezkl_tpu.plonk import keygen, prover, srs as srsmod, verifier
from test_plonk import K, build_assignment, build_circuit


@pytest.fixture(scope="module")
def setup():
    cs, cols = build_circuit()
    asg = build_assignment(cs, cols)
    srs = srsmod.gen_srs(K)
    pk = keygen.keygen(cs, K, srs, asg)
    baseline = prover.create_proof(pk, srs, asg, seed=9)
    return cs, cols, srs, pk, baseline


def _crash_at(monkeypatch, phase_prefix):
    real_span = prover._span
    fired = []

    def boom(msg):
        if msg.startswith(phase_prefix) and not fired:
            fired.append(msg)
            raise RuntimeError(f"injected crash at {msg}")
        real_span(msg)

    monkeypatch.setattr(prover, "_span", boom)
    return lambda: monkeypatch.setattr(prover, "_span", real_span)


@pytest.mark.parametrize("crash_phase,expect_ckpt", [
    ("phase5: quotient", "cols"),
    ("phase6: evaluations", "h"),
])
def test_resume_after_crash(setup, tmp_path, monkeypatch,
                            crash_phase, expect_ckpt):
    cs, cols, srs, pk, baseline = setup
    asg = build_assignment(cs, cols)
    restore = _crash_at(monkeypatch, crash_phase)
    with pytest.raises(RuntimeError, match="injected crash"):
        prover.create_proof(pk, srs, asg, seed=9,
                            checkpoint_dir=str(tmp_path))
    restore()
    saved = list(tmp_path.glob(f"prove-*/{expect_ckpt}.npz"))
    assert saved, f"no {expect_ckpt} checkpoint written before the crash"

    proof = prover.create_proof(pk, srs, asg, seed=9,
                                checkpoint_dir=str(tmp_path))
    assert proof.to_json() == baseline.to_json(), \
        "resumed proof must be byte-identical to the uninterrupted run"
    assert verifier.verify(pk.vk, srs.g2, srs.s_g2, proof)
    # success clears the checkpoint directory
    assert not list(tmp_path.glob("prove-*/*.npz"))


def test_checkpoint_requires_seed(setup, tmp_path, monkeypatch):
    cs, cols, srs, pk, _ = setup
    asg = build_assignment(cs, cols)
    monkeypatch.delenv("EZKL_TPU_DET_SEED", raising=False)
    with pytest.raises(ValueError, match="deterministic seed"):
        prover.create_proof(pk, srs, asg, checkpoint_dir=str(tmp_path))


def test_stale_witness_never_reused(setup, tmp_path, monkeypatch):
    """A checkpoint from witness A must not resume a prove of witness B
    (key includes the witness digest)."""
    cs, cols, srs, pk, _ = setup
    asg_a = build_assignment(cs, cols)
    restore = _crash_at(monkeypatch, "phase5: quotient")
    with pytest.raises(RuntimeError):
        prover.create_proof(pk, srs, asg_a, seed=9,
                            checkpoint_dir=str(tmp_path))
    restore()
    dirs_a = set(p.name for p in tmp_path.glob("prove-*"))
    # different seed -> different key -> fresh full prove (just verify OK)
    asg_b = build_assignment(cs, cols)
    proof_b = prover.create_proof(pk, srs, asg_b, seed=10,
                                  checkpoint_dir=str(tmp_path))
    assert verifier.verify(pk.vk, srs.g2, srs.s_g2, proof_b)
    dirs_after = set(p.name for p in tmp_path.glob("prove-*"))
    # the seed-9 checkpoint is untouched by the seed-10 run (its own
    # checkpoint dir was keyed differently and cleared on success)
    assert dirs_a <= dirs_after
