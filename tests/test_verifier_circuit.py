"""The in-circuit PLONKish verifier: a circuit proving "I verified an inner
proof" (recursion kernel; reference role recursion_layer/leaf_layer.rs).

Covers: satisfiability on a REAL inner proof, unsatisfiability for tampered
inner proofs (PI / OOD / FRI tampering), and a full outer proof of the
verifier circuit that itself verifies + rejects outer-PI tampering.
"""

import dataclasses as dc

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import poseidon2_circuit as p2c
from zkevm_harness_tpu.circuits import verifier_circuit as vc
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover import satisfy

INNER_CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4,
                              final_fri_size=8)
OUTER_CFG = pk.PlonkishConfig(rate=2, cap_size=8, num_queries=8,
                              final_fri_size=16)
P = gl.P


@pytest.fixture(scope="module")
def rig():
    inner_ir = p2c.poseidon2_ir(5)
    inner_setup = p2c.poseidon2_setup(inner_ir, INNER_CFG)
    W_inner = p2c.poseidon2_witness(inner_ir,
                                    [[i * 7 + j for j in range(12)]
                                     for i in range(1)])
    inner_proof = pk.prove(inner_ir, inner_setup, W_inner, INNER_CFG)
    assert pk.verify(inner_ir, inner_setup.vk(), inner_proof, INNER_CFG)
    b, lay = vc.synthesize_verifier(inner_ir, INNER_CFG, slots=8)
    built = b.finalize()
    return dict(inner_ir=inner_ir, inner_setup=inner_setup,
                inner_proof=inner_proof, b=b, lay=lay, built=built)


def _violations(rig_d, proof):
    b, lay, built = rig_d["b"], rig_d["lay"], rig_d["built"]
    vk = rig_d["inner_setup"].vk()
    asg = vc.verifier_assignments(lay, vk, proof)
    W = b.fill_witness(asg)
    return satisfy.check_satisfied(
        built.ir, gl.to_ints(W), np.asarray(built.const_cols, dtype=object),
        built.permutation, vc.verifier_public_inputs(vk, proof))


def test_verifier_circuit_satisfied_by_real_proof(rig):
    assert _violations(rig, rig["inner_proof"]) == []


def test_verifier_circuit_shape(rig):
    built = rig["built"]
    # proof-of-verification circuit stays compact: one 2^11 trace
    assert built.ir.log_n <= 12
    assert built.ir.num_witness <= 120


def test_verifier_circuit_rejects_tampered_inner_pi(rig):
    bad = dc.replace(rig["inner_proof"],
                     public_inputs=list(rig["inner_proof"].public_inputs))
    bad.public_inputs[0] = (int(bad.public_inputs[0]) + 1) % P
    assert _violations(rig, bad)


def test_verifier_circuit_rejects_tampered_inner_ood(rig):
    pr = rig["inner_proof"]
    bad = dc.replace(pr, ood_witness=[
        ((int(a) + 1) % P, bb) if i == 0 else (a, bb)
        for i, (a, bb) in enumerate(pr.ood_witness)])
    assert _violations(rig, bad)


def test_verifier_circuit_rejects_tampered_final_poly(rig):
    pr = rig["inner_proof"]
    fri = dc.replace(pr.fri, final_poly=[
        ((int(c0) + 1) % P, c1) if i == 0 else (c0, c1)
        for i, (c0, c1) in enumerate(pr.fri.final_poly)])
    assert _violations(rig, dc.replace(pr, fri=fri))


def test_verifier_circuit_rejects_tampered_opening(rig):
    pr = rig["inner_proof"]
    openings = {k: {i: list(v) for i, v in d.items()}
                for k, d in pr.openings.items()}
    k0 = next(iter(openings["witness"]))
    openings["witness"][k0][0] = (int(openings["witness"][k0][0]) + 1) % P
    assert _violations(rig, dc.replace(pr, openings=openings))


def test_verifier_circuit_proof_of_verification(rig):
    """The milestone: an OUTER proof attesting the inner proof verifies."""
    b, lay, built = rig["b"], rig["lay"], rig["built"]
    vk = rig["inner_setup"].vk()
    asg = vc.verifier_assignments(lay, vk, rig["inner_proof"])
    W = b.fill_witness(asg)
    setup = built.setup(OUTER_CFG)
    proof = pk.prove(built.ir, setup, W, OUTER_CFG)
    assert pk.verify(built.ir, setup.vk(), proof, OUTER_CFG)
    # outer PIs bind the inner VK + inner public inputs
    expect = vc.verifier_public_inputs(vk, rig["inner_proof"])
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % P for v in expect]
    # claiming a different inner VK must fail
    bad_pis = list(proof.public_inputs)
    bad_pis[0] = (int(bad_pis[0]) + 1) % P
    bad = dc.replace(proof, public_inputs=bad_pis)
    assert not pk.verify(built.ir, setup.vk(), bad, OUTER_CFG)


def test_verifier_circuit_lookup_inner():
    """Inner circuit WITH a lookup table (the flagship): the verifier's
    logup path (theta/beta_lk draws, stage-3 terms, table DEEP groups)."""
    from zkevm_harness_tpu.circuits import flagship as fl

    inner_ir = fl.flagship_ir(log_n=6, width=8)
    inner_setup = fl.flagship_setup(inner_ir, INNER_CFG)
    W = fl.flagship_witness(inner_ir)
    proof = pk.prove(inner_ir, inner_setup, W, INNER_CFG)
    assert pk.verify(inner_ir, inner_setup.vk(), proof, INNER_CFG)

    b, lay = vc.synthesize_verifier(inner_ir, INNER_CFG, slots=8)
    built = b.finalize()
    vk = inner_setup.vk()
    asg = vc.verifier_assignments(lay, vk, proof)
    Wv = b.fill_witness(asg)
    viol = satisfy.check_satisfied(
        built.ir, gl.to_ints(Wv), np.asarray(built.const_cols, dtype=object),
        built.permutation, vc.verifier_public_inputs(vk, proof))
    assert viol == []

    # tampering the stage-3 OOD values must be unsatisfiable
    bad = dc.replace(proof, ood_stage3=[
        ((int(a) + 1) % P, bb) if i == 0 else (a, bb)
        for i, (a, bb) in enumerate(proof.ood_stage3)])
    asg_b = vc.verifier_assignments(lay, vk, bad)
    Wb = b.fill_witness(asg_b)
    viol_b = satisfy.check_satisfied(
        built.ir, gl.to_ints(Wb), np.asarray(built.const_cols, dtype=object),
        built.permutation, vc.verifier_public_inputs(vk, bad))
    assert viol_b
