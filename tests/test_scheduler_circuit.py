"""Scheduler circuit: per-type aggregation proofs verified in-circuit,
empty-head enforcement, and the block commitment digest (scheduler.rs role).

The rig aggregates one base type with a LEAF proof (the scheduler is
layout-agnostic over [prefix || head(4) || tail(12)] children — production
uses node proofs; the test keeps the chain one level shorter)."""

import dataclasses as dc

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import leaf_circuit as lc
from zkevm_harness_tpu.circuits import poseidon2_circuit as p2c
from zkevm_harness_tpu.circuits import scheduler_circuit as sc
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover import satisfy

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)
P = gl.P


@pytest.fixture(scope="module")
def rig():
    inner_ir = p2c.poseidon2_ir(5)
    inner_setup = p2c.poseidon2_setup(inner_ir, CFG)
    base_proofs = [
        pk.prove(inner_ir, inner_setup,
                 p2c.poseidon2_witness(inner_ir,
                                       [[s * 31 + j for j in range(12)]]),
                 CFG)
        for s in range(2)]
    lb, llay = lc.synthesize_leaf(inner_ir, CFG, 2, base_circuit_type=8)
    lbuilt = lb.finalize()
    lsetup = lbuilt.setup(CFG)
    base_vk = inner_setup.vk()
    asg = lc.leaf_assignments(llay, base_vk, base_proofs)
    leaf_proof = pk.prove(lbuilt.ir, lsetup, lb.fill_witness(asg), CFG)
    assert pk.verify(lbuilt.ir, lsetup.vk(), leaf_proof, CFG)
    # a second leaf proof continuing the first's tail: NON-empty head
    head2 = tuple(int(v) for v in leaf_proof.public_inputs[-12:])
    asg2 = lc.leaf_assignments(llay, base_vk, base_proofs, queue_head=head2)
    leaf_proof2 = pk.prove(lbuilt.ir, lsetup, lb.fill_witness(asg2), CFG)

    aux = list(range(1, 8))  # arbitrary observable block data
    sb, slay = sc.synthesize_scheduler(lbuilt.ir, CFG, type_ids=[8],
                                       leaf_vk_len=len(base_vk),
                                       aux_len=len(aux))
    sbuilt = sb.finalize()
    return dict(leaf_ir=lbuilt.ir, leaf_setup=lsetup,
                leaf_proof=leaf_proof, leaf_proof2=leaf_proof2,
                sb=sb, slay=slay, sbuilt=sbuilt, aux=aux)


def _violations(rig_d, proofs, pis=None):
    sb, slay, sbuilt = rig_d["sb"], rig_d["slay"], rig_d["sbuilt"]
    vk = rig_d["leaf_setup"].vk()
    asg = sc.scheduler_assignments(slay, vk, proofs, block_number=7,
                                   aux_values=rig_d["aux"])
    W = sb.fill_witness(asg)
    if pis is None:
        pis = sc.scheduler_public_inputs(slay, vk, proofs, block_number=7,
                                         aux_values=rig_d["aux"])
    return satisfy.check_satisfied(
        sbuilt.ir, gl.to_ints(W), np.asarray(sbuilt.const_cols, dtype=object),
        sbuilt.permutation, pis), pis


def test_scheduler_satisfied_by_real_aggregation(rig):
    viol, pis = _violations(rig, [rig["leaf_proof"]])
    assert viol == []
    assert len(pis) == 4  # the block commitment digest


def test_scheduler_digest_binds_block_number(rig):
    sb, slay, sbuilt = rig["sb"], rig["slay"], rig["sbuilt"]
    vk = rig["leaf_setup"].vk()
    pis7 = sc.scheduler_public_inputs(slay, vk, [rig["leaf_proof"]], 7,
                                      rig["aux"])
    pis8 = sc.scheduler_public_inputs(slay, vk, [rig["leaf_proof"]], 8,
                                      rig["aux"])
    assert pis7 != pis8
    viol, _ = _violations(rig, [rig["leaf_proof"]], pis=pis8)
    assert viol  # claiming block 8's digest with block 7's witness fails


def test_scheduler_rejects_tampered_aggregation_proof(rig):
    pr = rig["leaf_proof"]
    bad = dc.replace(pr, public_inputs=[(int(pr.public_inputs[0]) + 1) % P]
                     + list(pr.public_inputs[1:]))
    viol, _ = _violations(rig, [bad])
    assert viol


def test_scheduler_rejects_nonempty_queue_head(rig):
    """An aggregation proof whose queue did NOT start empty must fail the
    empty-head constraint."""
    viol, _ = _violations(rig, [rig["leaf_proof2"]])
    assert viol


def test_scheduler_proof_end_to_end(rig):
    sb, slay, sbuilt = rig["sb"], rig["slay"], rig["sbuilt"]
    vk = rig["leaf_setup"].vk()
    setup = sbuilt.setup(CFG)
    asg = sc.scheduler_assignments(slay, vk, [rig["leaf_proof"]], 7,
                                   rig["aux"])
    proof = pk.prove(sbuilt.ir, setup, sb.fill_witness(asg), CFG)
    expected = sc.scheduler_public_inputs(slay, vk, [rig["leaf_proof"]], 7,
                                          rig["aux"])
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % P for v in expected]
    assert pk.verify(sbuilt.ir, setup.vk(), proof, CFG)
