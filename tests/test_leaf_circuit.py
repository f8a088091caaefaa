"""Leaf aggregation circuit: K child proofs verified in-circuit, their PI
digests absorbed into the recursion queue (leaf_layer.rs role)."""

import dataclasses as dc

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import leaf_circuit as lc
from zkevm_harness_tpu.circuits import poseidon2_circuit as p2c
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover import satisfy

INNER_CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4,
                              final_fri_size=8)
P = gl.P
ARITY = 2


@pytest.fixture(scope="module")
def rig():
    inner_ir = p2c.poseidon2_ir(5)
    inner_setup = p2c.poseidon2_setup(inner_ir, INNER_CFG)
    proofs = []
    for seed in range(ARITY):
        W = p2c.poseidon2_witness(inner_ir, [[seed * 31 + j for j in range(12)]])
        pr = pk.prove(inner_ir, inner_setup, W, INNER_CFG)
        assert pk.verify(inner_ir, inner_setup.vk(), pr, INNER_CFG)
        proofs.append(pr)
    b, lay = lc.synthesize_leaf(inner_ir, INNER_CFG, ARITY,
                                base_circuit_type=8)
    built = b.finalize()
    return dict(inner_ir=inner_ir, inner_setup=inner_setup, proofs=proofs,
                b=b, lay=lay, built=built)


def _violations(rig_d, proofs):
    b, lay, built = rig_d["b"], rig_d["lay"], rig_d["built"]
    vk = rig_d["inner_setup"].vk()
    asg = lc.leaf_assignments(lay, vk, proofs)
    W = b.fill_witness(asg)
    pis = lc.leaf_public_inputs(lay, vk, proofs)
    return satisfy.check_satisfied(
        built.ir, gl.to_ints(W), np.asarray(built.const_cols, dtype=object),
        built.permutation, pis), pis


def test_leaf_satisfied_by_real_children(rig):
    viol, pis = _violations(rig, rig["proofs"])
    assert viol == []
    # the tail PIs equal the witness-side RecursionQueueSimulator chain
    vk = rig["inner_setup"].vk()
    assert len(pis) == len(vk) + 4 + 12


def test_leaf_rejects_tampered_child(rig):
    pr0, pr1 = rig["proofs"]
    bad0 = dc.replace(pr0, public_inputs=[(int(pr0.public_inputs[0]) + 1) % P]
                      + list(pr0.public_inputs[1:]))
    viol, _ = _violations(rig, [bad0, pr1])
    assert viol


def test_leaf_rejects_wrong_queue_claim(rig):
    """Claiming a queue tail not matching the children's digests fails."""
    b, lay, built = rig["b"], rig["lay"], rig["built"]
    vk = rig["inner_setup"].vk()
    asg = lc.leaf_assignments(lay, vk, rig["proofs"])
    W = b.fill_witness(asg)
    pis = lc.leaf_public_inputs(lay, vk, rig["proofs"])
    pis[len(vk) + 4] = (int(pis[len(vk) + 4]) + 1) % P  # first tail lane
    viol = satisfy.check_satisfied(
        built.ir, gl.to_ints(W), np.asarray(built.const_cols, dtype=object),
        built.permutation, pis)
    assert viol


def test_leaf_proof_of_aggregation(rig):
    """Prove the leaf circuit itself; PIs bind vk + queue head/tail."""
    b, lay, built = rig["b"], rig["lay"], rig["built"]
    vk = rig["inner_setup"].vk()
    asg = lc.leaf_assignments(lay, vk, rig["proofs"])
    W = b.fill_witness(asg)
    cfg = pk.PlonkishConfig(rate=2, cap_size=8, num_queries=8,
                            final_fri_size=16)
    setup = built.setup(cfg)
    proof = pk.prove(built.ir, setup, W, cfg)
    assert pk.verify(built.ir, setup.vk(), proof, cfg)
    expect = lc.leaf_public_inputs(lay, vk, rig["proofs"])
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % P for v in expect]
