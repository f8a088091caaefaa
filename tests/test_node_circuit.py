"""Node aggregation circuit: K child LEAF proofs verified in-circuit with
queue splicing (node_layer.rs role)."""

import dataclasses as dc

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import leaf_circuit as lc
from zkevm_harness_tpu.circuits import node_circuit as nc
from zkevm_harness_tpu.circuits import poseidon2_circuit as p2c
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover import satisfy

INNER_CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4,
                              final_fri_size=8)
LEAF_CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4,
                             final_fri_size=8)
P = gl.P
LEAF_ARITY = 2
NODE_ARITY = 2


@pytest.fixture(scope="module")
def rig():
    # base layer: tiny poseidon circuits
    inner_ir = p2c.poseidon2_ir(5)
    inner_setup = p2c.poseidon2_setup(inner_ir, INNER_CFG)
    base_proofs = []
    for seed in range(LEAF_ARITY * NODE_ARITY):
        W = p2c.poseidon2_witness(inner_ir,
                                  [[seed * 31 + j for j in range(12)]])
        base_proofs.append(pk.prove(inner_ir, inner_setup, W, INNER_CFG))

    # leaf layer: two leaves, the second continuing the first's queue tail
    lb, llay = lc.synthesize_leaf(inner_ir, INNER_CFG, LEAF_ARITY,
                                  base_circuit_type=8)
    lbuilt = lb.finalize()
    lsetup = lbuilt.setup(LEAF_CFG)
    base_vk = inner_setup.vk()
    leaf_proofs = []
    head = (0,) * 12
    for i in range(NODE_ARITY):
        children = base_proofs[i * LEAF_ARITY:(i + 1) * LEAF_ARITY]
        asg = lc.leaf_assignments(llay, base_vk, children, queue_head=head)
        W = lb.fill_witness(asg)
        pr = pk.prove(lbuilt.ir, lsetup, W, LEAF_CFG)
        expected = lc.leaf_public_inputs(llay, base_vk, children,
                                         queue_head=head)
        assert [int(v) for v in pr.public_inputs] == \
            [int(v) % P for v in expected]
        assert pk.verify(lbuilt.ir, lsetup.vk(), pr, LEAF_CFG)
        leaf_proofs.append(pr)
        head = tuple(int(v) for v in pr.public_inputs[-12:])

    nb, nlay = nc.synthesize_node(lbuilt.ir, LEAF_CFG, NODE_ARITY)
    nbuilt = nb.finalize()
    return dict(leaf_ir=lbuilt.ir, leaf_setup=lsetup,
                leaf_proofs=leaf_proofs, nb=nb, nlay=nlay, nbuilt=nbuilt,
                base_vk=base_vk)


def _violations(rig_d, proofs, pis=None):
    nb, nlay, nbuilt = rig_d["nb"], rig_d["nlay"], rig_d["nbuilt"]
    leaf_vk = rig_d["leaf_setup"].vk()
    asg = nc.node_assignments(nlay, leaf_vk, proofs)
    W = nb.fill_witness(asg)
    if pis is None:
        pis = nc.node_public_inputs(nlay, leaf_vk, proofs)
    return satisfy.check_satisfied(
        nbuilt.ir, gl.to_ints(W), np.asarray(nbuilt.const_cols, dtype=object),
        nbuilt.permutation, pis), pis


def test_node_satisfied_by_real_leaves(rig):
    viol, pis = _violations(rig, rig["leaf_proofs"])
    assert viol == []
    leaf_vk = rig["leaf_setup"].vk()
    base_vk = rig["base_vk"]
    # PI layout: [leaf_vk || base_vk(prefix) || head(4) || tail(12)]
    assert len(pis) == len(leaf_vk) + len(base_vk) + 4 + 12
    # the spliced interval: head of leaf 0 (zeros), tail of leaf 1
    assert pis[len(leaf_vk) + len(base_vk):len(leaf_vk) + len(base_vk) + 4] \
        == [0, 0, 0, 0]
    assert pis[-12:] == [int(v) % P for v in
                         rig["leaf_proofs"][-1].public_inputs[-12:]]


def test_node_rejects_tampered_leaf(rig):
    pr0, pr1 = rig["leaf_proofs"]
    bad0 = dc.replace(pr0, public_inputs=[(int(pr0.public_inputs[0]) + 1) % P]
                      + list(pr0.public_inputs[1:]))
    viol, _ = _violations(rig, [bad0, pr1])
    assert viol


def test_node_rejects_broken_splice(rig):
    """Two leaves whose queue segments do NOT chain must fail."""
    pr0 = rig["leaf_proofs"][0]
    viol, _ = _violations(rig, [pr0, pr0])  # head(pr0)=0s != tail(pr0)
    assert viol


def test_node_proof_of_aggregation(rig):
    """Prove the node circuit itself; PIs bind child VK + spliced interval."""
    nb, nlay, nbuilt = rig["nb"], rig["nlay"], rig["nbuilt"]
    leaf_vk = rig["leaf_setup"].vk()
    cfg = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4,
                            final_fri_size=8)
    setup = nbuilt.setup(cfg)
    asg = nc.node_assignments(nlay, leaf_vk, rig["leaf_proofs"])
    W = nb.fill_witness(asg)
    proof = pk.prove(nbuilt.ir, setup, W, cfg)
    expected = nc.node_public_inputs(nlay, leaf_vk, rig["leaf_proofs"])
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % P for v in expected]
    assert pk.verify(nbuilt.ir, setup.vk(), proof, cfg)
