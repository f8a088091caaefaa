"""In-circuit Merkle path verification vs the ops/merkle tree."""

import numpy as np

from zkevm_harness_tpu.circuits import merkle_circuit as mc
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import merkle as mk
from zkevm_harness_tpu.prover import plonkish as pk

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=16)


def test_merkle_path_in_circuit(rng):
    # depth-2 tree over 4 leaf digests, cap 1
    leaves = gl.from_int(rng.integers(0, 2**62, size=(4, 4), dtype=np.uint64))
    tree = mk.build_tree(leaves, 1)
    idx = 2
    path = mk.open_indices(tree, np.array([idx], dtype=np.uint32))
    path_np = gl.to_u64(path)[0]  # (2, 4)
    leaf_np = [int(v) for v in gl.to_u64(leaves)[idx]]
    root_np = [int(v) for v in gl.to_u64(tree.cap)[0]]
    bits = [(idx >> d) & 1 for d in range(2)]

    ir = mc.merkle_ir(log_n=6)  # 2 levels
    setup = mc.merkle_setup(ir, CFG)
    witness, root = mc.merkle_witness(
        ir, leaf_np, [[int(v) for v in lvl] for lvl in path_np], bits)
    assert root == root_np  # witness root matches the ops/merkle tree

    proof = pk.prove(ir, setup, witness, CFG)
    assert proof.public_inputs[:4] == leaf_np
    assert proof.public_inputs[4:8] == root_np
    assert proof.public_inputs[8:10] == bits
    assert pk.verify(ir, setup.vk(), proof, CFG)

    # forged root rejected
    proof.public_inputs = (proof.public_inputs[:4]
                           + [(root_np[0] + 1) % gl.P] + root_np[1:]
                           + proof.public_inputs[8:])
    assert not pk.verify(ir, setup.vk(), proof, CFG)


def test_wrong_path_bit_rejected(rng):
    leaves = gl.from_int(rng.integers(0, 2**62, size=(4, 4), dtype=np.uint64))
    tree = mk.build_tree(leaves, 1)
    idx = 1
    path = mk.open_indices(tree, np.array([idx], dtype=np.uint32))
    path_np = gl.to_u64(path)[0]
    leaf_np = [int(v) for v in gl.to_u64(leaves)[idx]]
    bits = [(idx >> d) & 1 for d in range(2)]

    ir = mc.merkle_ir(log_n=6)
    setup = mc.merkle_setup(ir, CFG)
    witness, root = mc.merkle_witness(
        ir, leaf_np, [[int(v) for v in lvl] for lvl in path_np], bits)
    proof = pk.prove(ir, setup, witness, CFG)
    # flipping a claimed path bit must fail (bits are public inputs)
    flipped = list(proof.public_inputs)
    flipped[8] ^= 1
    proof.public_inputs = flipped
    assert not pk.verify(ir, setup.vk(), proof, CFG)
