"""PLONKish CS prove/verify: gates + copy permutation on a toy circuit."""

import numpy as np
import pytest

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk

P = gl.P
LOG_N = 5
N = 1 << LOG_N

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=10, final_fri_size=8)


def toy_ir():
    """3 witness cols, 1 selector; gate: q * (w0 * w1 - w2) = 0."""

    def eval_gates(alg, w, w_next, c):
        return [alg.mul(c[0], alg.sub(alg.mul(w[0], w[1]), w[2]))]

    return pk.PlonkishIR(log_n=LOG_N, num_witness=3, num_const=1,
                         gate_degree=3, num_gate_constraints=1,
                         eval_gates=eval_gates, copy_chunk=2)


def build_circuit():
    """Chain: w2[i] = w0[i] * w1[i] on selector rows; w2[i] copied to w0[i+1]."""
    ir = toy_ir()
    q = np.zeros((1, N), dtype=object)
    q[0, : N - 1] = 1  # last row unconstrained
    w0 = np.zeros(N, dtype=object)
    w1 = np.zeros(N, dtype=object)
    w2 = np.zeros(N, dtype=object)
    w0[0] = 3
    for i in range(N - 1):
        w1[i] = (2 * i + 5) % P
        w2[i] = (int(w0[i]) * int(w1[i])) % P
        if i + 1 < N:
            w0[i + 1] = w2[i]
    cycles = [[(2, i), (0, i + 1)] for i in range(N - 1)]
    perm = pk.apply_copy_cycles(pk.identity_permutation(3, N), cycles)
    setup = pk.build_setup(ir, q, perm, CFG)
    witness = gl.from_int(np.stack([w0, w1, w2]))
    return ir, setup, witness


def test_prove_verify_roundtrip():
    ir, setup, witness = build_circuit()
    proof = pk.prove(ir, setup, witness, CFG)
    assert pk.verify(ir, setup.vk(), proof, CFG)


def test_gate_violation_rejected():
    ir, setup, witness = build_circuit()
    lo = np.asarray(witness.lo).copy()
    lo[2, 3] ^= 1  # break w2 = w0*w1 on a selector row
    bad = gl.GF(lo, np.asarray(witness.hi))
    proof = pk.prove(ir, setup, bad, CFG)
    assert not pk.verify(ir, setup.vk(), proof, CFG)


def test_copy_violation_rejected():
    ir, setup, witness = build_circuit()
    # satisfy the gate but break the copy chain: recompute row 4 with a w0
    # that does NOT equal w2[3]
    w = gl.to_ints(witness)
    w[0, 4] = (int(w[0, 4]) + 1) % P
    w[2, 4] = (int(w[0, 4]) * int(w[1, 4])) % P
    w[0, 5] = w[2, 4]  # keep the rest of the chain locally consistent
    # rows 5.. now violate gates; restrict the break to the copy by fixing
    # forward values
    for i in range(5, pk_N() - 1):
        w[2, i] = (int(w[0, i]) * int(w[1, i])) % P
        w[0, i + 1] = w[2, i]
    bad = gl.from_int(w)
    proof = pk.prove(ir, setup, bad, CFG)
    assert not pk.verify(ir, setup.vk(), proof, CFG)


def pk_N():
    return N


def test_tampered_stage2_rejected():
    ir, setup, witness = build_circuit()
    proof = pk.prove(ir, setup, witness, CFG)
    bad = proof.ood_stage2.copy()
    bad[0] = ((bad[0][0] + 1) % P, bad[0][1])
    proof.ood_stage2 = bad
    assert not pk.verify(ir, setup.vk(), proof, CFG)


def pi_ir():
    def eval_gates(alg, w, w_next, c):
        return [alg.mul(c[0], alg.sub(alg.mul(w[0], w[1]), w[2]))]

    return pk.PlonkishIR(log_n=LOG_N, num_witness=3, num_const=1,
                         gate_degree=3, num_gate_constraints=1,
                         eval_gates=eval_gates, copy_chunk=2,
                         public_input_cells=((0, 0), (2, N - 2)))


def test_public_inputs():
    ir = pi_ir()
    _, setup0, witness = build_circuit()
    setup = pk.build_setup(ir, gl.to_ints(setup0.const_cols), _perm(), CFG)
    proof = pk.prove(ir, setup, witness, CFG)
    assert proof.public_inputs[0] == 3  # w0[0]
    assert pk.verify(ir, setup.vk(), proof, CFG)
    # forged public input rejected
    proof.public_inputs = [5, proof.public_inputs[1]]
    assert not pk.verify(ir, setup.vk(), proof, CFG)


def _perm():
    cycles = [[(2, i), (0, i + 1)] for i in range(N - 1)]
    return pk.apply_copy_cycles(pk.identity_permutation(3, N), cycles)


def lookup_ir():
    """2 witness cols; no gates; w0 and w1 must be in the range table [0, 8)."""
    table = np.arange(8, dtype=object).reshape(8, 1)

    def eval_gates(alg, w, w_next, c):
        return []

    return pk.PlonkishIR(log_n=LOG_N, num_witness=2, num_const=0,
                         gate_degree=2, num_gate_constraints=0,
                         eval_gates=eval_gates, copy_chunk=2,
                         lookup_tables=(table,),
                         lookup_sets=((0, (0,)), (0, (1,))))


def test_lookup_roundtrip():
    ir = lookup_ir()
    w0 = np.array([i % 8 for i in range(N)], dtype=object)
    w1 = np.array([(3 * i) % 8 for i in range(N)], dtype=object)
    witness = gl.from_int(np.stack([w0, w1]))
    setup = pk.build_setup(ir, np.zeros((0, N), dtype=object),
                           pk.identity_permutation(2, N), CFG)
    proof = pk.prove(ir, setup, witness, CFG)
    assert pk.verify(ir, setup.vk(), proof, CFG)
    # tampered lookup helper rejected
    bad = proof.ood_stage3.copy()
    bad[0] = ((bad[0][0] + 1) % P, bad[0][1])
    proof.ood_stage3 = bad
    assert not pk.verify(ir, setup.vk(), proof, CFG)


def test_lookup_out_of_table_asserts():
    ir = lookup_ir()
    w0 = np.array([i % 8 for i in range(N)], dtype=object)
    w0[5] = 9  # not in table
    witness = gl.from_int(np.stack([w0, w0]))
    setup = pk.build_setup(ir, np.zeros((0, N), dtype=object),
                           pk.identity_permutation(2, N), CFG)
    with pytest.raises(AssertionError):
        pk.prove(ir, setup, witness, CFG)


def test_cross_instance_proof_swap_rejected(rng):
    """A proof for one witness does not verify as a proof of another circuit
    instance's public inputs (wrapper_negative_tests.rs discipline)."""
    ir = pi_ir()
    _, setup0, witness = build_circuit()
    setup = pk.build_setup(ir, gl.to_ints(setup0.const_cols), _perm(), CFG)
    proof = pk.prove(ir, setup, witness, CFG)
    # different FRI final poly (truncate to wrong size) -> reject not crash
    import copy
    bad = copy.deepcopy(proof)
    bad.fri.final_poly = bad.fri.final_poly + [(1, 0)]
    assert not pk.verify(ir, setup.vk(), bad, CFG)
    # nonzero coefficient above the degree bound -> reject
    bad2 = copy.deepcopy(proof)
    deg = len(bad2.fri.final_poly)
    bad2.fri.final_poly = bad2.fri.final_poly[: deg // 2] + \
        [(1, 1)] * (deg - deg // 2)
    assert not pk.verify(ir, setup.vk(), bad2, CFG)
