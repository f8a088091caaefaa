"""In-circuit Poseidon2 permutation: prove/verify + cross-check vs the kernel."""

import numpy as np

from zkevm_harness_tpu.circuits import poseidon2_circuit as pc
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import poseidon2 as p2
from zkevm_harness_tpu.prover import plonkish as pk

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=16)


def test_poseidon2_circuit_proves_permutation(rng):
    ir = pc.poseidon2_ir(log_n=6)  # 2 permutation blocks
    setup = pc.poseidon2_setup(ir, CFG)
    inp = [int(v) for v in rng.integers(0, 2**62, size=12, dtype=np.uint64)]
    witness = pc.poseidon2_witness(ir, [inp, [7] * 12])

    # the trace's output row must equal the batched device kernel's output
    want = gl.to_ints(p2.permute(gl.from_int(inp)))
    wit_np = gl.to_u64(witness)
    got = [int(wit_np[c, pc.ROWS_PER_PERMUTATION - 1]) for c in range(12)]
    assert got == [int(v) for v in want]

    proof = pk.prove(ir, setup, witness, CFG)
    # public inputs carry block 0's input and output states
    assert proof.public_inputs[:12] == [v % gl.P for v in inp]
    assert proof.public_inputs[12:] == got
    assert pk.verify(ir, setup.vk(), proof, CFG)

    # forged output rejected
    proof.public_inputs = proof.public_inputs[:12] + \
        [(got[0] + 1) % gl.P] + got[1:]
    assert not pk.verify(ir, setup.vk(), proof, CFG)


def test_poseidon2_circuit_rejects_bad_trace(rng):
    ir = pc.poseidon2_ir(log_n=6)
    setup = pc.poseidon2_setup(ir, CFG)
    witness = pc.poseidon2_witness(ir, [[1] * 12])
    lo = np.asarray(witness.lo).copy()
    lo[5, 10] ^= 1  # corrupt a mid-permutation state cell
    bad = gl.GF(lo, np.asarray(witness.hi))
    proof = pk.prove(ir, setup, bad, CFG)
    assert not pk.verify(ir, setup.vk(), proof, CFG)
