"""Queue-commitment circuit: full-width chain continuity via copy wiring."""

import numpy as np

from zkevm_harness_tpu.circuits import queue_circuit as qc
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.witness.queues import FullWidthQueueSimulator

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=16)


def test_queue_circuit_matches_simulator(rng):
    ir = qc.queue_ir(log_n=6)  # 2 blocks = 2 queue items
    setup = qc.queue_setup(ir, CFG)
    encs = [[int(v) for v in rng.integers(0, 2**62, size=8, dtype=np.uint64)]
            for _ in range(2)]
    witness = qc.queue_witness(ir, encs)
    proof = pk.prove(ir, setup, witness, CFG)
    assert pk.verify(ir, setup.vk(), proof, CFG)
    # the proven final tail equals the witness-side FULL-WIDTH simulator's
    # 12-lane tail state (circuit_encodings/src/lib.rs:391-429)
    sim = FullWidthQueueSimulator()
    sim.push_many(encs)
    assert tuple(proof.public_inputs[4:16]) == sim.tail
    assert proof.public_inputs[:4] == [0, 0, 0, 0]  # head capacity lanes


def test_queue_circuit_rejects_broken_chain(rng):
    ir = qc.queue_ir(log_n=6)
    setup = qc.queue_setup(ir, CFG)
    encs = [[1] * 8, [2] * 8]
    witness = qc.queue_witness(ir, encs)
    # break the wiring: tamper block 1's input capacity lane (col 8, row 32)
    # but keep its internal permutation self-consistent by recomputing the
    # block from the tampered input
    wit_np = gl.to_u64(witness).astype(object)
    state = [int(wit_np[c, 32]) for c in range(12)]
    state[8] = (state[8] + 1) % gl.P
    import zkevm_harness_tpu.circuits.poseidon2_circuit as p2c
    fixed = p2c.poseidon2_witness(ir, [[int(wit_np[c, 0]) for c in range(12)],
                                       state])
    proof = pk.prove(ir, setup, fixed, CFG)
    assert not pk.verify(ir, setup.vk(), proof, CFG)
