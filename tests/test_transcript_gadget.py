"""In-circuit transcript: extracted challenges equal the prover transcript."""

import numpy as np

from zkevm_harness_tpu.circuits import transcript_gadget as tg
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=16)


def test_challenges_match_host_transcript(rng):
    chunks = [[int(v) for v in rng.integers(0, 2**62, size=8, dtype=np.uint64)]
              for _ in range(2)]
    ir = tg.transcript_ir(log_n=6, challenge_blocks=[0, 1])
    setup = tg.transcript_setup(ir, CFG)
    witness = tg.transcript_witness(ir, chunks)
    proof = pk.prove(ir, setup, witness, CFG)
    assert pk.verify(ir, setup.vk(), proof, CFG)
    # PI layout: 4 fresh-capacity zeros, then (c0, c1) per challenge block
    assert proof.public_inputs[:4] == [0, 0, 0, 0]
    want = tg.expected_challenges(chunks, [0, 1])
    got = [(proof.public_inputs[4], proof.public_inputs[5]),
           (proof.public_inputs[6], proof.public_inputs[7])]
    assert got == want
    # the load-bearing property for the verifier circuit: ONE continuous
    # host transcript with interleaved absorb/draw yields the same chain
    # (duplex semantics — drawing does not advance the sponge state)
    from zkevm_harness_tpu.prover.transcript import Transcript
    tr = Transcript()
    tr.absorb_ints(chunks[0])
    c0 = tr.challenge_ext_ints()
    tr.absorb_ints(chunks[1])
    c1 = tr.challenge_ext_ints()
    assert [c0, c1] == want
    # forged challenge rejected
    forged = list(proof.public_inputs)
    forged[4] = (forged[4] + 1) % gl.P
    proof.public_inputs = forged
    assert not pk.verify(ir, setup.vk(), proof, CFG)
