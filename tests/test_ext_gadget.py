"""In-circuit GF(p^2) squaring chain vs exact host math."""

import numpy as np

from zkevm_harness_tpu.circuits import ext_gadget as eg
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.utils import field_int as fi

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=8)


def test_ext_squaring_chain(rng):
    ir = eg.ext_chain_ir(log_n=4)  # 16 rows -> a^(2^15)
    setup = eg.ext_chain_setup(ir, CFG)
    a = (int(rng.integers(1, 2**62)), int(rng.integers(1, 2**62)))
    witness = eg.ext_chain_witness(ir, a)
    proof = pk.prove(ir, setup, witness, CFG)
    want = eg.expected_power(a, 4)
    assert tuple(proof.public_inputs[:2]) == (a[0], a[1])
    assert tuple(proof.public_inputs[2:]) == want
    assert pk.verify(ir, setup.vk(), proof, CFG)
    # forged power output rejected
    proof.public_inputs = list(proof.public_inputs[:2]) + \
        [(want[0] + 1) % gl.P, want[1]]
    assert not pk.verify(ir, setup.vk(), proof, CFG)


def test_broken_chain_rejected(rng):
    ir = eg.ext_chain_ir(log_n=4)
    setup = eg.ext_chain_setup(ir, CFG)
    witness = eg.ext_chain_witness(ir, (3, 5))
    w = gl.to_u64(witness).astype(object)
    # break the copy chain at row 7: change a but keep the row's own gate
    # locally satisfied by recomputing its product
    w[eg.A0, 7] = (int(w[eg.A0, 7]) + 1) % gl.P
    w[eg.B0, 7] = w[eg.A0, 7]
    prod = fi.emul((int(w[eg.A0, 7]), int(w[eg.A1, 7])),
                   (int(w[eg.B0, 7]), int(w[eg.B1, 7])))
    w[eg.C0, 7], w[eg.C1, 7] = prod
    # ... and keep downstream rows consistent with the corrupted chain
    cur = prod
    for i in range(8, 15):
        sq = fi.emul(cur, cur)
        w[eg.A0, i], w[eg.A1, i] = cur
        w[eg.B0, i], w[eg.B1, i] = cur
        w[eg.C0, i], w[eg.C1, i] = sq
        cur = sq
    proof = pk.prove(ir, setup, gl.from_int(w), CFG)
    assert not pk.verify(ir, setup.vk(), proof, CFG)


def test_inverse_cells(rng):
    ir = eg.inverse_ir(log_n=5)
    setup = eg.inverse_setup(ir, CFG, active_rows=8)
    xs = [int(v) for v in rng.integers(1, 2**62, size=8, dtype=np.uint64)]
    witness = eg.inverse_witness(ir, xs)
    proof = pk.prove(ir, setup, witness, CFG)
    assert pk.verify(ir, setup.vk(), proof, CFG)
    assert (proof.public_inputs[0] * proof.public_inputs[1]) % gl.P == 1
    # a wrong inverse on an active row is rejected
    w = gl.to_u64(witness).astype(object)
    w[1, 3] = (int(w[1, 3]) + 1) % gl.P
    bad = pk.prove(ir, setup, gl.from_int(w), CFG)
    assert not pk.verify(ir, setup.vk(), bad, CFG)
