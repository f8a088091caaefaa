"""Keccak-f round-function circuit (type 5 core): bit-column permutation
proofs bound to the decomposer's replay via fingerprint accumulators."""

import dataclasses as dc

import pytest

from zkevm_harness_tpu.circuits import keccak_circuit as kc
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.utils.keccak import keccak256, keccak_f
from zkevm_harness_tpu.witness.precompile_rounds import keccak256_decompose

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)


def test_round_trace_matches_reference():
    state = tuple((i * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
                  for i in range(25))
    A_rows, _, _ = kc.keccak_round_trace(state)
    m = [[state[x + 5 * y] for y in range(5)] for x in range(5)]
    ref = keccak_f(m)
    assert list(A_rows[-1]) == [ref[i % 5][i // 5] for i in range(25)]


@pytest.fixture(scope="module")
def rig():
    # two precompile calls -> 3 keccak-f invocations (one 2-block input)
    dec = keccak256_decompose([b"hello zkevm", b"x" * 200], capacity=8)
    assert len(dec.invocations) == 3
    assert dec.digests[0] == keccak256(b"hello zkevm")
    ch, gm = kc.draw_keccak_challenges(dec.invocations)
    inst = kc.instance_inputs(dec.invocations, ch, gm)
    geo = kc.KeccakGeometry(log_n=7)  # 4 invocation slots
    ir = kc.keccak_ir(geo.log_n)
    setup = kc.keccak_setup(ir, geo, CFG)
    W = kc.keccak_witness(ir, geo, inst)
    proof = pk.prove(ir, setup, W, CFG)
    return dict(geo=geo, ir=ir, setup=setup, inst=inst, proof=proof)


def test_keccak_instance_proves_and_verifies(rig):
    proof, inst, geo = rig["proof"], rig["inst"], rig["geo"]
    expected = kc.expected_public_inputs(geo, inst)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected]
    assert pk.verify(rig["ir"], rig["setup"].vk(), proof, CFG)


def test_tampered_output_state_rejected(rig):
    """Claiming a wrong output state cannot satisfy the round constraints."""
    inst = rig["inst"]
    si, so = inst.state_pairs[0]
    bad_pairs = [((si, tuple([so[0] ^ 1] + list(so[1:]))))] \
        + inst.state_pairs[1:]
    bad = dc.replace(inst, state_pairs=bad_pairs)
    with pytest.raises(AssertionError):
        kc.keccak_witness(rig["ir"], rig["geo"], bad)


def test_tampered_accumulator_pi_rejected(rig):
    proof = rig["proof"]
    pis = list(proof.public_inputs)
    pis[-4] = (int(pis[-4]) + 1) % pk.gl.P  # first acc_out lane
    bad = dc.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(rig["ir"], rig["setup"].vk(), bad, CFG)


def test_fingerprint_binds_invocation_data(rig):
    """Swapping an invocation's input state changes the expected
    accumulator, so a verifier pinning the decomposer's fingerprint catches
    substitution."""
    inst = rig["inst"]
    si, so = inst.state_pairs[0]
    si2 = tuple([si[0] ^ 2] + list(si[1:]))
    honest = kc.fingerprint(inst.challenges, inst.gammas, inst.state_pairs)
    forged = kc.fingerprint(inst.challenges, inst.gammas,
                            [(si2, so)] + inst.state_pairs[1:])
    assert honest != forged


def test_partial_instance_counts(rig):
    """3 valid invocations in a 4-slot instance: count chain reflects it."""
    inst, geo = rig["inst"], rig["geo"]
    expected = kc.expected_public_inputs(geo, inst)
    assert expected[-1] == 3 and expected[-2] == 0
