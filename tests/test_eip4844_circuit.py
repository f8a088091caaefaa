"""EIP-4844 equivalence circuit: proven Horner fold over BLS12-381 Fr,
cross-checked against the behavioral witness chain."""

import dataclasses as dc

import pytest

from zkevm_harness_tpu.circuits import eip4844_circuit as e4
from zkevm_harness_tpu.circuits import ffarith as ff
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.utils.bls12_381 import R

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)
N = 8  # mini-blob for CPU tests (production: 4096)
ELEMENTS = [(0x1234_5678_9ABC * (i + 1) ** 3 + i) % R for i in range(N)]
X = 0xDEAD_BEEF_0BAD_F00D_1234


@pytest.fixture(scope="module")
def rig():
    prog = e4.build_eip4844_program(N, limb_bits=8)
    inst = e4.instance_inputs(ELEMENTS, X)
    ir, setup = ff.ff_setup(prog.layout, CFG)
    W = e4.eip4844_witness(prog, ir, inst)
    proof = pk.prove(ir, setup, W, CFG)
    return dict(prog=prog, inst=inst, ir=ir, setup=setup, proof=proof)


def test_opening_matches_reference_fold(rig):
    """The proven opening equals the behavioral Horner fold — the same
    fold generate_eip4844_witness performs (witness/eip4844.py)."""
    prog, inst, proof = rig["prog"], rig["inst"], rig["proof"]
    expected = e4.expected_public_inputs(prog, inst)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected]
    acc = 0
    for i, el in enumerate(ELEMENTS):
        acc = (acc + el) % R
        if i != N - 1:
            acc = acc * (X % R) % R
    assert e4.opening_value(prog, proof.public_inputs) == acc


def test_proves_and_verifies(rig):
    assert pk.verify(rig["ir"], rig["setup"].vk(), rig["proof"], CFG)


def test_tampered_opening_rejected(rig):
    proof = rig["proof"]
    pis = list(proof.public_inputs)
    pis[-1] = (int(pis[-1]) + 1) % pk.gl.P
    bad = dc.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(rig["ir"], rig["setup"].vk(), bad, CFG)


def test_binding_accumulator_detects_swapped_elements(rig):
    """The fingerprint is ORDER-SENSITIVE (Horner in gamma): permuting the
    blob elements — which changes the fold result — changes the acc too."""
    inst = rig["inst"]
    swapped = list(inst.elements)
    swapped[0], swapped[1] = swapped[1], swapped[0]
    par = rig["prog"].params
    honest = ff.binding_accumulator(par, inst.challenge, inst.gamma,
                                    inst.elements)
    forged = ff.binding_accumulator(par, inst.challenge, inst.gamma, swapped)
    assert honest != forged


def test_tampered_element_breaks_acc_pi(rig):
    """A different blob cannot reuse the proof: its expected acc differs."""
    prog, inst = rig["prog"], rig["inst"]
    bad_inst = dc.replace(inst, elements=[(inst.elements[0] + 1) % R]
                          + inst.elements[1:])
    good = e4.expected_public_inputs(prog, inst)
    bad = e4.expected_public_inputs(prog, bad_inst)
    assert good[3] != bad[3]  # fp acc_out diverges


def test_typed_layer_surface():
    """prove_eip4844/verify_eip4844 over the behavioral witness chain
    (mini-blob: the production call passes n_elements=4096)."""
    from zkevm_harness_tpu.prover import layers as ly
    proof = ly.prove_eip4844(ELEMENTS, X, n_elements=N, limb_bits=8)
    assert ly.verify_eip4844(ELEMENTS, X, proof, n_elements=N, limb_bits=8)
    forged = [(ELEMENTS[0] + 1) % R] + ELEMENTS[1:]
    assert not ly.verify_eip4844(forged, X, proof, n_elements=N,
                                 limb_bits=8)
