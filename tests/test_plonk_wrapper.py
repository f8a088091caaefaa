"""BN254 pairing, PLONK protocol, and the SNARK wrapper skeleton
(proof_wrapper_utils/wrapper.rs role)."""

import dataclasses as dc

import pytest

from zkevm_harness_tpu.utils import bn254 as bn
from zkevm_harness_tpu.utils import plonk as pl
from zkevm_harness_tpu.utils import snark_wrapper as sw


def test_pairing_bilinearity():
    e1 = bn.pairing(bn.g1_mul(bn.G1_GENERATOR, 6), bn.G2_GENERATOR)
    e2 = bn.pairing(bn.g1_mul(bn.G1_GENERATOR, 2),
                    bn.g2_mul(bn.G2_GENERATOR, 3))
    e3 = bn.f12_pow(bn.pairing(bn.G1_GENERATOR, bn.G2_GENERATOR), 6)
    assert e1 == e2 == e3 != bn.F12_ONE


def test_kzg_open_verify():
    crs = bn.simulated_crs(8)
    g2p = bn.simulated_crs_g2()
    coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
    C = bn.kate_commit(crs, coeffs)
    w, y = bn.kate_open(crs, coeffs, 0xDEAD)
    assert y == pl.poly_eval(coeffs, 0xDEAD)
    assert bn.kate_verify(g2p, C, 0xDEAD, y, w)
    assert not bn.kate_verify(g2p, C, 0xDEAD, (y + 1) % bn.R, w)
    assert not bn.kate_verify(g2p, C, 0xDEAD + 1, y, w)


@pytest.fixture(scope="module")
def wrapper_rig():
    setup = sw.wrapper_setup()
    pis = [0x1234_5678_9ABC_DEF0, 0x0FED_CBA9_8765_4321,
           0xAAAA_BBBB_CCCC_DDDD, 0x0123_4567_89AB_CDEF]
    proof = sw.wrap_scheduler_pi(setup, pis)
    return dict(setup=setup, pis=pis, proof=proof)


def test_plonk_wrapper_proves_and_verifies(wrapper_rig):
    setup, pis, proof = (wrapper_rig["setup"], wrapper_rig["pis"],
                         wrapper_rig["proof"])
    assert sw.verify_wrapped_proof(setup.vk, proof,
                                   expected_scheduler_pi=pis)
    from zkevm_harness_tpu.prover.compression import (
        compress_stark_pi_to_snark_pi)
    assert proof.public_inputs[-1] == compress_stark_pi_to_snark_pi(pis)


def test_plonk_rejects_tampered_public_input(wrapper_rig):
    setup, proof = wrapper_rig["setup"], wrapper_rig["proof"]
    bad_pis = list(proof.public_inputs)
    bad_pis[0] = (bad_pis[0] + 1) % bn.R
    bad = dc.replace(proof, public_inputs=bad_pis)
    assert not sw.verify_wrapped_proof(setup.vk, bad)


def test_plonk_rejects_tampered_evaluation(wrapper_rig):
    setup, proof = wrapper_rig["setup"], wrapper_rig["proof"]
    evals = dict(proof.evals)
    evals["a"] = (evals["a"] + 1) % bn.R
    bad = dc.replace(proof, evals=evals)
    assert not pl.plonk_verify(setup.vk, bad)


def test_plonk_rejects_tampered_commitment(wrapper_rig):
    setup, proof = wrapper_rig["setup"], wrapper_rig["proof"]
    comms = dict(proof.comms)
    comms["z"] = bn.g1_add(comms["z"], bn.G1_GENERATOR)
    bad = dc.replace(proof, comms=comms)
    assert not pl.plonk_verify(setup.vk, bad)


def test_plonk_rejects_wrong_packing(wrapper_rig):
    """A proof claiming a packed value inconsistent with its chunks cannot
    satisfy the wrapper circuit."""
    setup = wrapper_rig["setup"]
    pis = [1, 2, 3, 4]
    c = [int(v) % bn.R for v in pis]
    S = 1 << 56
    t1 = (c[0] * S + c[1]) % bn.R
    t2 = (t1 * S + c[2]) % bn.R
    packed_bad = (t2 * S + c[3] + 1) % bn.R
    wa = [c[0], c[1], c[2], c[3], packed_bad, c[0], t1, t2]
    wb = [0, 0, 0, 0, 0, c[1], c[2], c[3]]
    wc = [0, 0, 0, 0, 0, t1, t2, packed_bad]
    with pytest.raises(AssertionError):
        # the quotient cannot divide cleanly -> degree overflow assert
        pl.plonk_prove(setup, (wa, wb, wc), c + [packed_bad])


def test_plonk_copy_permutation_enforced(wrapper_rig):
    """Breaking a copy wire (t1 used in gate 6 differs from gate 5's output)
    is refused by the grand-product closure."""
    setup = wrapper_rig["setup"]
    c = [5, 6, 7, 8]
    S = 1 << 56
    t1 = (c[0] * S + c[1]) % bn.R
    t1_forged = (t1 + 1) % bn.R
    t2 = (t1_forged * S + c[2]) % bn.R
    packed = (t2 * S + c[3]) % bn.R
    wa = [c[0], c[1], c[2], c[3], packed, c[0], t1_forged, t2]
    wb = [0, 0, 0, 0, 0, c[1], c[2], c[3]]
    wc = [0, 0, 0, 0, 0, t1, t2, packed]
    with pytest.raises(AssertionError):
        pl.plonk_prove(setup, (wa, wb, wc), c + [packed])
