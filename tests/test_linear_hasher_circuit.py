"""Linear-hasher circuit (type 13): an in-circuit keccak256 with proven
sponge chaining and digest extraction."""

import dataclasses as dc

import pytest

from zkevm_harness_tpu.circuits import linear_hasher_circuit as lh
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.utils.keccak import keccak256

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)
DATA = b"l1 message payload " * 11   # 209 bytes -> 2 keccak-f blocks


@pytest.fixture(scope="module")
def rig():
    inst = lh.instance_inputs(DATA)
    assert len(inst.blocks) == 2
    geo = lh.HasherGeometry(log_n=7)  # 4 invocation slots
    ir = lh.hasher_ir(geo.log_n)
    setup = lh.hasher_setup(ir, geo, CFG)
    W = lh.hasher_witness(ir, geo, inst)
    proof = pk.prove(ir, setup, W, CFG)
    return dict(geo=geo, ir=ir, setup=setup, inst=inst, proof=proof)


def test_hasher_proves_and_verifies(rig):
    proof, inst, geo = rig["proof"], rig["inst"], rig["geo"]
    expected = lh.expected_public_inputs(geo, inst)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected]
    assert pk.verify(rig["ir"], rig["setup"].vk(), proof, CFG)


def test_digest_matches_keccak256(rig):
    """The proven digest PIs ARE keccak256 of the input stream."""
    assert lh.digest_bytes(rig["proof"].public_inputs) == keccak256(DATA)


def test_tampered_digest_pi_rejected(rig):
    proof = rig["proof"]
    pis = list(proof.public_inputs)
    pis[-11] = (int(pis[-11]) + 1) % pk.gl.P  # first digest limb
    bad = dc.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(rig["ir"], rig["setup"].vk(), bad, CFG)


def test_tampered_accumulator_pi_rejected(rig):
    proof = rig["proof"]
    pis = list(proof.public_inputs)
    pis[6] = (int(pis[6]) + 1) % pk.gl.P  # first acc_out lane
    bad = dc.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(rig["ir"], rig["setup"].vk(), bad, CFG)


def test_fingerprint_binds_blocks(rig):
    inst = rig["inst"]
    forged = [bytes([inst.blocks[0][0] ^ 1]) + inst.blocks[0][1:]] \
        + inst.blocks[1:]
    honest = lh.fingerprint(inst.challenges, inst.gammas, inst.blocks)
    assert lh.fingerprint(inst.challenges, inst.gammas, forged) != honest


def test_empty_data_digest():
    """keccak256(b'') still runs one padded permutation."""
    inst = lh.instance_inputs(b"")
    assert len(inst.blocks) == 1
    geo = lh.HasherGeometry(log_n=5)  # single slot
    expected = lh.expected_public_inputs(geo, inst)
    limbs = expected[-11:-3]
    out = b""
    for l in range(4):
        lane = int(limbs[2 * l]) | (int(limbs[2 * l + 1]) << 32)
        out += lane.to_bytes(8, "little")
    assert out == keccak256(b"")
