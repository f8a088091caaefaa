"""Code-decommitter circuit (type 3): in-circuit chained sha256 of a
bytecode, digest cross-checked against the versioned code hash."""

import dataclasses as dc
import hashlib

import pytest

from zkevm_harness_tpu.circuits import decommitter_circuit as dcc
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.witness.decommitter import bytecode_hash

WORDS = [0xDEAD_0000 + i for i in range(3)]  # 96 bytes -> 2 sha256 blocks
CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)


@pytest.fixture(scope="module")
def rig():
    inst = dcc.instance_inputs(WORDS)
    assert len(inst.blocks) == 2
    geo = dcc.DecommitterGeometry(log_n=8)  # 3 compression slots
    ir = dcc.decommitter_ir(geo.log_n)
    setup = dcc.decommitter_setup(ir, geo, CFG)
    W = dcc.decommitter_witness(ir, geo, inst)
    proof = pk.prove(ir, setup, W, CFG)
    return dict(geo=geo, ir=ir, setup=setup, inst=inst, proof=proof)


def test_decommitter_proves_and_verifies(rig):
    proof, inst, geo = rig["proof"], rig["inst"], rig["geo"]
    expected = dcc.expected_public_inputs(geo, inst)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected]
    assert pk.verify(rig["ir"], rig["setup"].vk(), proof, CFG)


def test_digest_matches_versioned_hash(rig):
    """The proven digest IS the sha256 inside the versioned code hash."""
    dig = dcc.digest_bytes(rig["proof"].public_inputs)
    data = b"".join(int(w).to_bytes(32, "big") for w in WORDS)
    assert dig == hashlib.sha256(data).digest()
    vh = bytecode_hash(WORDS)
    assert vh & ((1 << 224) - 1) == int.from_bytes(dig[4:32], "big")


def test_tampered_digest_pi_rejected(rig):
    proof = rig["proof"]
    pis = list(proof.public_inputs)
    pis[-11] = (int(pis[-11]) + 1) % pk.gl.P
    bad = dc.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(rig["ir"], rig["setup"].vk(), bad, CFG)


def test_fingerprint_binds_code_words(rig):
    inst = rig["inst"]
    forged = [bytes([inst.blocks[0][0] ^ 1]) + inst.blocks[0][1:]] \
        + inst.blocks[1:]
    honest = dcc.fingerprint(inst.challenges, inst.gammas, inst.blocks)
    assert dcc.fingerprint(inst.challenges, inst.gammas, forged) != honest
