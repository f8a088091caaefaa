"""Sha256 round-function circuit (type 6 core): word+bit hybrid compression
proofs bound to the decomposer's replay via fingerprint accumulators."""

import dataclasses as dc
import hashlib
import struct

import pytest

from zkevm_harness_tpu.circuits import sha256_circuit as sc
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.witness.precompile_rounds import sha256_decompose

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)


def test_round_trace_matches_hashlib():
    iv = (0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
          0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)
    data = b"abc"
    padded = data + b"\x80" + b"\x00" * 52 + (len(data) * 8).to_bytes(8, "big")
    _, _, digest = sc.sha256_round_trace(iv, padded)
    expected = struct.unpack(">8I", hashlib.sha256(data).digest())
    assert tuple(digest) == expected


@pytest.fixture(scope="module")
def rig():
    # two precompile calls -> 3 compressions (one 2-block input)
    dec = sha256_decompose([b"hello zkevm", b"y" * 100], capacity=8)
    assert len(dec.invocations) == 3
    assert dec.digests[0] == hashlib.sha256(b"hello zkevm").digest()
    ch, gm = sc.draw_sha256_challenges(dec.invocations)
    inst = sc.instance_inputs(dec.invocations, ch, gm)
    geo = sc.Sha256Geometry(log_n=8)  # 3 invocation slots (256 // 66)
    ir = sc.sha256_ir(geo.log_n)
    setup = sc.sha256_setup(ir, geo, CFG)
    W = sc.sha256_witness(ir, geo, inst)
    proof = pk.prove(ir, setup, W, CFG)
    return dict(geo=geo, ir=ir, setup=setup, inst=inst, proof=proof)


def test_sha256_instance_proves_and_verifies(rig):
    proof, inst, geo = rig["proof"], rig["inst"], rig["geo"]
    expected = sc.expected_public_inputs(geo, inst)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected]
    assert pk.verify(rig["ir"], rig["setup"].vk(), proof, CFG)


def test_tampered_digest_rejected(rig):
    """Claiming a wrong digest cannot satisfy the compression constraints."""
    inst = rig["inst"]
    h_in, block, dg = inst.triples[0]
    bad_triples = [(h_in, block, tuple([dg[0] ^ 1] + list(dg[1:])))] \
        + inst.triples[1:]
    bad = dc.replace(inst, triples=bad_triples)
    with pytest.raises(AssertionError):
        sc.sha256_witness(rig["ir"], rig["geo"], bad)


def test_tampered_accumulator_pi_rejected(rig):
    proof = rig["proof"]
    pis = list(proof.public_inputs)
    pis[-4] = (int(pis[-4]) + 1) % pk.gl.P  # first acc_out lane
    bad = dc.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(rig["ir"], rig["setup"].vk(), bad, CFG)


def test_fingerprint_binds_invocation_data(rig):
    inst = rig["inst"]
    h_in, block, dg = inst.triples[0]
    forged_block = bytes([block[0] ^ 4]) + block[1:]
    honest = sc.fingerprint(inst.challenges, inst.gammas, inst.triples)
    forged = sc.fingerprint(inst.challenges, inst.gammas,
                            [(h_in, forged_block, dg)] + inst.triples[1:])
    assert honest != forged


def test_partial_instance_counts(rig):
    """3 valid compressions in a 3-slot instance: count chain reflects it."""
    inst, geo = rig["inst"], rig["geo"]
    expected = sc.expected_public_inputs(geo, inst)
    assert expected[-1] == 3 and expected[-2] == 0
