"""In-SNARK verification of a compression-for-wrapper FRI proof.

The reference WrapperCircuit verifies the for-wrapper proof INSIDE the
BN254 PLONK circuit (src/proof_wrapper_utils/wrapper.rs:108-275). These
tests pin our transcription (utils/snark_fri_verifier.py): the Fr-sponge
transcript replay gadget against the host Bn254Transcript, and the FULL
verification circuit — transcript + OOD quotient identity + Merkle
membership + DEEP recompute + FRI folds — over a REAL for-wrapper proof,
including tamper rejection on public inputs, tree caps and OOD values.

The full PLONK prove of the ~380k-gate wrapper runs in the standalone/slow
tier (ZKTPU_SLOW=1; session numbers in BASELINE.md): padding to a 2^19 Fr
domain costs minutes of host FFT per proof. The gate-equation check run
here is the same satisfiability statement the PLONK prover commits to.
"""

import dataclasses as dc
import os
import pickle

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import queue_circuit as qc
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import ntt as nt
from zkevm_harness_tpu.prover import hash_backend as hb
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.utils import plonk_builder as pb
from zkevm_harness_tpu.utils import snark_fri_verifier as sfv
from zkevm_harness_tpu.utils.bn254 import R

P = gl.P
CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=2, final_fri_size=8)


def _gate_check(b, wires, pis):
    wa, wb, wc = wires
    pi_by_gate = dict(zip(b.public_gates, pis))
    for g in range(len(b.qL)):
        val = (b.qM[g] * wa[g] * wb[g] + b.qL[g] * wa[g] + b.qR[g] * wb[g]
               + b.qO[g] * wc[g] + b.qC[g] - pi_by_gate.get(g, 0)) % R
        assert val == 0, f"gate {g} violated"


def test_sponge_gadget_replays_host_transcript():
    """Absorb Fr + GL values, draw ext challenges and query bits: the
    in-circuit sponge must match hash_backend.Bn254Transcript exactly."""
    b = pb.PlonkBuilder()
    g = sfv.G(b)
    sp = sfv.SpongeGadget(g)
    fr_ins = [b.input() for _ in range(3)]
    gl_ins = [g.input_gl() for _ in range(5)]
    sp.absorb_vars(fr_ins)
    sp.absorb_gl(gl_ins)
    (c0a, c1a), _ = sp.challenge_ext()
    sp.absorb_gl([gl_ins[0]])
    (c0c, c1c), _ = sp.challenge_ext()
    qbits = sp.query_bits(5)
    for v in (c0a.var, c1a.var, c0c.var, c1c.var):
        b.mark_public(v)
    for v in qbits:
        b.mark_public(v)
    fr_vals = [123456789, 987654321, R - 5]
    gl_vals = [1, 2, 3, 0xFFFFFFFF00000000, 42]
    asg = dict(zip(fr_ins, fr_vals))
    asg.update({v.var: x for v, x in zip(gl_ins, gl_vals)})
    wires, pis = b.fill(asg)
    _gate_check(b, wires, pis)

    tr = hb.Bn254Transcript()
    tr.absorb_fr(fr_vals)
    tr.absorb_ints(gl_vals)
    e1 = tr.challenge_ext_ints()
    tr.absorb_ints([gl_vals[0]])
    e3 = tr.challenge_ext_ints()
    q = tr.query_indices(1, 32)[0]
    assert [int(x) % P for x in pis[:4]] == [e1[0], e1[1], e3[0], e3[1]]
    assert sum(int(pis[4 + k]) << k for k in range(5)) == int(q)


def test_input_gl_rejects_noncanonical():
    """input_gl must pin v < P (the transcript absorbs canonical bytes)."""
    b = pb.PlonkBuilder()
    g = sfv.G(b)
    v = g.input_gl()
    b.mark_public(v.var)
    wires, pis = b.fill({v.var: P - 1})
    _gate_check(b, wires, pis)
    wires, pis = b.fill({v.var: P})  # non-canonical: some gate must break
    with pytest.raises(AssertionError):
        _gate_check(b, wires, pis)


@pytest.fixture(scope="module")
def fw_proof():
    """A REAL compression-for-wrapper proof of the tiny queue circuit
    (Bn254-Fr-hashed trees + transcript), cached per test session."""
    cache = os.path.join(os.path.dirname(__file__), "..", ".crs_cache",
                         "fw_proof_fixture.pkl")
    ir = qc.queue_ir(5)
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            vk_fr, proof = pickle.load(f)
        return ir, vk_fr, proof
    setup = qc.queue_setup(ir, CFG)
    W = qc.queue_witness(ir, [[i + 1 for i in range(8)]])
    backend = hb.Bn254Backend()
    cols = gl.concatenate(
        [setup.const_cols, setup.sigma_cols, setup.table_cols], axis=0)
    tree = backend.commit_rows(
        gl.to_ints(nt.coset_lde(cols, CFG.rate)).T, CFG.cap_size)
    vk_fr = list(tree.cap)
    proof = pk.prove(ir, setup, W, CFG, backend=backend,
                     backend_setup=(vk_fr, tree))
    assert pk.verify(ir, vk_fr, proof, CFG, backend=backend)
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        with open(cache, "wb") as f:
            pickle.dump((vk_fr, proof), f)
    except OSError:
        pass
    return ir, vk_fr, proof


def test_full_statement_gate_checks(fw_proof):
    ir, vk_fr, proof = fw_proof
    stats = sfv.gate_check_fw(ir, CFG, vk_fr, proof)
    assert stats["n_gates"] > 100_000  # the real statement, not a stub
    # exposed public inputs: [fw_vk, inner PIs, packed]
    pis = stats["public_inputs"]
    assert pis[:len(vk_fr)] == [int(v) % R for v in vk_fr]
    k = len(vk_fr)
    m = len(proof.public_inputs)
    assert pis[k:k + m] == [int(v) % P for v in proof.public_inputs]
    from zkevm_harness_tpu.prover.compression import \
        compress_stark_pi_to_snark_pi
    assert pis[k + m] == compress_stark_pi_to_snark_pi(
        proof.public_inputs[-4:])


def test_tampered_public_input_rejected(fw_proof):
    ir, vk_fr, proof = fw_proof
    bad = dc.replace(proof, public_inputs=[
        (int(proof.public_inputs[0]) + 1) % P]
        + list(proof.public_inputs[1:]))
    with pytest.raises(AssertionError):
        sfv.gate_check_fw(ir, CFG, vk_fr, bad)


def test_tampered_cap_rejected(fw_proof):
    ir, vk_fr, proof = fw_proof
    cap2 = np.asarray(proof.witness_cap, dtype=object).copy()
    cap2[0] = int(cap2[0]) + 1
    with pytest.raises(AssertionError):
        sfv.gate_check_fw(ir, CFG, vk_fr,
                          dc.replace(proof, witness_cap=cap2))


def test_tampered_ood_rejected(fw_proof):
    ir, vk_fr, proof = fw_proof
    ood2 = list(proof.ood_witness)
    ood2[0] = ((int(ood2[0][0]) + 1) % P, ood2[0][1])
    with pytest.raises(AssertionError):
        sfv.gate_check_fw(ir, CFG, vk_fr,
                          dc.replace(proof, ood_witness=ood2))


def test_tampered_opening_rejected(fw_proof):
    ir, vk_fr, proof = fw_proof
    idx = sorted(proof.openings["witness"].keys())[0]
    op2 = {k: dict(v) for k, v in proof.openings.items()}
    row = list(op2["witness"][idx])
    row[0] = (int(row[0]) + 1) % P
    op2["witness"][idx] = row
    with pytest.raises(AssertionError):
        sfv.gate_check_fw(ir, CFG, vk_fr, dc.replace(proof, openings=op2))


@pytest.mark.skipif(os.environ.get("ZKTPU_SLOW") != "1",
                    reason="full PLONK prove of the wrapper takes minutes "
                           "(set ZKTPU_SLOW=1; session numbers in "
                           "BASELINE.md)")
def test_full_plonk_prove_of_wrapper(fw_proof):
    ir, vk_fr, proof = fw_proof
    setup, snark, lay = sfv.wrap_fw_proof(ir, CFG, vk_fr, proof)
    assert sfv.verify_fw_wrapped(
        setup.vk, snark, expected_fw_vk=vk_fr,
        expected_inner_pis=proof.public_inputs)
