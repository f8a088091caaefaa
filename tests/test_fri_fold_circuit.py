"""FRI fold checks in-circuit, cross-validated against the host FRI verifier
fold computation."""

import numpy as np

from zkevm_harness_tpu.circuits import fri_fold_circuit as fc
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover.fri import INV2
from zkevm_harness_tpu.utils import field_int as fi

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=8)


def host_fold(a, b, alpha, d):
    """The exact fold expression fri_verify checks per query (fri.py)."""
    e = fi.escale(fi.eadd(a, b), INV2)
    o = fi.escale(fi.emul(fi.esub(a, b), (fi.finv(d), 0)), INV2)
    return fi.eadd(e, fi.emul(alpha, o))


def test_fold_circuit_matches_host_verifier(rng):
    ir = fc.fold_ir(log_n=5)
    rows = []
    for _ in range(10):
        a = (int(rng.integers(1, 2**62)), int(rng.integers(1, 2**62)))
        b = (int(rng.integers(1, 2**62)), int(rng.integers(1, 2**62)))
        alpha = (int(rng.integers(1, 2**62)), int(rng.integers(1, 2**62)))
        d = int(rng.integers(1, 2**62))
        rows.append((a, b, alpha, d))
    setup = fc.fold_setup(ir, [r[3] for r in rows], CFG)
    witness, folded = fc.fold_witness(ir, rows)
    # every circuit row equals the host verifier's fold value
    for (a, b, alpha, d), nxt in zip(rows, folded):
        assert nxt == host_fold(a, b, alpha, d)
    proof = pk.prove(ir, setup, witness, CFG)
    assert tuple(proof.public_inputs) == folded[0]
    assert pk.verify(ir, setup.vk(), proof, CFG)


def test_wrong_fold_rejected(rng):
    ir = fc.fold_ir(log_n=5)
    rows = [((3, 4), (5, 6), (7, 8), 11)]
    setup = fc.fold_setup(ir, [11], CFG)
    witness, folded = fc.fold_witness(ir, rows)
    w = gl.to_u64(witness).astype(object)
    w[fc.N0, 0] = (int(w[fc.N0, 0]) + 1) % gl.P  # forge the folded value
    proof = pk.prove(ir, setup, gl.from_int(w), CFG)
    assert not pk.verify(ir, setup.vk(), proof, CFG)
    # wrong d_inv also rejected
    w2 = gl.to_u64(witness).astype(object)
    w2[fc.DINV, 0] = (int(w2[fc.DINV, 0]) + 1) % gl.P
    proof2 = pk.prove(ir, setup, gl.from_int(w2), CFG)
    assert not pk.verify(ir, setup.vk(), proof2, CFG)
