"""Lean-HBM mode (streamed DEEP + per-bundle openings) must be transcript-
identical to the retain-LDE path: the DEEP combination is additive over
bundles, so streaming it one commitment LDE at a time changes peak memory,
never the proof."""

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import flagship as fl
from zkevm_harness_tpu.prover import plonkish as pk

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)


@pytest.fixture(scope="module")
def rig():
    ir = fl.flagship_ir(log_n=6, width=8)
    setup = fl.flagship_setup(ir, CFG)
    witness = fl.flagship_witness(ir, seed=7)
    return ir, setup, witness


def _proof_fields(p):
    return (p.public_inputs, p.witness_cap, p.stage2_cap, p.stage3_cap,
            p.quotient_cap, p.ood_witness, p.ood_witness_next, p.ood_stage2,
            p.ood_stage2_next, p.ood_stage3, p.ood_stage3_next, p.ood_table,
            p.ood_const, p.ood_sigma, p.ood_quotient, p.openings)


def _canon(x):
    """Recursively normalize a proof field to plain python for equality."""
    if isinstance(x, dict):
        return {k: _canon(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_canon(v) for v in x]
    if isinstance(x, np.ndarray):
        return [_canon(v) for v in x.tolist()]
    return int(x) if isinstance(x, (int, np.integer)) else x


def test_lean_mode_matches_retain_lde(rig):
    ir, setup, witness = rig
    normal = pk.prove(ir, setup, witness, CFG)
    try:
        pk.FORCE_LEAN = True
        lean = pk.prove(ir, setup, witness, CFG)
    finally:
        pk.FORCE_LEAN = False
    for name, a, b in zip(
            ("pi", "wcap", "s2cap", "s3cap", "qcap", "ow", "own", "os2",
             "os2n", "os3", "os3n", "otab", "oconst", "osig", "oq", "open"),
            _proof_fields(normal), _proof_fields(lean)):
        assert _canon(a) == _canon(b), f"proof field {name} diverged"
    assert list(normal.fri.query_positions) == list(lean.fri.query_positions)
    assert pk.verify(ir, setup.vk(), lean, CFG)


def test_lean_mode_verifies_with_lookups(rig):
    """Flagship has lookup sets; also pin a lean proof end-to-end."""
    ir, setup, witness = rig
    try:
        pk.FORCE_LEAN = True
        proof = pk.prove(ir, setup, witness, CFG)
    finally:
        pk.FORCE_LEAN = False
    assert pk.verify(ir, setup.vk(), proof, CFG)
