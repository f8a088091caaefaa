"""Degree-stratified quotient (PlonkishIR.gate_part_degrees) bit-identity.

The stratified prover evaluates each constraint family only on the cosets
its quotient degree needs (plonkish._coset_fn_strat); because the field
arithmetic is exact, the per-class coefficient vectors sum to the IDENTICAL
total quotient polynomial, so whole proofs must be byte-equal to the
unstratified path. tests/test_golden.py pins the same property against the
committed artifacts (the golden flagship proof predates stratification).
"""

import dataclasses

import numpy as np

from zkevm_harness_tpu.circuits import flagship as fl
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk


def _proof_blob(proof):
    from zkevm_harness_tpu.utils import serde
    import json
    return json.dumps(serde.proof_to_json(proof), sort_keys=True)


def test_stratified_proof_bit_identical():
    cfg = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8,
                            final_fri_size=8)
    ir = fl.flagship_ir(log_n=6, width=8)
    assert ir.gate_part_degrees is not None  # flagship opts in
    setup = fl.flagship_setup(ir, cfg)
    wit = fl.flagship_witness(ir)
    p_strat = pk.prove(ir, setup, wit, cfg)
    ir_flat = dataclasses.replace(ir, gate_part_degrees=None,
                                  gate_part_cols=None)
    p_flat = pk.prove(ir_flat, setup, wit, cfg)
    assert _proof_blob(p_strat) == _proof_blob(p_flat)
    assert pk.verify(ir, setup.vk(), p_strat, cfg)


def test_stratified_classes():
    """Class sizes: sbox deg 8 -> 8 cosets, chain deg 3 -> 2, copy chunk 4
    -> 4, lookup/boundary/PI -> 1."""
    ir = fl.flagship_ir(log_n=6, width=8)
    _call, class_Ds = pk._coset_fn_strat(ir, 8)
    assert class_Ds == [1, 2, 4, 8]


def test_stratified_rejects_bad_witness():
    """A witness violating a LOW-degree (chain) constraint must still fail
    verification through the stratified path."""
    cfg = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8,
                            final_fri_size=8)
    ir = fl.flagship_ir(log_n=6, width=8)
    setup = fl.flagship_setup(ir, cfg)
    wit = fl.flagship_witness(ir)
    bad = gl.to_u64(wit).copy()
    bad[4, 7] = (int(bad[4, 7]) + 1) % gl.P  # break chain gate at row 7
    p = pk.prove(ir, setup, gl.from_u64(bad), cfg)
    assert not pk.verify(ir, setup.vk(), p, cfg)
