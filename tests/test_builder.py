"""Gadget-synthesis builder: lowering, witness eval, prove/verify, tamper.

The recursion kernel's circuit compiler (reference analogue: boojum CS
gadget synthesis driving recursion-layer circuits)."""

import dataclasses as dc

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import builder as bd
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import poseidon2 as p2
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover import satisfy
from zkevm_harness_tpu.utils import field_int as fi

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=8)
P = gl.P


def _check(built, W, pis):
    return satisfy.check_satisfied(
        built.ir, gl.to_ints(W), np.asarray(built.const_cols, dtype=object),
        built.permutation, pis)


def test_perm_trace_matches_device_poseidon2(rng):
    state = [int(v) for v in rng.integers(0, P - 1, size=12, dtype=np.uint64)]
    trace = bd.perm_trace_host(state)
    expect = gl.to_ints(p2.permute(gl.from_int(state)))
    assert [int(v) for v in trace[-1]] == [int(v) for v in expect]


def test_builder_arith_and_hints(rng):
    b = bd.CircuitBuilder(slots=4)
    ext = bd.ExtOps(b)
    x = b.inputs(2)
    y = b.inputs(2)
    prod = ext.mul((x[0], x[1]), (y[0], y[1]))
    inv = ext.inverse(prod)
    base_inv = b.inverse(x[0])
    bit = b.bit(lambda v: v & 1, (x[0],))
    m = b.mux(bit, x[0], y[0])
    for v in x + y + [prod[0], prod[1], inv[0], inv[1], base_inv, m]:
        b.mark_public(v)
    built = b.finalize()

    vals = {x[0]: 3, x[1]: 5, y[0]: int(rng.integers(1, 2**62)), y[1]: 9}
    W = b.fill_witness(vals)
    pis = b.public_values(vals)
    assert _check(built, W, pis) == []
    # cross-check the ext math against the host field
    pr = fi.emul((3, 5), (vals[y[0]], 9))
    assert (pis[4], pis[5]) == pr
    assert fi.emul(pr, (pis[6], pis[7])) == (1, 0)
    assert pis[8] == pow(3, P - 2, P)
    assert pis[9] == (3 if 3 & 1 else vals[y[0]])


def test_builder_poseidon_region_and_proof(rng):
    b = bd.CircuitBuilder(slots=4)
    state_in = b.inputs(12)
    out = b.poseidon2(state_in)
    # chain a second permutation whose capacity comes from the first
    chunk = b.inputs(8)
    out2 = b.poseidon2(list(chunk) + list(out[8:12]))
    for v in state_in + out2[:4]:
        b.mark_public(v)
    built = b.finalize()

    sv = [int(v) for v in rng.integers(0, P - 1, size=20, dtype=np.uint64)]
    vals = {v: sv[i] for i, v in enumerate(state_in + chunk)}
    W = b.fill_witness(vals)
    pis = b.public_values(vals)
    assert _check(built, W, pis) == []

    # host cross-check of the chained sponge
    s1 = gl.to_ints(p2.permute(gl.from_int(sv[:12])))
    s2_in = sv[12:20] + [int(v) for v in s1[8:12]]
    s2 = gl.to_ints(p2.permute(gl.from_int(s2_in)))
    assert pis[12:16] == [int(v) for v in s2[:4]]

    # full prove/verify + PI tamper
    setup = built.setup(CFG)
    proof = pk.prove(built.ir, setup, W, CFG)
    assert pk.verify(built.ir, setup.vk(), proof, CFG)
    assert [int(v) for v in proof.public_inputs] == [v % P for v in pis]
    bad = dc.replace(proof, public_inputs=[(int(v) + 1) % P
                                           for v in proof.public_inputs])
    assert not pk.verify(built.ir, setup.vk(), bad, CFG)


def test_builder_rejects_bad_hint(rng):
    """A lying inverse hint must make the circuit unsatisfiable."""
    b = bd.CircuitBuilder(slots=4)
    x = b.input()
    b.inverse(x)
    b.mark_public(x)
    built = b.finalize()
    W = gl.to_ints(b.fill_witness({x: 7}))
    # find the inverse cell and corrupt it
    inv_cell = b.cells[1][0]
    W2 = W.copy()
    W2[inv_cell[0], inv_cell[1]] = (int(W2[inv_cell[0], inv_cell[1]]) + 1) % P
    viol = satisfy.check_satisfied(
        built.ir, W2, np.asarray(built.const_cols, dtype=object),
        built.permutation, b.public_values({x: 7}))
    assert viol
