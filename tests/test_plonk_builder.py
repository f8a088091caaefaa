"""PLONK gadget builder + native BN254 MSM + binding wrapper circuit."""

import random

import pytest

from zkevm_harness_tpu.utils import bn254 as bn
from zkevm_harness_tpu.utils import plonk as pl
from zkevm_harness_tpu.utils import plonk_builder as pb
from zkevm_harness_tpu.utils import poseidon2_bn254 as p2b
from zkevm_harness_tpu.utils import snark_wrapper as sw

R = bn.R


def _gate_check(b: pb.PlonkBuilder, wires, pis):
    """Every gate equation must hold on the filled wires (with public
    gates consuming their PI)."""
    wa, wb, wc = wires
    pi_by_gate = dict(zip(b.public_gates, pis))
    for g in range(len(b.qL)):
        val = (b.qM[g] * wa[g] * wb[g] + b.qL[g] * wa[g] + b.qR[g] * wb[g]
               + b.qO[g] * wc[g] + b.qC[g] - pi_by_gate.get(g, 0)) % R
        assert val == 0, f"gate {g} violated"


def test_poseidon2_gadget_matches_host_permutation():
    b = pb.PlonkBuilder()
    xs = b.inputs(3)
    out = b.poseidon2(list(xs))
    for v in out:
        b.mark_public(v)
    wires, pis = b.fill({xs[0]: 5, xs[1]: 6, xs[2]: 7})
    assert pis == p2b.permute([5, 6, 7])
    _gate_check(b, wires, pis)


def test_hash_gadget_matches_host_sponge():
    b = pb.PlonkBuilder()
    xs = b.inputs(5)
    d = b.hash_elements(list(xs))
    b.mark_public(d)
    vals = [11, 22, 33, 44, 55]
    wires, pis = b.fill(dict(zip(xs, vals)))
    assert pis[0] == p2b.hash_elements(vals)
    _gate_check(b, wires, pis)


def test_small_gadget_circuit_proves():
    """End-to-end PLONK prove/verify of one in-SNARK permutation."""
    b = pb.PlonkBuilder()
    xs = b.inputs(3)
    out = b.poseidon2(list(xs))
    b.mark_public(out[0])
    circ = b.finalize()
    setup = pl.plonk_setup(circ)
    wires, pis = b.fill({xs[0]: 1, xs[1]: 2, xs[2]: 3})
    proof = pl.plonk_prove(setup, wires, pis)
    assert pl.plonk_verify(setup.vk, proof)
    assert int(proof.public_inputs[0]) == p2b.permute([1, 2, 3])[0]


def test_binding_wrapper_circuit_gates():
    """The upgraded wrapper statement: packing + in-SNARK Poseidon2 binding
    digest over [for-wrapper VK || scheduler PI chunks] — gate-checked
    (the full prove runs in the standalone path; wrap_with_binding)."""
    b, lay = sw.build_binding_wrapper_circuit()
    fw_vk, chunks = [11, 22, 33, 44], [1, 2, 3, 4]
    asg = dict(zip(lay["vk"], fw_vk))
    asg.update(dict(zip(lay["chunks"], chunks)))
    wires, pis = b.fill(asg)
    _gate_check(b, wires, pis)
    from zkevm_harness_tpu.prover.compression import (
        compress_stark_pi_to_snark_pi)
    assert pis[8] == compress_stark_pi_to_snark_pi(chunks)
    assert pis[9] == p2b.hash_elements(fw_vk + chunks)


def test_native_msm_matches_python():
    random.seed(3)
    G = bn.G1_GENERATOR
    pts = [bn.g1_mul(G, random.randrange(1, bn.R)) for _ in range(30)]
    pts += [None, G]
    sc = [random.randrange(bn.R) for _ in range(31)] + [0]
    try:
        from zkevm_harness_tpu.utils.native import bn254_msm
        got = bn254_msm(pts, sc)
    except RuntimeError:
        pytest.skip("native library unavailable")
    want = None
    for pt, s in zip(pts, sc):
        if pt is None or s % bn.R == 0:
            continue
        want = bn.g1_add(want, bn.g1_mul(pt, s))
    assert got == want


def test_native_bls_msm_matches_python():
    random.seed(9)
    from zkevm_harness_tpu.utils import bls12_381 as bls
    G = bls.G1_GENERATOR
    pts = [bls.g1_mul(G, random.randrange(1, bls.R)) for _ in range(20)]
    pts += [None, G]
    sc = [random.randrange(bls.R) for _ in range(21)] + [0]
    try:
        from zkevm_harness_tpu.utils.native import bls12381_msm
        got = bls12381_msm(pts, sc)
    except RuntimeError:
        pytest.skip("native library unavailable")
    want = None
    for pt, s in zip(pts, sc):
        if pt is None or s % bls.R == 0:
            continue
        want = bls.g1_add(want, bls.g1_mul(pt, s))
    assert got == want
