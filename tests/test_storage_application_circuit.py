"""Storage-application circuit (type 10): Blake2s Merkle paths proven
in-circuit, digest rules identical to the production tree
(witness/tree.py leaf_hash/node_hash). Tests run depth 4; production
instantiates depth 256 with the same gate set."""

import dataclasses as dc
import hashlib

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import storage_application_circuit as sac
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover import satisfy
from zkevm_harness_tpu.witness.tree import leaf_hash, node_hash

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)
GEO = sac.PathGeometry(depth=4)

ENUM_INDEX = 7
VALUE = (0xBEEF_0000_1234).to_bytes(32, "big")
LEAF_PREIMAGE = ENUM_INDEX.to_bytes(8, "big") + VALUE
PATH_BITS = [1, 0, 1, 1]
SIBLINGS = [hashlib.blake2s(bytes([i])).digest() for i in range(4)]


def _expected_root():
    dig = leaf_hash(ENUM_INDEX, VALUE)
    for bit, sib in zip(PATH_BITS, SIBLINGS):
        dig = node_hash(sib, dig) if bit else node_hash(dig, sib)
    return dig


def test_compression_matches_hashlib():
    for data in (b"", b"abc", b"x" * 40, b"y" * 64):
        assert sac.blake2s_digest(data) == hashlib.blake2s(data).digest()


@pytest.fixture(scope="module")
def rig():
    inst = sac.PathInstanceInputs(leaf_preimage=LEAF_PREIMAGE,
                                  path_bits=PATH_BITS, siblings=SIBLINGS)
    ir = sac.path_ir(GEO)
    W = sac.path_witness(ir, GEO, inst)
    return dict(inst=inst, ir=ir, W=W)


def test_witness_satisfies(rig):
    ir, W = rig["ir"], rig["W"]
    Wint = np.asarray(W.lo, dtype=object) + \
        (np.asarray(W.hi, dtype=object) << 32)
    pis = sac.expected_public_inputs(GEO, rig["inst"])
    violations = satisfy.check_satisfied(
        ir, Wint, sac._const_rows(GEO).T,
        pk.identity_permutation(ir.num_witness, GEO.n), pis)
    assert violations == [], violations[:8]


def test_root_matches_production_tree_rules(rig):
    pis = sac.expected_public_inputs(GEO, rig["inst"])
    assert sac.root_bytes(GEO, pis) == _expected_root()


def test_proves_and_verifies(rig):
    ir, W = rig["ir"], rig["W"]
    setup = sac.path_setup(ir, GEO, CFG)
    proof = pk.prove(ir, setup, W, CFG)
    expected = sac.expected_public_inputs(GEO, rig["inst"])
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected]
    assert pk.verify(ir, setup.vk(), proof, CFG)
    # a tampered root bit must be rejected
    pis = list(proof.public_inputs)
    pis[-1] = (int(pis[-1]) + 1) % pk.gl.P
    bad = dc.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(ir, setup.vk(), bad, CFG)


def test_forged_sibling_changes_root(rig):
    inst = rig["inst"]
    forged = dc.replace(inst, siblings=[SIBLINGS[0][:-1] + b"\x00"]
                        + SIBLINGS[1:])
    assert sac.expected_public_inputs(GEO, forged)[-256:] != \
        sac.expected_public_inputs(GEO, inst)[-256:]


def test_oracle_path_satisfies_at_depth_256():
    """End-to-end type-10 binding: a traced block's storage write becomes a
    depth-256 path instance whose circuit witness satisfies exactly and
    whose root PIs equal the oracle's tree roots."""
    from zkevm_harness_tpu import harness
    from zkevm_harness_tpu.vm import isa
    I = isa.imm
    res = harness.run_block(
        [isa.StorageWrite(I(5), I(777)), isa.Ret()], prove_mode="dry")
    art = res.artifacts.storage_application
    assert len(art.instances) == 1
    read_inst, write_inst = art.instances[0]
    geo = sac.PathGeometry(depth=256)
    ir = sac.path_ir(geo)
    W = sac.path_witness(ir, geo, write_inst)
    Wint = np.asarray(W.lo, dtype=object) + \
        (np.asarray(W.hi, dtype=object) << 32)
    pis = sac.expected_public_inputs(geo, write_inst)
    violations = satisfy.check_satisfied(
        ir, Wint, sac._const_rows(geo).T,
        pk.identity_permutation(ir.num_witness, geo.n), pis)
    assert violations == [], violations[:5]
    # the proven roots ARE the oracle's tree roots
    assert sac.root_bytes(geo, pis) == art.final_root
    read_pis = sac.expected_public_inputs(geo, read_inst)
    assert sac.root_bytes(geo, read_pis) == art.initial_root
