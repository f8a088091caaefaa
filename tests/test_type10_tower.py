"""Type 10 (storage application) through the recursion tower — the
full-prove tier (VERDICT r4 missing item 4b: lift the chain exclusion).

The 2609-column Blake2s path circuit costs ~10-15 min per CPU prove (5905
eagerly-dispatched constraint expressions; CLAUDE.md: types 7/10 prove at
TPU scale), so the proving tier runs under ZKTPU_SLOW=1 (or on the TPU
session — results recorded in BASELINE.md). The DEFAULT tier covers the
structural path in tests/test_ragged_chain.py::test_type10_structural_through_dag.
"""

import dataclasses as dc
import os

import pytest

from zkevm_harness_tpu import full_chain as fc
from zkevm_harness_tpu.circuits.types import testing_geometry
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.vm import isa

P = gl.P
CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=2, final_fri_size=8)
I = isa.imm

pytestmark = pytest.mark.skipif(
    os.environ.get("ZKTPU_SLOW") != "1",
    reason="type-10 path proofs are slow-tier on CPU (ZKTPU_SLOW=1); "
           "structural coverage lives in test_ragged_chain.py")


def test_full_chain_with_type10():
    """One storage write -> (read, write) path instances -> REAL path
    proofs -> a padded/exact leaf -> node -> scheduler, chained with a
    narrow type. Done criterion of VERDICT r4 item 4: a full-chain test
    with type 10 in chain_types."""
    geo = dc.replace(testing_geometry(), storage_tree_depth=8)
    block = [
        isa.HeapWrite(I(0), I(5)),
        isa.HeapRead(I(0), 1),
        isa.StorageWrite(I(1), I(7)),
        isa.Ret(),
    ]
    chain = fc.prove_block_full_chain(
        block, chain_types=(8, 10), geometry=geo, base_cfg=CFG,
        recursion_cfg=CFG, wrap=False, leaf_arity=2, progress=print)
    assert len(chain.base_proofs[10]) == 2  # read + write paths
    assert chain.nodes[10].proof is not None
    # the scheduler consumed the type-10 node: its tail is in the block
    # commitment's absorb (scheduler PI recompute covers it)
    srec = chain.block.source.get_scheduler_proof()
    assert 10 in srec["types"]
    # root chaining: the read path's root == pre-state root, the write
    # path's root == post-state root, both pinned by the proofs' PI bits
    from zkevm_harness_tpu.circuits import storage_application_circuit as sap
    pgeo = sap.PathGeometry(depth=8)
    read_pis = chain.base_proofs[10][0].public_inputs
    write_pis = chain.base_proofs[10][1].public_inputs
    art = chain.block.artifacts.storage_application
    assert sap.root_bytes(pgeo, [int(v) for v in read_pis]) == \
        art.initial_root
    assert sap.root_bytes(pgeo, [int(v) for v in write_pis]) == \
        art.final_root
