"""Ragged leaf chunks through the full chain (VERDICT r4 missing item 5):
a type whose instance count does NOT divide the leaf arity proves through
padded fixed-arity leaves sharing ONE VK, with the instance-0 padding proof
recorded in the data source (the reference's padding-proof protocol:
src/witness/recursive_aggregation.rs:385-389, data-source slots
src/data_source/mod.rs:22,64, producer complex_tests/mod.rs:326,395).

Also covers type 10 STRUCTURALLY (flattened path instances through the DAG
and recursion queues — proving its 2609-column circuit is slow-tier/TPU
work, see test_type10_tower.py).
"""

import os

import numpy as np
import pytest

from zkevm_harness_tpu import full_chain as fc
from zkevm_harness_tpu import harness
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.vm import isa

P = gl.P
CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=2, final_fri_size=8)
I = isa.imm

# 10 memory queries -> 3 RAM-permutation instances at testing geometry
# (cycles_per_ram_permutation=4): chunks [2, 1] at leaf_arity=2 — RAGGED.
BLOCK = (
    [isa.HeapWrite(I(k), I(100 + k)) for k in range(6)]
    + [isa.HeapRead(I(k), 1 + (k % 3)) for k in range(4)]
    + [
        isa.Event(I(2), I(3)),
        isa.Event(I(4), I(5)),
        isa.Ret(),
    ]
)


@pytest.fixture(scope="module")
def chain():
    return fc.prove_block_full_chain(
        BLOCK, chain_types=(8, 11), base_cfg=CFG, recursion_cfg=CFG,
        compression_cfg=CFG, wrap=False, leaf_arity=2, progress=print)


def test_chunks_are_ragged(chain):
    assert len(chain.base_proofs[8]) == 3, \
        "the block must produce an ODD instance count for the ragged case"
    assert len(chain.leaf_chunks[8]) == 2


def test_ragged_leaves_share_one_vk(chain):
    src = chain.block.source
    l0 = src.get_leaf_layer_proof(10, 0)  # leaf type for base 8
    l1 = src.get_leaf_layer_proof(10, 1)
    assert l0["vk"] == l1["vk"], "padded leaves must share one circuit/VK"
    assert l0["arity"] == l1["arity"] == 2
    assert (l0["num_real"], l1["num_real"]) == (2, 1)


def test_padding_proof_recorded(chain):
    """Instance 0's proof is the type's padding proof (reference
    protocol)."""
    src = chain.block.source
    rec = src.get_base_layer_padding_proof(8)
    assert rec is not None and rec["real"]
    inst0 = src.get_base_layer_proof(8, 0)
    assert [int(v) for v in rec["proof"].public_inputs] == \
        [int(v) for v in inst0["proof"].public_inputs]


def test_ragged_tail_matches_recursion_queue(chain):
    """The padded last leaf absorbs ONLY its real chunk: the final tail
    still equals the host recursion queue's tail."""
    rq = chain.block.artifacts.recursion_queues[8]
    last = chain.leaf_chunks[8][-1]
    assert [int(v) % P for v in last.public_inputs[-12:]] == \
        [int(v) % P for v in rq.tail]
    # and the node consumed both chunks (head of chunk0, tail of chunk1)
    node_pis = [int(v) for v in chain.nodes[8].proof.public_inputs]
    first = [int(v) % P for v in chain.leaf_chunks[8][0].public_inputs]
    pl = len(first) - 16
    assert node_pis[-16:-12] == first[pl:pl + 4]
    assert node_pis[-12:] == [int(v) % P for v in last.public_inputs[-12:]]


def test_padding_flags_are_sound(chain):
    """Marking a REAL slot as padding (or a padding slot as real) breaks
    satisfiability or diverges the tail: flags cannot silently drop a real
    digest."""
    from zkevm_harness_tpu.circuits import leaf_circuit as lc
    from zkevm_harness_tpu.prover import layers as ly
    from zkevm_harness_tpu.prover import satisfy

    from zkevm_harness_tpu.circuits.types import testing_geometry
    with ly.engine_override(CFG):
        sd = ly.base_setup_for_type(8, testing_geometry())
    b, lay = lc.synthesize_leaf(sd.ir, sd.config, arity=2,
                                base_circuit_type=8, padded=True)
    built = b.finalize()
    chunk = chain.base_proofs[8][2:3]  # the ragged single-proof chunk
    head = [0] * 8 + [int(v) % P for v in
                      chain.leaf_chunks[8][0].public_inputs[-12:]][8:]
    # honest: flags [1, 0]
    asg = lc.leaf_assignments(lay, sd.vk, chunk, queue_head=head)
    pis = lc.leaf_public_inputs(lay, sd.vk, chunk, queue_head=head)
    W = b.fill_witness(asg)
    assert not satisfy.check_satisfied(
        built.ir, gl.to_ints(W), np.asarray(built.const_cols, dtype=object),
        built.permutation, pis)
    # dishonest: claim BOTH slots real (absorbing the padding digest) but
    # expose the honest tail -> unsatisfiable
    bad = dict(asg)
    bad[lay.flag_vars[1]] = 1
    Wb = b.fill_witness(bad)
    assert satisfy.check_satisfied(
        built.ir, gl.to_ints(Wb), np.asarray(built.const_cols, dtype=object),
        built.permutation, pis), \
        "flag flip must break the exposed tail"
    # dishonest: claim the REAL slot is padding -> first-slot flag pinned 1
    bad2 = dict(asg)
    bad2[lay.flag_vars[0]] = 0
    Wb2 = b.fill_witness(bad2)
    assert satisfy.check_satisfied(
        built.ir, gl.to_ints(Wb2),
        np.asarray(built.const_cols, dtype=object),
        built.permutation, pis), \
        "dropping the real digest must be unsatisfiable"


def test_type10_structural_through_dag():
    """Type 10 rides the DAG with FLATTENED per-path instances: read/write
    paths become individual queue entries whose digests bind the full PI
    vector (leaf/path/root bits). Dry mode — the 2609-column path circuit
    proves in the slow tier / on TPU."""
    import dataclasses as dc

    from zkevm_harness_tpu.circuits.types import testing_geometry
    geo = dc.replace(testing_geometry(), storage_tree_depth=8)
    block = [isa.StorageWrite(I(1), I(7)), isa.StorageWrite(I(2), I(9)),
             isa.Ret()]
    blk = harness.run_block(block, geometry=geo, prove_mode="dry")
    # 2 dedup writes -> 2 (read, write) pairs -> 4 path instances
    assert blk.artifacts.per_circuit[10].num_instances == 4
    assert len(blk.artifacts.recursion_queues[10]) == 4
    # DAG contains type-10 leaf and node tasks
    keys = set(blk.dag_results)
    assert any(k[0] == "leaf" and k[1] == 12 for k in keys)  # leaf_for(10)
    # paths carry the reduced tree depth
    inst = blk.artifacts.storage_application.instances[0][0]
    assert len(inst.path_bits) == 8 and len(inst.siblings) == 8
