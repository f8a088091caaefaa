"""The basic_test analogue: one block proven through EVERY layer — base ->
leaf -> node -> scheduler -> compression -> SNARK wrapper — with every link
a real proof of the previous link and verify-after-prove throughout
(reference: src/tests/complex_tests/mod.rs:268-1142).

Scale: chain over the RAM-permutation type (the narrowest base gate set) at
reduced FRI parameters (num_queries=2) — the reduced-geometry concession;
wide types (keccak, storage application) verify in-circuit only at TPU
scale. Every structural statement is the production one.
"""

import dataclasses as dc

import numpy as np
import pytest

from zkevm_harness_tpu import full_chain as fc
from zkevm_harness_tpu.circuits import leaf_circuit as lc
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover import satisfy
from zkevm_harness_tpu.vm import isa

P = gl.P
CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=2, final_fri_size=8)

I = isa.imm

# enough heap traffic for >= 2 RAM-permutation instances at testing
# geometry (cycles_per_ram_permutation = 4)
BLOCK = [
    isa.StorageWrite(I(1), I(100)),
    isa.Event(I(2), I(3)),
    isa.HeapWrite(I(0), I(55)),
    isa.HeapRead(I(0), 2),
    isa.HeapWrite(I(1), I(66)),
    isa.HeapRead(I(1), 3),
    isa.HeapWrite(I(2), I(77)),
    isa.HeapRead(I(2), 4),
    isa.NearCall(target=10, exception_handler=9),
    isa.Ret(),
    isa.StorageWrite(I(9), I(200)),
    isa.Ret(),
]


@pytest.fixture(scope="module")
def chain():
    return fc.prove_block_full_chain(
        BLOCK, chain_types=(8,), base_cfg=CFG, recursion_cfg=CFG,
        compression_cfg=CFG, wrap=True, progress=print)


def test_every_link_is_a_real_proof(chain):
    # >= 2 real base proofs aggregated by one leaf (VERDICT item 2 bar)
    assert len(chain.base_proofs[8]) >= 2
    for pr in chain.base_proofs[8]:
        assert isinstance(pr, pk.PlonkishProof)
    assert isinstance(chain.leaves[8].proof, pk.PlonkishProof)
    assert isinstance(chain.nodes[8].proof, pk.PlonkishProof)
    assert isinstance(chain.scheduler.proof, pk.PlonkishProof)
    # compression mode 1 really consumed the scheduler proof: its PIs are
    # [scheduler vk || scheduler PIs]
    final = chain.final["final_proof"]
    svk = [int(v) % P for v in chain.scheduler.vk]
    assert [int(v) for v in final.public_inputs[:len(svk)]] == svk
    assert [int(v) for v in final.public_inputs[len(svk):]] == \
        [int(v) % P for v in chain.scheduler_pi]
    # the SNARK wrapper packed the block commitment
    assert chain.snark is not None
    assert int(chain.snark["proof"].public_inputs[-1]) == \
        int(chain.final["snark_public_input"])


def test_leaf_tail_equals_dag_recursion_queue(chain):
    rq = chain.block.artifacts.recursion_queues[8]
    tail = [int(v) % P for v in rq.tail]
    assert [int(v) for v in chain.leaves[8].proof.public_inputs[-12:]] == tail


def test_data_source_holds_real_tower(chain):
    """The DAG stores full task RECORDS (kind/real/vk/proof) under the
    reference's keying: leaves by their recursion-layer type
    (leaf_for(8) = 10), nodes/scheduler by (type, depth, index)."""
    src = chain.block.source
    lrec = src.get_leaf_layer_proof(10, 0)
    assert lrec["real"] and isinstance(lrec["proof"], pk.PlonkishProof)
    nrec = src.get_node_layer_proof(8, 0, 0)
    assert nrec["real"] and isinstance(nrec["proof"], pk.PlonkishProof)
    srec = src.get_scheduler_proof()
    assert srec["real"] and isinstance(srec["proof"], pk.PlonkishProof)
    assert src.get_compression_proof(1) is not None


def test_tampered_base_proof_breaks_the_leaf(chain):
    sd = chain.base_setups[8]
    proofs = list(chain.base_proofs[8])
    p0 = proofs[0]
    proofs[0] = dc.replace(p0, public_inputs=[
        (int(p0.public_inputs[0]) + 1) % P] + list(p0.public_inputs[1:]))
    b, lay = lc.synthesize_leaf(sd.ir, sd.config, arity=len(proofs),
                                base_circuit_type=8)
    built = b.finalize()
    W = b.fill_witness(lc.leaf_assignments(lay, sd.vk, proofs))
    pis = lc.leaf_public_inputs(lay, sd.vk, proofs)
    viol = satisfy.check_satisfied(
        built.ir, gl.to_ints(W), np.asarray(built.const_cols, dtype=object),
        built.permutation, pis)
    assert viol, "a tampered base proof must make the leaf unsatisfiable"


def test_scheduler_commitment_binds_node_tails(chain):
    from zkevm_harness_tpu.circuits import scheduler_circuit as sc
    # recompute the block commitment with a corrupted node tail lane: the
    # digest must change (so the exposed PI pins every queue tail)
    node = chain.nodes[8]
    bad_pis = list(node.proof.public_inputs)
    bad_pis[-1] = (int(bad_pis[-1]) + 1) % P
    bad = dc.replace(node.proof, public_inputs=bad_pis)
    aux = sc.scheduler_aux_values(chain.block.scheduler_witness)
    # host-side recompute through a layout stub carrying the prefix split
    lay = dc.replace  # noqa: F841  (documented: recompute uses the module fn)
    good = chain.scheduler_pi
    from zkevm_harness_tpu.circuits.scheduler_circuit import (
        SchedulerMultiLayout)
    stub = SchedulerMultiLayout(
        builder=None, type_ids=[8], child_layouts=[None],
        node_vk_vars=[None], block_number_var=-1, aux_vars=[None] * len(aux),
        prefix_lens=[len(node.proof.public_inputs) - 16])
    changed = sc.scheduler_multi_public_inputs(stub, [node.vk], [bad], 1, aux)
    assert changed != good
