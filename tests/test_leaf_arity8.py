"""One leaf aggregating EIGHT real base proofs in-circuit (VERDICT r3 item
3a: push leaf arity toward the production RECURSION_ARITY=32;
recursion_layer/mod.rs:25). Runs through the DAG (run_block tower=True)."""

import pytest

from zkevm_harness_tpu import harness
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.vm import isa

P = gl.P
CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=2, final_fri_size=8)
I = isa.imm

# 32 memory queries = 8 RAM-permutation instances at testing geometry
BLOCK = ([isa.HeapWrite(I(k), I(1000 + k)) for k in range(16)]
         + [isa.HeapRead(I(k), 1 + (k % 3)) for k in range(16)]
         + [isa.Ret()])


@pytest.mark.timeout(3600)
def test_leaf_aggregates_eight_base_proofs():
    from zkevm_harness_tpu.prover import layers as ly
    with ly.engine_override(CFG):
        blk = harness.run_block(BLOCK, prove_mode="spot", spot_types=(8,),
                                tower=True, recursion_cfg=CFG, leaf_arity=8)
    # eight real base proofs...
    n_inst = blk.artifacts.per_circuit[8].num_instances
    assert n_inst == 8, n_inst
    # ...aggregated by ONE leaf (leaf records keyed by leaf_for(8) = 10)
    lrec = blk.source.get_leaf_layer_proof(10, 0)
    assert lrec and lrec.get("real") and lrec["arity"] == 8
    assert blk.source.get_leaf_layer_proof(10, 1) is None
    # the leaf's queue tail is the full recursion queue of the type
    rq = blk.artifacts.recursion_queues[8]
    assert [int(v) for v in lrec["proof"].public_inputs[-12:]] == \
        [int(v) % P for v in rq.tail]
    # size record for BASELINE: the arity-8 leaf circuit's shape
    ir = blk.recursion_rigs[("leaf_final", 8)][0]
    print(f"arity-8 leaf: outer 2^{ir.log_n} x {ir.num_witness}")
