"""run_block(tower=True) orchestrates the WHOLE tower through the DAG:
real leaf/node/scheduler tasks with store-guarded skip-if-present resume
(VERDICT r3 item 7 — the pod-level scheduler; reference resume protocol
complex_tests/mod.rs:323-331,588-592)."""

import pytest

from zkevm_harness_tpu import harness
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.utils.data_source import InMemoryDataSource
from zkevm_harness_tpu.vm import isa

P = gl.P
CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=2, final_fri_size=8)

I = isa.imm

BLOCK = [
    isa.HeapWrite(I(0), I(55)),
    isa.HeapRead(I(0), 2),
    isa.HeapWrite(I(1), I(66)),
    isa.HeapRead(I(1), 3),
    isa.HeapWrite(I(2), I(77)),
    isa.HeapRead(I(2), 4),
    isa.Ret(),
]


class CountingSource(InMemoryDataSource):
    def __init__(self):
        super().__init__()
        self.writes = 0

    def set(self, value, *key):
        self.writes += 1
        super().set(value, *key)


@pytest.fixture(scope="module")
def towered():
    from zkevm_harness_tpu.prover import layers as ly
    src = CountingSource()
    with ly.engine_override(CFG):
        blk = harness.run_block(BLOCK, prove_mode="spot", spot_types=(8,),
                                tower=True, recursion_cfg=CFG, source=src)
    return blk, src


def test_dag_produced_real_tower(towered):
    blk, src = towered
    # base proofs real
    rec = src.get_base_layer_proof(8, 0)
    assert rec and rec.get("real")
    # leaf real, tail == the type's recursion queue tail
    lrec = src.get_leaf_layer_proof(10, 0)  # leaf_for(8)
    assert lrec and lrec.get("real")
    rq = blk.artifacts.recursion_queues[8]
    assert [int(v) for v in lrec["proof"].public_inputs[-12:]] == \
        [int(v) % P for v in rq.tail]
    # node real
    nrec = src.get_node_layer_proof(8, 0, 0)
    assert nrec and nrec.get("real")
    # scheduler real over exactly the real types
    srec = src.get_scheduler_proof()
    assert srec and srec.get("real") and srec["types"] == [8]
    assert len(srec["scheduler_pi"]) == 4


def test_resume_skips_every_stored_stage(towered):
    blk, src = towered
    from zkevm_harness_tpu.prover import layers as ly
    before = src.writes
    with ly.engine_override(CFG):
        blk2 = harness.run_block(BLOCK, prove_mode="spot", spot_types=(8,),
                                 tower=True, recursion_cfg=CFG, source=src)
    # every task (base, leaf, node, scheduler, and the metadata ones) was
    # resumed from the store: ZERO new writes
    assert src.writes == before
    # and the resumed records are the same real tower
    assert blk2.source.get_scheduler_proof().get("real")
