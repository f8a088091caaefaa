"""End-to-end witness pipeline: VM program -> tracer -> block artifacts -> DAG."""

import pytest

from zkevm_harness_tpu.circuits.types import BaseLayerCircuitType, testing_geometry
from zkevm_harness_tpu.prover import scheduler as sch
from zkevm_harness_tpu.vm import isa
from zkevm_harness_tpu.vm.environment import LogQuery
from zkevm_harness_tpu.witness import oracle as orc
from zkevm_harness_tpu.witness.storage_sort import sort_storage_access_queries
from tests.test_vm import make_vm

R = isa.reg
I = isa.imm


def run_program(code, snapshot_every=5):
    from zkevm_harness_tpu.vm.interpreter import run_vm
    vm, tracer, tools = make_vm(snapshot_every)
    run_vm(vm, code, 1000)
    assert vm.finished
    return vm, tracer, tools


def test_storage_sort_dedup_semantics():
    def sq(ts, key, rv, wv, rw, rollback=False):
        return LogQuery(ts, 0, 0, 0, 0xAA, key, rv, wv, rw, rollback)

    queries = [
        sq(1, 5, 0, 10, True),           # write 0 -> 10
        sq(2, 5, 10, 20, True),          # write 10 -> 20
        sq(3, 5, 10, 20, True, True),    # rollback of the second write
        sq(4, 7, 42, 42, False),         # pure read of another slot
        sq(5, 9, 0, 1, True),            # write
        sq(6, 9, 0, 1, True, True),      # rolled back entirely, never read
    ]
    _, dedup = sort_storage_access_queries(queries)
    by_key = {q.key: q for q in dedup}
    assert set(by_key) == {5, 7}  # slot 9 dropped (no net change, no read)
    assert by_key[5].rw_flag and by_key[5].read_value == 0 \
        and by_key[5].written_value == 10
    assert not by_key[7].rw_flag and by_key[7].read_value == 42  # protective


def test_artifacts_from_program():
    code = [
        isa.StorageWrite(I(1), I(100)),        # 0
        isa.StorageRead(I(1), 1),              # 1
        isa.Event(I(2), I(3)),                 # 2
        isa.Event(I(4), I(5), to_l1=True),     # 3
        isa.HeapWrite(I(0), I(55)),            # 4
        isa.HeapRead(I(0), 2),                 # 5
        isa.NearCall(target=8, exception_handler=7),  # 6
        isa.Ret(),                             # 7 (handler and return point)
        isa.StorageWrite(I(1), I(200)),        # 8
        isa.Ret(panic=True),                   # 9
    ]
    vm, tracer, tools = run_program(code)
    art = orc.create_artifacts_from_tracer(tracer, testing_geometry())

    # demux shapes
    assert len(art.demuxed["events"]) == 1
    assert len(art.demuxed["l1"]) == 1
    # storage: outer write + read + inner write + its rollback replay
    assert len(art.demuxed["storage"]) == 4
    # memory queue: one write + one read, sorted queue same length
    assert len(art.memory_queue) == 2
    assert len(art.sorted_memory_queue) == 2
    assert art.memory_queue.tail != (0,) * 12
    # net storage: slot 1 ends at 100 (write from 0), single write dedup
    assert len(art.deduplicated_storage) == 1
    d = art.deduplicated_storage[0]
    assert d.rw_flag and d.written_value == 100
    # events survive (not rolled back)
    assert len(art.deduplicated_events) == 1
    assert len(art.deduplicated_l1_messages) == 1
    # instance counts exist for all 13 circuit types
    assert set(art.per_circuit.keys()) == set(range(1, 14))
    assert art.per_circuit[int(BaseLayerCircuitType.MAIN_VM)].num_instances >= 2
    # recursion queues feed the DAG builder
    dag = sch.build_block_dag(
        art.recursion_queues,
        {t: a.num_instances for t, a in art.per_circuit.items()})
    kinds = [t.kind for t in dag]
    assert kinds[-1] == "scheduler"
    assert kinds.count("leaf") >= 13


def test_scheduler_witness_assembly():
    from zkevm_harness_tpu.witness import scheduler_witness as sw
    from zkevm_harness_tpu.witness import recursion as rec
    code = [
        isa.StorageWrite(I(1), I(100)),
        isa.Event(I(4), I(5), to_l1=True),
        isa.Ret(),
    ]
    vm, tracer, tools = run_program(code)
    art = orc.create_artifacts_from_tracer(tracer, testing_geometry())
    wit = sw.assemble_scheduler_witness(7, art, first_last={})
    assert wit.block_number == 7
    assert wit.events_queue_state.length == len(art.log_queue)
    assert len(wit.aux_output.l1_messages_linear_hash) == 32
    assert not wit.is_complete()
    wit.patch_recursion((1, 2, 3, 4),
                        rec.compute_leaf_params({1: [1, 2]}), ["proof"])
    assert wit.is_complete()


def test_vm_instance_splitting():
    from zkevm_harness_tpu.witness.vm_instance import split_into_vm_instances
    code = [isa.HeapWrite(I(i), I(i * 7)) for i in range(12)] + [isa.Ret()]
    vm, tracer, tools = run_program(code, snapshot_every=5)
    insts = split_into_vm_instances(tracer)
    assert len(insts) == 3  # 13 cycles, snapshots at 0,5,10
    assert insts[0].start_flag and insts[-1].completion_flag
    assert insts[0].cycle_range == (0, 5)
    assert insts[-1].cycle_range == (10, 13)
    # FSM continuity: final state of k == initial state of k+1
    for a, b in zip(insts, insts[1:]):
        assert a.final_state == b.initial_state
    # memory query slices partition the 12 writes
    spans = [i.queue_slices.memory for i in insts]
    assert spans[0][0] == 0 and spans[-1][1] == len(tracer.memory_queries)
    for a, b in zip(spans, spans[1:]):
        assert a[1] == b[0]
