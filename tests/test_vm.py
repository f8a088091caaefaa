"""VM interpreter + witness tracer tests (storage rollback, log queue
semantics mirroring the reference simple_tests style — log.rs, near_call.rs)."""

from zkevm_harness_tpu.circuits.types import testing_geometry
from zkevm_harness_tpu.vm import isa
from zkevm_harness_tpu.vm.environment import (DefaultPrecompilesProcessor,
                                              InMemoryEventSink,
                                              InMemoryStorage,
                                              SimpleDecommitter, SimpleMemory)
from zkevm_harness_tpu.vm.interpreter import run_vm
from zkevm_harness_tpu.vm.state import BlockProperties, ProvingToolset, create_vm
from zkevm_harness_tpu.witness.tracer import WitnessTracer

R = isa.reg
I = isa.imm


def make_vm(snapshot_every=5):
    tracer = WitnessTracer(snapshot_every)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    vm = create_vm(tools, BlockProperties(block_number=1), entry_address=0xAA,
                   code_page=0)
    return vm, tracer, tools


def test_arithmetic_and_heap():
    code = [
        isa.BinOp("add", I(20), I(22), 1),     # r1 = 42
        isa.BinOp("mul", R(1), I(2), 2),       # r2 = 84
        isa.HeapWrite(I(7), R(2)),
        isa.HeapRead(I(7), 3),
        isa.Ret(),
    ]
    vm, tracer, tools = make_vm()
    cycles = run_vm(vm, code, 100)
    assert vm.finished and cycles == 5
    assert vm.reg_read(3).value == 84
    mem_q = tracer.memory_queries
    assert len(mem_q) == 2
    assert mem_q[0][1].rw_flag and not mem_q[1][1].rw_flag
    assert mem_q[1][1].value == 84
    assert len(tracer.vm_snapshots) == 1  # cycle 0


def test_storage_write_read_and_log_queue():
    code = [
        isa.StorageWrite(I(5), I(123)),
        isa.StorageRead(I(5), 1),
        isa.Ret(),
    ]
    vm, tracer, tools = make_vm()
    run_vm(vm, code, 100)
    assert vm.reg_read(1).value == 123
    assert tools.storage.read(0, 0xAA, 5) == 123
    queue = tracer.final_log_queue()
    assert len(queue) == 2  # write + read (no panics -> no rollback entries)
    assert queue[0][1].rw_flag and not queue[1][1].rw_flag
    # the pending rollback for the un-reverted write stays unapplied
    assert len(tracer.callstack_with_aux_data.unapplied_rollbacks()) == 1


def test_near_call_panic_rolls_back():
    code = [
        isa.StorageWrite(I(1), I(111)),      # 0: outer write
        isa.NearCall(target=4, exception_handler=3),  # 1
        isa.Ret(),                           # 2: normal exit after call ok
        isa.Ret(),                           # 3: exception handler -> done
        isa.StorageWrite(I(1), I(222)),      # 4: inner write
        isa.Event(I(9), I(10)),              # 5: inner event
        isa.Ret(panic=True),                 # 6: panic!
    ]
    vm, tracer, tools = make_vm()
    run_vm(vm, code, 100)
    assert vm.finished
    # storage rolled back to the outer value
    assert tools.storage.read(0, 0xAA, 1) == 111
    # event cancelled
    events, msgs = tools.event_sink.events_and_l1_messages()
    assert events == [] and msgs == []
    # the forward log queue contains the inner write AND its rollback replay
    queue = [q for _, q in tracer.final_log_queue()]
    writes = [q for q in queue if q.rw_flag and q.key == 1]
    assert len(writes) == 3  # outer, inner, inner-rollback
    assert writes[2].rollback and writes[2].written_value == 222


def test_nested_success_donates_rollbacks():
    code = [
        isa.NearCall(target=2, exception_handler=1),  # 0
        isa.Ret(),                                    # 1 (also the handler)
        isa.StorageWrite(I(3), I(7)),                 # 2
        isa.Ret(),                                    # 3 inner success
    ]
    vm, tracer, tools = make_vm()
    run_vm(vm, code, 100)
    assert tools.storage.read(0, 0xAA, 3) == 7
    # rollback donated to root, never applied
    assert len(tracer.callstack_with_aux_data.unapplied_rollbacks()) == 1
    assert len(tracer.final_log_queue()) == 1


def test_precompile_keccak():
    from zkevm_harness_tpu.utils.keccak import keccak256
    code = [
        isa.Precompile(DefaultPrecompilesProcessor.KECCAK_ADDRESS, I(1), 1),
        isa.Ret(),
    ]
    vm, tracer, tools = make_vm()
    run_vm(vm, code, 100)
    want = int.from_bytes(keccak256((1).to_bytes(32, "big")), "big")
    assert vm.reg_read(1).value == want
    assert len(tracer.precompile_calls) == 1


def test_far_call_decommits_and_returns():
    from zkevm_harness_tpu.vm.interpreter import deploy_contract
    callee_code = [
        isa.StorageWrite(I(7), I(777)),
        isa.Ret(),
    ]
    code = [
        isa.FarCall(I(0xBB), exception_handler=2),
        isa.Ret(),
        isa.Ret(),  # handler
    ]
    vm, tracer, tools = make_vm()
    deploy_contract(tools, 0xBB, callee_code)
    from zkevm_harness_tpu.vm.interpreter import run_vm
    run_vm(vm, code, 100)
    assert vm.finished
    # callee wrote under ITS address, not the caller's
    assert tools.storage.read(0, 0xBB, 7) == 777
    assert tools.storage.read(0, 0xAA, 7) == 0
    # decommit query recorded, fresh
    assert len(tracer.decommittment_queries) == 1
    assert tracer.decommittment_queries[0][1].is_fresh
    # second far call to the same contract: decommit is NOT fresh
    vm2, tracer2, tools2 = make_vm()
    deploy_contract(tools2, 0xBB, callee_code)
    code2 = [isa.FarCall(I(0xBB), 3), isa.FarCall(I(0xBB), 3), isa.Ret(),
             isa.Ret()]
    run_vm(vm2, code2, 100)
    assert [q.is_fresh for _, q in tracer2.decommittment_queries] == [True, False]


def test_far_call_to_undeployed_fails():
    import pytest
    from zkevm_harness_tpu.vm.interpreter import VmPanic, run_vm
    # a root-frame far call to an undeployed address panics the VM
    code = [isa.FarCall(I(0xCC), 1), isa.Ret()]
    vm, tracer, tools = make_vm()
    with pytest.raises(VmPanic):
        run_vm(vm, code, 100)


def test_limited_ergs_near_call_panics_and_rolls_back():
    code = [
        isa.StorageWrite(I(1), I(5)),                       # 0
        isa.NearCall(target=4, exception_handler=3, ergs=3),  # 1: tiny budget
        isa.Ret(),                                          # 2
        isa.Ret(),                                          # 3: handler
        isa.StorageWrite(I(1), I(99)),                      # 4 (costs ergs)
        isa.Jump(4),                                        # 5: burn forever
    ]
    vm, tracer, tools = make_vm()
    run_vm(vm, code, 200)
    assert vm.finished
    # the ergs-limited frame panicked: its write rolled back
    assert tools.storage.read(0, 0xAA, 1) == 5


def test_fat_pointer_calldata_and_returndata():
    from zkevm_harness_tpu.vm.interpreter import deploy_contract, run_vm
    # callee: read calldata word 0 via the r1 fat pointer, add 1, store the
    # result in its heap, return a returndata pointer to it
    callee = [
        isa.PtrRead(ptr=1, offset=I(0), dst=2),
        isa.BinOp("add", R(2), I(1), 3),
        isa.HeapWrite(I(0), R(3)),
        isa.RetData(data_start=I(0), data_len=I(1)),
    ]
    # caller: put 41 in heap[5], far-call with calldata ptr to it, then read
    # the returndata through the returned fat pointer
    code = [
        isa.HeapWrite(I(5), I(41)),
        isa.FarCallData(I(0xBB), exception_handler=4,
                        calldata_start=I(5), calldata_len=I(1)),
        isa.PtrRead(ptr=1, offset=I(0), dst=4),
        isa.Ret(),
        isa.Ret(),  # handler
    ]
    vm, tracer, tools = make_vm()
    deploy_contract(tools, 0xBB, callee)
    run_vm(vm, code, 100)
    assert vm.finished
    assert vm.reg_read(4).value == 42  # 41 + 1 round-tripped through pointers
    # out-of-bounds fat-pointer read yields zero
    vm2, _, tools2 = make_vm()
    deploy_contract(tools2, 0xBB, callee)
    code2 = [
        isa.HeapWrite(I(5), I(41)),
        isa.FarCallData(I(0xBB), 4, calldata_start=I(5), calldata_len=I(1)),
        isa.PtrRead(ptr=1, offset=I(9), dst=4),  # beyond returndata length
        isa.Ret(), isa.Ret(),
    ]
    run_vm(vm2, code2, 100)
    assert vm2.reg_read(4).value == 0
