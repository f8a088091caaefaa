"""Cross-circuit binding: the MainVM accumulator PIs must re-derive from
the SAME traced query objects the RAM-permutation and log-demux circuits
consume (witness/main_vm.crosscheck_query_binding; reference analogue:
closed-form-input observable queue states checked by the scheduler,
src/witness/oracle.rs:185-206)."""

import dataclasses

import pytest

from zkevm_harness_tpu import harness
from zkevm_harness_tpu.circuits.types import testing_geometry
from zkevm_harness_tpu.prover.layers import main_vm_geometry_for_capacity
from zkevm_harness_tpu.vm import isa
from zkevm_harness_tpu.vm.environment import (DefaultPrecompilesProcessor,
                                              InMemoryEventSink,
                                              InMemoryStorage,
                                              SimpleDecommitter, SimpleMemory)
from zkevm_harness_tpu.vm.interpreter import run_vm
from zkevm_harness_tpu.vm.state import (BlockProperties, ProvingToolset,
                                        create_vm)
from zkevm_harness_tpu.witness.main_vm import (compute_main_vm_artifacts,
                                               crosscheck_query_binding)
from zkevm_harness_tpu.witness.tracer import WitnessTracer

I = isa.imm

BLOCK = [
    isa.HeapWrite(I(4), I(77)),
    isa.HeapRead(I(4), 2),
    isa.StorageWrite(I(1), I(100)),
    isa.StorageRead(I(1), 1),
    isa.Event(I(2), I(3)),
    isa.Event(I(4), I(5), to_l1=True),
    isa.HeapWrite(I(5), I(88)),
    isa.Ret(),
]


def _trace(block):
    geometry = testing_geometry()
    tracer = WitnessTracer(geometry.cycles_per_vm_snapshot)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=geometry)
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    run_vm(vm, list(block), 10_000)
    assert vm.finished
    geo = main_vm_geometry_for_capacity(geometry.cycles_per_vm_snapshot)
    return tracer, geo, geometry


def test_binding_enforced_in_block_flow():
    # run_block routes through oracle.create_artifacts_from_tracer, which
    # now enforces the cross-binding on every block
    res = harness.run_block(BLOCK, prove_mode="dry")
    assert res.artifacts.main_vm.final_accs[1] != 1  # log ops folded
    assert res.artifacts.main_vm.final_accs[2] != 1  # mem ops folded


def test_crosscheck_passes_on_honest_trace():
    tracer, geo, geometry = _trace(BLOCK)
    art = compute_main_vm_artifacts(tracer, geo,
                                    geometry.cycles_per_vm_snapshot)
    crosscheck_query_binding(tracer, geo, art)


def test_tampered_memory_write_rejected():
    # mutate a traced WRITE query's value AFTER artifact computation: the
    # VmRow folds the operand value, the queue circuits would consume the
    # mutated query -> the two derivations must diverge
    tracer, geo, geometry = _trace(BLOCK)
    art = compute_main_vm_artifacts(tracer, geo,
                                    geometry.cycles_per_vm_snapshot)
    idx = next(i for i, (_, q) in enumerate(tracer.memory_queries)
               if q.rw_flag)
    c, q = tracer.memory_queries[idx]
    tracer.memory_queries[idx] = (c, dataclasses.replace(q,
                                                         value=q.value + 1))
    with pytest.raises((AssertionError, ValueError)):
        crosscheck_query_binding(tracer, geo, art)


def test_tampered_memory_timestamp_rejected():
    tracer, geo, geometry = _trace(BLOCK)
    art = compute_main_vm_artifacts(tracer, geo,
                                    geometry.cycles_per_vm_snapshot)
    c, q = tracer.memory_queries[0]
    tracer.memory_queries[0] = (c, dataclasses.replace(
        q, timestamp=q.timestamp + 2))
    with pytest.raises((AssertionError, ValueError)):
        crosscheck_query_binding(tracer, geo, art)


def test_tampered_log_written_value_rejected():
    tracer, geo, geometry = _trace(BLOCK)
    art = compute_main_vm_artifacts(tracer, geo,
                                    geometry.cycles_per_vm_snapshot)
    fwd = tracer.callstack_with_aux_data.forward
    idx = next(i for i, (_, q) in enumerate(fwd) if q.rw_flag)
    c, q = fwd[idx]
    fwd[idx] = (c, dataclasses.replace(q, written_value=q.written_value + 1))
    with pytest.raises((AssertionError, ValueError)):
        crosscheck_query_binding(tracer, geo, art)


def test_tampered_log_key_rejected():
    tracer, geo, geometry = _trace(BLOCK)
    art = compute_main_vm_artifacts(tracer, geo,
                                    geometry.cycles_per_vm_snapshot)
    fwd = tracer.callstack_with_aux_data.forward
    c, q = fwd[0]
    fwd[0] = (c, dataclasses.replace(q, key=q.key + 1))
    with pytest.raises((AssertionError, ValueError)):
        crosscheck_query_binding(tracer, geo, art)
