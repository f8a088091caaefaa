"""Callstack sponge simulation + per-frame storage-log detailed state
(oracle.rs:560-790 + circuit_encodings FullWidthStackSimulator roles)."""

import pytest

from zkevm_harness_tpu.circuits.types import testing_geometry
from zkevm_harness_tpu.vm import isa
from zkevm_harness_tpu.vm.environment import (DefaultPrecompilesProcessor,
                                              InMemoryEventSink,
                                              InMemoryStorage,
                                              SimpleDecommitter, SimpleMemory)
from zkevm_harness_tpu.vm.interpreter import run_vm
from zkevm_harness_tpu.vm.state import (BlockProperties, ProvingToolset,
                                        create_vm)
from zkevm_harness_tpu.witness import callstack_sim as cs
from zkevm_harness_tpu.witness.tracer import WitnessTracer

I = isa.imm

# nested near calls: the inner frame WRITES then panics (its rollback is
# replayed into the forward queue, merge-on-pop panic path); the outer
# frame succeeds (its rollbacks are donated to the parent)
BLOCK = [
    isa.StorageWrite(I(1), I(10)),            # 0: root write (rollbackable)
    isa.NearCall(target=3, exception_handler=2),
    isa.Jump(target=8),                       # 2: root resume
    isa.StorageWrite(I(2), I(20)),            # 3: frame-1 write
    isa.NearCall(target=6, exception_handler=5),
    isa.Jump(target=8),                       # 5: frame-1 handler
    isa.StorageWrite(I(3), I(30)),            # 6: inner frame write
    isa.Ret(panic=True),                      # 7: inner frame panics
    isa.StorageWrite(I(4), I(40)),            # 8
    isa.Ret(),                                # 9: pops a frame
    isa.Ret(),                                # 10: root ret
]


def _trace(block):
    tracer = WitnessTracer(100)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    run_vm(vm, block, 100)
    assert vm.finished
    return tracer


def test_sponge_balances_and_restores_states():
    tracer = _trace(BLOCK)
    res = cs.simulate_callstack(tracer)
    # two pushes, two pops; sponge back to its seed
    pushes = [o for o in res.ops if o.is_push]
    pops = [o for o in res.ops if not o.is_push]
    assert len(pushes) == 2 and len(pops) == 2
    assert res.final_state == (0,) * 12
    assert res.max_depth == 2
    # LIFO: each pop restores the matching push's pre-state and encoding
    assert pops[0].state_after == pushes[1].state_before
    assert pops[0].encoding == pushes[1].encoding
    assert pops[1].state_after == pushes[0].state_before
    assert pops[1].encoding == pushes[0].encoding
    # push/pop sponge relation is re-checkable: absorb(prev, enc) == before
    for o in pops:
        assert tuple(cs._absorb_full_width(o.state_after, o.encoding)) == \
            o.state_before


def test_log_boundaries_track_forward_and_rollback():
    tracer = _trace(BLOCK)
    res = cs.simulate_callstack(tracer)
    b = res.log_boundaries
    assert len(b) == 4
    # first push: root write already in the forward queue + pending rollback
    assert b[0].is_push and b[0].state.forward_length == 1
    assert b[0].state.rollback_length == 1
    # inner panic pop: the inner frame's rollback REPLAYED into the
    # forward queue (writes at 0/3/6 + the replay = 4 entries)
    panic_pop = b[2]
    assert not panic_pop.is_push
    assert panic_pop.state.forward_length == 4
    # final pop: all pending rollbacks donated to root scope
    assert not b[3].is_push and b[3].depth == 0
    # the forward tail at the last boundary matches the final queue chain
    import numpy as np
    from zkevm_harness_tpu.witness import encodings as enc
    from zkevm_harness_tpu.witness.queues import QueueSimulator
    q = QueueSimulator(width=20)
    upto = b[3].state.forward_length
    for c, lq in tracer.callstack_with_aux_data.forward[:upto]:
        q.push(enc.encode_log_query(lq))
    assert tuple(int(v) for v in q.tail[:4]) == tuple(b[3].state.forward_tail)


def test_oracle_carries_callstack_witness():
    from zkevm_harness_tpu.witness import oracle as orc
    tracer = _trace(BLOCK)
    art = orc.create_artifacts_from_tracer(tracer, testing_geometry())
    assert art.callstack_witness is not None
    assert art.callstack_witness.final_state == (0,) * 12
    assert len(art.callstack_witness.ops) == 4


def test_forged_pop_state_breaks_sponge_relation():
    sim = cs.FullWidthStackSimulator()
    sim.push(0, list(range(32)))
    sim._saved[-1] = ((1,) * 12, sim._saved[-1][1])  # forge the saved state
    with pytest.raises(AssertionError):
        sim.pop(1)
