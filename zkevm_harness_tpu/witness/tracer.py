"""Witness tracer: per-cycle trace capture + callstack/log-frame tracking.

Parity targets (SURVEY components 4-5):
  - `WitnessTracer` implementing the VmWitnessTracer callback surface
    (src/witness/tracer.rs:221-407): memory/log/decommit/precompile queries
    tagged with cycle numbers, refunds, context push/pop, and periodic
    `VmSnapshot`s every `cycles_per_vm_snapshot` cycles (tracer.rs:249-263);
  - `CallstackWithAuxData` (src/witness/callstack_handler.rs:26-457):
    forward vs rollback log-queue segments per frame with merge-on-pop
    semantics — a panicking frame replays its rollback entries into the
    forward queue in reverse order; a successful frame donates its pending
    rollbacks to its parent.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from ..vm.environment import DecommittmentQuery, LogQuery, MemoryQuery


@dataclasses.dataclass
class VmSnapshot:
    cycle: int
    state_repr: object  # opaque VM state snapshot (registers, frame, etc.)


@dataclasses.dataclass
class _Frame:
    rollbacks: List[Tuple[int, LogQuery]] = dataclasses.field(default_factory=list)
    forward_start: int = 0


class CallstackWithAuxData:
    """Forward/rollback log queue bookkeeping across frames."""

    def __init__(self):
        self.forward: List[Tuple[int, LogQuery]] = []  # (cycle, query)
        self.frames: List[_Frame] = [_Frame()]

    def add_log(self, cycle: int, query: LogQuery,
                rollback_query: Optional[LogQuery]):
        self.forward.append((cycle, query))
        if rollback_query is not None:
            self.frames[-1].rollbacks.append((cycle, rollback_query))

    def push_frame(self):
        self.frames.append(_Frame(forward_start=len(self.forward)))

    def pop_frame(self, cycle: int, panicked: bool):
        frame = self.frames.pop()
        if panicked:
            # replay this frame's rollbacks into the forward queue, newest
            # first (callstack_handler.rs merge-on-pop panic path)
            for c, rb in reversed(frame.rollbacks):
                self.forward.append((cycle, rb))
        else:
            # donate pending rollbacks to the parent
            self.frames[-1].rollbacks.extend(frame.rollbacks)

    def final_queue(self) -> List[Tuple[int, LogQuery]]:
        assert len(self.frames) == 1, "unbalanced frames"
        return list(self.forward)

    def unapplied_rollbacks(self) -> List[Tuple[int, LogQuery]]:
        return list(self.frames[0].rollbacks)


class WitnessTracer:
    """Accumulates the full execution trace for witness generation."""

    def __init__(self, cycles_per_vm_snapshot: int):
        self.cycles_per_vm_snapshot = cycles_per_vm_snapshot
        self.memory_queries: List[Tuple[int, MemoryQuery]] = []
        self.decommittment_queries: List[Tuple[int, DecommittmentQuery]] = []
        self.decommitted_bytecodes: Dict[int, List[int]] = {}
        self.cycle_states: List[object] = []
        self.cycle_instructions: List[Tuple[int, object]] = []
        self.final_state: object = None
        self.precompile_calls: List[Tuple[int, LogQuery, bytes, bytes]] = []
        self.refunds: List[Tuple[int, LogQuery, int]] = []
        self.callstack_with_aux_data = CallstackWithAuxData()
        self.vm_snapshots: List[VmSnapshot] = []
        self.cycle_counter = 0
        # per-cycle frame-pop records for the MainVM stack argument:
        # cycle -> {"panicked", "is_local", "ret_pc", "handler"}
        self.frame_pops: Dict[int, dict] = {}
        # full context push/pop records for the callstack sponge simulator
        # (witness/callstack_sim.py; oracle.rs:560-790 role): the SAVED
        # parent frame at push, the popped frame + panic flag at pop
        self.context_pushes: List[Tuple[int, object]] = []
        self.context_pops: List[Tuple[int, object, bool]] = []

    # -- VmWitnessTracer surface (tracer.rs:221-407) -----------------------

    def start_new_execution_cycle(self, vm_state_repr: object):
        if self.cycle_counter % self.cycles_per_vm_snapshot == 0:
            self.vm_snapshots.append(VmSnapshot(self.cycle_counter,
                                                vm_state_repr))
        # full per-cycle state log: the MainVM circuit's row witness
        # (the reference's VmWitnessOracle equivalently replays per-cycle
        # state, oracle.rs:1164-1420)
        self.cycle_states.append(vm_state_repr)
        self.cycle_counter += 1

    def add_execution_record(self, cycle: int, instr: object):
        """Record the decoded instruction executed at `cycle`."""
        self.cycle_instructions.append((cycle, instr))

    def record_final_state(self, vm_state_repr: object):
        """State after the last executed cycle (the MainVM exit boundary)."""
        self.final_state = vm_state_repr

    def add_memory_query(self, cycle: int, query: MemoryQuery):
        self.memory_queries.append((cycle, query))

    def add_log_query(self, cycle: int, query: LogQuery):
        rollback = None
        if query.rw_flag and not query.rollback:
            rollback = dataclasses.replace(query, rollback=True)
        self.callstack_with_aux_data.add_log(cycle, query, rollback)

    def add_decommittment(self, cycle: int, query: DecommittmentQuery,
                          words=None):
        self.decommittment_queries.append((cycle, query))
        if words is not None:
            self.decommitted_bytecodes[query.hash] = list(words)

    def add_precompile_call_result(self, cycle: int, query: LogQuery,
                                   data: bytes, result: bytes):
        self.precompile_calls.append((cycle, query, data, result))

    def record_refund_for_query(self, cycle: int, query: LogQuery,
                                refund: int):
        self.refunds.append((cycle, query, refund))

    def start_new_execution_context(self, cycle: int,
                                    saved_frame: object = None):
        self.callstack_with_aux_data.push_frame()
        if saved_frame is not None:
            self.context_pushes.append((cycle, saved_frame))

    def finish_execution_context(self, cycle: int, panicked: bool,
                                 frame_info: Optional[dict] = None):
        """frame_info (when given) records the popped frame for the MainVM
        near-call stack argument: is_local, the parent's resume pc, and the
        popped frame's exception handler."""
        self.callstack_with_aux_data.pop_frame(cycle, panicked)
        if frame_info is not None:
            self.frame_pops[cycle] = dict(frame_info, panicked=panicked)
        self.context_pops.append((cycle,
                                  (frame_info or {}).get("frame"),
                                  panicked))

    # -- witness-side accessors -------------------------------------------

    def final_log_queue(self) -> List[Tuple[int, LogQuery]]:
        return self.callstack_with_aux_data.final_queue()
