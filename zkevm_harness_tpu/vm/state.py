"""Out-of-circuit zkEVM (EraVM) state model + toolset wiring.

Parity targets (SURVEY L0, components 1-2):
  - `ProvingToolset` / `create_tools` (src/toolset.rs:11-39): wires storage,
    memory, decommitter, event sink, precompile processor and the witness
    tracer into one VM;
  - `initial_out_of_circuit_context` / `create_out_of_circuit_global_context`
    (src/entry_point.rs:12-50): bootstrap callstack frame + block properties.

The interpreter (vm/interpreter.py) executes a structured instruction set
against this state; binary EraVM ISA decoding is the next layer (planned as
the native C++ component — the reference keeps the whole VM on CPU too, it is
inherently sequential).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

U256_MASK = (1 << 256) - 1
NUM_REGISTERS = 15  # r1..r15 (r0 is the constant-zero register)

# well-known page ids (mirroring the reference's bootloader layout roles)
BOOTLOADER_CODE_PAGE = 0
BOOTLOADER_HEAP_PAGE = 2


@dataclasses.dataclass
class RegisterValue:
    value: int = 0
    is_pointer: bool = False


@dataclasses.dataclass
class Flags:
    lt: bool = False  # carry / less-than
    eq: bool = False
    gt: bool = False

    def reset(self):
        self.lt = self.eq = self.gt = False


@dataclasses.dataclass
class CallstackEntry:
    """One execution frame (zk_evm CallStackEntry equivalent)."""

    this_address: int = 0
    msg_sender: int = 0
    code_address: int = 0
    code_page: int = 0
    base_memory_page: int = 0
    heap_bound: int = 0
    aux_heap_bound: int = 0
    pc: int = 0
    sp: int = 0
    exception_handler: int = 0
    ergs_remaining: int = 0
    is_static: bool = False
    is_kernel_mode: bool = False
    is_local_call: bool = False  # near call
    context_u128: int = 0


@dataclasses.dataclass
class BlockProperties:
    """create_out_of_circuit_global_context parity (src/entry_point.rs:42-50)."""

    block_number: int = 0
    block_timestamp: int = 0
    default_aa_code_hash: int = 0
    zkporter_is_available: bool = False


class VmState:
    def __init__(self, toolset: "ProvingToolset", block: BlockProperties,
                 initial_frame: CallstackEntry):
        self.tools = toolset
        self.block = block
        self.registers = [RegisterValue() for _ in range(NUM_REGISTERS)]
        self.flags = Flags()
        self.callstack: List[CallstackEntry] = [initial_frame]
        self.monotonic_cycle_counter = 0
        self.timestamp = 1024  # matches the reference's starting ts headroom
        self.tx_number_in_block = 0
        self.pending_exception = False
        self.finished = False

    @property
    def frame(self) -> CallstackEntry:
        return self.callstack[-1]

    def reg_read(self, idx: int) -> RegisterValue:
        if idx == 0:
            return RegisterValue(0, False)
        return self.registers[idx - 1]

    def reg_write(self, idx: int, value: int, is_pointer: bool = False):
        if idx == 0:
            return
        self.registers[idx - 1] = RegisterValue(value & U256_MASK, is_pointer)


@dataclasses.dataclass
class ProvingToolset:
    """create_tools parity: the bundle handed to the VM (src/toolset.rs:23-39)."""

    storage: object
    memory: object
    decommitter: object
    event_sink: object
    precompiles: object
    tracer: object
    geometry: object


def create_vm(toolset: ProvingToolset, block: BlockProperties,
              entry_address: int, code_page: int,
              initial_ergs: int = 1 << 32) -> VmState:
    """create_out_of_circuit_vm + initial_out_of_circuit_context parity."""
    frame = CallstackEntry(
        this_address=entry_address,
        msg_sender=0,
        code_address=entry_address,
        code_page=code_page,
        base_memory_page=BOOTLOADER_HEAP_PAGE,
        pc=0,
        ergs_remaining=initial_ergs,
        is_kernel_mode=True,
    )
    return VmState(toolset, block, frame)
