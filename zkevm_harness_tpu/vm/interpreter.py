"""Interpreter for the out-of-circuit zkEVM, executing BINARY bytecode.

Executes the instruction set in vm/isa.py against VmState, recording every
memory/log/decommit/precompile query through the witness tracer — the role of
the reference's cycle loop `vm.cycle(&mut tracer)` (src/external_calls.rs:192-208
driving zk_evm, SURVEY L0/stack 3.2).

Code is REAL bytecode: deployed contracts are assembled into 256-bit words
(vm/encoding.py), the decommitter hashes those words (the same versioned
hash the code-decommitter circuit re-computes in-circuit), and far calls
DECODE the decommitted words back into instructions — structured objects
never travel with the code (parity with zk_evm's on-the-fly decode of
zkevm-assembly output, src/tests/run_manually.rs:24,169).

Covered semantics: arithmetic + flags (add/sub/mul/div/bitwise/shifts),
heap read/write with heap-growth ergs, storage read/write with refunds,
events/L1 messages (kernel-only), near/far calls with frame rollback on
panic, ret/panic propagation, fat-pointer family (read/add/shrink/pack),
context/meta reads, per-opcode ergs costs, invalid-opcode panic.
"""

from __future__ import annotations

import dataclasses

from typing import List, Optional

from ..witness.tracer import WitnessTracer
from ..vm import encoding, isa
from ..vm.environment import (AUX_BYTE_EVENT, AUX_BYTE_L1_MESSAGE,
                              AUX_BYTE_PRECOMPILE, AUX_BYTE_STORAGE,
                              LogQuery, MemoryLocation, MemoryQuery)
from ..vm.state import U256_MASK, CallstackEntry, VmState


class VmPanic(Exception):
    pass


def pack_fat_pointer(page: int, start: int, length: int) -> int:
    """Fat pointer register encoding: page(32) | start(32) | length(32)."""
    return (page << 64) | (start << 32) | length


def unpack_fat_pointer(value: int):
    return (value >> 64) & 0xFFFFFFFF, (value >> 32) & 0xFFFFFFFF, \
        value & 0xFFFFFFFF


# Per-opcode ergs (zk_evm's opcode price table role; values are this VM's
# calibration, not the reference's — the shape is what matters: storage
# and frame-switching ops are priced above ALU ops, heap growth is paid
# per fresh word below).
ERGS_PER_CYCLE = 1  # base decode/issue cost, every cycle
ERGS_COSTS = {
    isa.StorageWrite: 10, isa.StorageRead: 4,
    isa.Event: 5, isa.FarCall: 20, isa.FarCallData: 20,
    isa.NearCall: 5, isa.Precompile: 10,
}
HEAP_GROWTH_ERGS_PER_WORD = 1

KERNEL_SPACE_BOUND = 1 << 16  # addresses below run in kernel mode (EraVM)
DEPLOYER_ADDRESS = 0x8002_0000  # address -> code-hash mapping lives here
CODE_STORE: dict = {}  # code page id -> decoded instruction list (cache)


def deploy_contract(tools, address: int, instructions) -> int:
    """Predeploy a contract (save_predeployed_contracts parity,
    src/tests/mod.rs:38-96): assemble the instructions into binary
    bytecode words, register those words with the decommitter, and record
    the versioned hash in the deployer mapping. Returns the hash. The
    words ARE the code — execution decodes them after decommit."""
    from ..witness.decommitter import bytecode_hash
    words = encoding.assemble(instructions)
    code_hash = bytecode_hash(words)
    tools.decommitter.populate([(code_hash, words)])
    tools.storage.write(0, DEPLOYER_ADDRESS, address, code_hash)
    return code_hash


def run_vm(vm: VmState, code: List[isa.Instruction], cycle_limit: int,
           strict_kernel: bool = False) -> int:
    """Run until root frame returns or the cycle limit hits. Returns cycles.

    `code` is the entry contract's instruction list (page 0) — it is
    round-tripped through the binary encoding so execution always flows
    through decoded bytecode; far-called contracts' code is decoded from
    their decommitted words. `strict_kernel` enforces kernel-only opcodes
    (events/L1 messages/precompiles — kernel_ops.rs semantics).
    """
    tracer: WitnessTracer = vm.tools.tracer
    vm.strict_kernel = strict_kernel
    CODE_STORE[vm.frame.code_page] = encoding.disassemble(
        encoding.assemble(code))
    for _ in range(cycle_limit):
        if vm.finished:
            break
        tracer.start_new_execution_cycle(_snapshot_repr(vm))
        cycle = vm.monotonic_cycle_counter
        pc = vm.frame.pc
        page_code = CODE_STORE[vm.frame.code_page]
        assert 0 <= pc < len(page_code), f"pc {pc} out of code"
        instr = page_code[pc]
        # ergs metering: base cost + per-opcode price; running dry inside
        # a call frame panics to the handler (limited_ergs.rs semantics)
        cost = ERGS_PER_CYCLE + ERGS_COSTS.get(type(instr), 0)
        if vm.frame.ergs_remaining < cost:
            _unwind_panic(vm, cycle, "out of ergs")
        else:
            vm.frame.ergs_remaining -= cost
            tracer.add_execution_record(cycle, instr)
            try:
                _execute(vm, instr, cycle)
            except _SoftPanic as e:
                _unwind_panic(vm, cycle, str(e))
        vm.monotonic_cycle_counter += 1
        vm.timestamp += 2  # each cycle opens a fresh timestamp pair
    tracer.record_final_state(_snapshot_repr(vm))
    return vm.monotonic_cycle_counter


class _SoftPanic(Exception):
    """In-VM panic: unwinds the current frame to its exception handler
    (invalid opcode, fat-pointer violation, kernel-mode violation)."""


def _unwind_panic(vm: VmState, cycle: int, reason: str):
    """Pop the current frame with rollback; root-frame panics abort."""
    if len(vm.callstack) == 1:
        raise VmPanic(f"root frame panicked: {reason}")
    popped = vm.callstack.pop()
    vm.tools.storage.finish_frame(True)
    vm.tools.event_sink.finish_frame(True)
    vm.tools.tracer.finish_execution_context(cycle, True, frame_info={
        "is_local": popped.is_local_call, "ret_pc": vm.frame.pc,
        "handler": popped.exception_handler, "frame": popped})
    vm.frame.pc = popped.exception_handler


def _snapshot_repr(vm: VmState):
    return {
        "registers": [(r.value, r.is_pointer) for r in vm.registers],
        "pc": vm.frame.pc,
        "callstack_depth": len(vm.callstack),
        "timestamp": vm.timestamp,
        "flags": (vm.flags.eq, vm.flags.lt, vm.flags.gt),
        "code_page": vm.frame.code_page,
    }


def _val(vm: VmState, op: isa.Operand) -> int:
    if op.kind == "imm":
        return op.value & U256_MASK
    return vm.reg_read(op.value).value


def _require_kernel(vm: VmState, what: str):
    """Kernel-only opcode gate (simple_tests/kernel_ops.rs semantics);
    enforced when the VM runs with strict_kernel=True."""
    if getattr(vm, "strict_kernel", False) and not vm.frame.is_kernel_mode:
        raise _SoftPanic(f"{what} outside kernel mode")


def _charge_heap_growth(vm: VmState, addr: int):
    """Heap accesses past the frame's current bound pay growth ergs
    (memory_growth.rs semantics); running dry mid-growth panics."""
    f = vm.frame
    if addr >= f.heap_bound:
        grow = addr + 1 - f.heap_bound
        cost = grow * HEAP_GROWTH_ERGS_PER_WORD
        if f.ergs_remaining < cost:
            raise _SoftPanic("out of ergs growing the heap")
        f.ergs_remaining -= cost
        f.heap_bound = addr + 1


def _execute(vm: VmState, instr: isa.Instruction, cycle: int):
    tracer: WitnessTracer = vm.tools.tracer
    mem = vm.tools.memory
    f = vm.frame

    if isinstance(instr, isa.Nop):
        f.pc += 1

    elif isinstance(instr, isa.Invalid):
        # zero-padding slot: executing it is a frame panic (EraVM invalid
        # opcode / jump-past-code semantics)
        raise _SoftPanic("invalid opcode")

    elif isinstance(instr, isa.Div):
        a = _val(vm, instr.src0)
        b = _val(vm, instr.src1)
        if b == 0:
            q = r = 0
            vm.flags.eq = True
            vm.flags.lt = vm.flags.gt = False
        else:
            q, r = divmod(a, b)
            vm.flags.eq = q == 0
            vm.flags.lt = False
            vm.flags.gt = r != 0
        vm.reg_write(instr.dst_quot, q)
        vm.reg_write(instr.dst_rem, r)
        f.pc += 1

    elif isinstance(instr, isa.Context):
        field = instr.field
        if field == encoding.CTX_THIS:
            v = f.this_address
        elif field == encoding.CTX_SENDER:
            v = f.msg_sender
        elif field == encoding.CTX_CODE_ADDRESS:
            v = f.code_address
        elif field == encoding.CTX_ERGS_LEFT:
            v = f.ergs_remaining
        elif field == encoding.CTX_U128:
            v = f.context_u128
        elif field == encoding.CTX_SP:
            v = f.sp
        elif field == encoding.CTX_META:
            # meta word: heap bound | aux heap bound | tx number | kernel
            v = (f.heap_bound | (f.aux_heap_bound << 32)
                 | (vm.tx_number_in_block << 64)
                 | ((1 if f.is_kernel_mode else 0) << 96))
        else:
            raise _SoftPanic(f"unknown context field {field}")
        vm.reg_write(instr.dst, v)
        f.pc += 1

    elif isinstance(instr, isa.BinOp):
        a = _val(vm, instr.src0)
        b = _val(vm, instr.src1)
        if instr.op == "add":
            r = a + b
            vm.flags.lt = r > U256_MASK
            r &= U256_MASK
        elif instr.op == "sub":
            r = (a - b) & U256_MASK
            vm.flags.lt = a < b
        elif instr.op == "mul":
            r = (a * b) & U256_MASK
        elif instr.op == "and":
            r = a & b
        elif instr.op == "or":
            r = a | b
        elif instr.op == "xor":
            r = a ^ b
        elif instr.op == "shl":
            r = (a << (b & 0xFF)) & U256_MASK
        elif instr.op == "shr":
            r = a >> (b & 0xFF)
        else:
            raise NotImplementedError(instr.op)
        vm.flags.eq = r == 0
        vm.flags.gt = (not vm.flags.lt) and not vm.flags.eq
        vm.reg_write(instr.dst, r)
        f.pc += 1

    elif isinstance(instr, isa.Jump):
        f.pc = instr.target

    elif isinstance(instr, isa.JumpIfEq):
        f.pc = instr.target if vm.flags.eq else f.pc + 1

    elif isinstance(instr, isa.HeapWrite):
        addr = _val(vm, instr.addr)
        value = _val(vm, instr.src)
        page = f.base_memory_page
        _charge_heap_growth(vm, addr)
        mem.write(page, addr, value)
        tracer.add_memory_query(cycle, MemoryQuery(
            vm.timestamp, MemoryLocation(page, addr), value, rw_flag=True))
        f.pc += 1

    elif isinstance(instr, isa.HeapRead):
        addr = _val(vm, instr.addr)
        page = f.base_memory_page
        _charge_heap_growth(vm, addr)
        value, is_ptr = mem.read(page, addr)
        tracer.add_memory_query(cycle, MemoryQuery(
            vm.timestamp, MemoryLocation(page, addr), value, rw_flag=False,
            value_is_pointer=is_ptr))
        vm.reg_write(instr.dst, value, is_ptr)
        f.pc += 1

    elif isinstance(instr, isa.StorageWrite):
        key = _val(vm, instr.key)
        value = _val(vm, instr.src)
        old = vm.tools.storage.write(0, f.this_address, key, value)
        q = LogQuery(vm.timestamp, vm.tx_number_in_block, AUX_BYTE_STORAGE, 0,
                     f.this_address, key, old, value, rw_flag=True)
        tracer.add_log_query(cycle, q)
        tracer.record_refund_for_query(cycle, q, refund=0)
        f.pc += 1

    elif isinstance(instr, isa.StorageRead):
        key = _val(vm, instr.key)
        value = vm.tools.storage.read(0, f.this_address, key)
        q = LogQuery(vm.timestamp, vm.tx_number_in_block, AUX_BYTE_STORAGE, 0,
                     f.this_address, key, value, value, rw_flag=False)
        tracer.add_log_query(cycle, q)
        vm.reg_write(instr.dst, value)
        f.pc += 1

    elif isinstance(instr, isa.Event):
        _require_kernel(vm, "event")
        q = LogQuery(vm.timestamp, vm.tx_number_in_block,
                     AUX_BYTE_L1_MESSAGE if instr.to_l1 else AUX_BYTE_EVENT,
                     0, f.this_address, _val(vm, instr.key),
                     0, _val(vm, instr.value), rw_flag=True)
        vm.tools.event_sink.add(q)
        tracer.add_log_query(cycle, q)
        f.pc += 1

    elif isinstance(instr, isa.NearCall):
        new_frame = CallstackEntry(
            this_address=f.this_address, msg_sender=f.msg_sender,
            code_address=f.code_address, code_page=f.code_page,
            base_memory_page=f.base_memory_page, pc=instr.target,
            exception_handler=instr.exception_handler,
            ergs_remaining=(instr.ergs if instr.ergs
                            else f.ergs_remaining), is_static=f.is_static,
            is_kernel_mode=f.is_kernel_mode, is_local_call=True,
            context_u128=f.context_u128)
        f.pc += 1  # return point
        vm.callstack.append(new_frame)
        vm.tools.storage.start_frame()
        vm.tools.event_sink.start_frame()
        tracer.start_new_execution_context(
            cycle, saved_frame=dataclasses.replace(f))

    elif isinstance(instr, isa.Ret):
        panicked = instr.panic
        if len(vm.callstack) == 1:
            vm.finished = True
            assert not panicked, "root frame panicked"
            return
        popped = vm.callstack.pop()
        vm.tools.storage.finish_frame(panicked)
        vm.tools.event_sink.finish_frame(panicked)
        tracer.finish_execution_context(cycle, panicked, frame_info={
            "is_local": popped.is_local_call, "ret_pc": vm.frame.pc,
            "handler": popped.exception_handler, "frame": popped})
        if panicked:
            # resume the parent at the handler the popped frame recorded
            vm.frame.pc = popped.exception_handler
        elif isinstance(instr, isa.RetData) and not popped.is_local_call:
            # publish returndata: fat pointer into the callee's heap page
            vm.reg_write(1, pack_fat_pointer(
                popped.base_memory_page, _val(vm, instr.data_start),
                _val(vm, instr.data_len)), is_pointer=True)

    elif isinstance(instr, isa.PtrRead):
        reg = vm.reg_read(instr.ptr)
        if not reg.is_pointer:
            raise _SoftPanic("PtrRead through a non-pointer register")
        page, start, length = unpack_fat_pointer(reg.value)
        off = _val(vm, instr.offset)
        if off < length:
            value, _ = mem.read(page, start + off)
            tracer.add_memory_query(cycle, MemoryQuery(
                vm.timestamp, MemoryLocation(page, start + off), value,
                rw_flag=False))
        else:
            value = 0  # out-of-bounds fat-pointer reads yield zero
        vm.reg_write(instr.dst, value)
        f.pc += 1

    elif isinstance(instr, isa.PtrAdd):
        reg = vm.reg_read(instr.ptr)
        if not reg.is_pointer:
            raise _SoftPanic("PtrAdd on a non-pointer register")
        page, start, length = unpack_fat_pointer(reg.value)
        delta = _val(vm, instr.delta)
        if delta > length:
            raise _SoftPanic("PtrAdd advances past the pointer bound")
        high = reg.value >> 128  # preserve packed metadata
        vm.reg_write(instr.dst,
                     (high << 128) | pack_fat_pointer(
                         page, start + delta, length - delta),
                     is_pointer=True)
        f.pc += 1

    elif isinstance(instr, isa.PtrShrink):
        reg = vm.reg_read(instr.ptr)
        if not reg.is_pointer:
            raise _SoftPanic("PtrShrink on a non-pointer register")
        page, start, length = unpack_fat_pointer(reg.value)
        delta = _val(vm, instr.delta)
        if delta > length:
            raise _SoftPanic("PtrShrink underflows the pointer length")
        high = reg.value >> 128
        vm.reg_write(instr.dst,
                     (high << 128) | pack_fat_pointer(
                         page, start, length - delta),
                     is_pointer=True)
        f.pc += 1

    elif isinstance(instr, isa.PtrPack):
        reg = vm.reg_read(instr.ptr)
        if not reg.is_pointer:
            raise _SoftPanic("PtrPack on a non-pointer register")
        high = _val(vm, instr.high)
        if high & ((1 << 128) - 1):
            raise _SoftPanic("PtrPack high half has low bits set")
        vm.reg_write(instr.dst,
                     high | (reg.value & ((1 << 128) - 1)),
                     is_pointer=True)
        f.pc += 1

    elif isinstance(instr, isa.FarCall):
        callee = _val(vm, instr.address)
        # deployer lookup: code hash for the callee address
        code_hash = vm.tools.storage.read(0, DEPLOYER_ADDRESS, callee)
        q = LogQuery(vm.timestamp, vm.tx_number_in_block, AUX_BYTE_STORAGE, 0,
                     DEPLOYER_ADDRESS, callee, code_hash, code_hash,
                     rw_flag=False)
        tracer.add_log_query(cycle, q)
        if code_hash == 0:
            raise _SoftPanic(f"far call to undeployed address {callee:#x}")
        dq, words = vm.tools.decommitter.decommit(code_hash, mem,
                                                  vm.timestamp)
        tracer.add_decommittment(
            cycle, dq, vm.tools.decommitter.known.get(code_hash))
        # execution decodes the DECOMMITTED bytecode words — the same words
        # whose versioned hash the decommitter circuit proves in-circuit.
        # Fresh decommits carry words (and overwrite any stale decode from
        # a previous VM reusing the page id); repeated ones reuse the page
        # this VM already decoded.
        if words is not None:
            CODE_STORE[dq.memory_page] = encoding.disassemble(words)
        else:
            assert dq.memory_page in CODE_STORE, "repeat decommit w/o code"
        heap_page = mem.new_page()
        new_frame = CallstackEntry(
            this_address=callee, msg_sender=f.this_address,
            code_address=callee, code_page=dq.memory_page,
            base_memory_page=heap_page, pc=0,
            exception_handler=instr.exception_handler,
            ergs_remaining=f.ergs_remaining, is_static=f.is_static,
            is_kernel_mode=callee < KERNEL_SPACE_BOUND, is_local_call=False,
            context_u128=f.context_u128)
        f.pc += 1
        vm.callstack.append(new_frame)
        if isinstance(instr, isa.FarCallData):
            vm.reg_write(1, pack_fat_pointer(
                f.base_memory_page, _val(vm, instr.calldata_start),
                _val(vm, instr.calldata_len)), is_pointer=True)
        vm.tools.storage.start_frame()
        vm.tools.event_sink.start_frame()
        tracer.start_new_execution_context(
            cycle, saved_frame=dataclasses.replace(f))

    elif isinstance(instr, isa.Precompile):
        _require_kernel(vm, "precompile call")
        if instr.data_words == 1:
            data = bytes(_val(vm, instr.data).to_bytes(32, "big"))
        else:
            # heap-sourced input: read data_words consecutive words (each
            # read lands in the memory queue like any other heap access)
            base_addr = _val(vm, instr.data)
            page = f.base_memory_page
            chunks = []
            for i in range(instr.data_words):
                value, _ = mem.read(page, base_addr + i)
                tracer.add_memory_query(cycle, MemoryQuery(
                    vm.timestamp, MemoryLocation(page, base_addr + i),
                    value, rw_flag=False))
                chunks.append(int(value).to_bytes(32, "big"))
            data = b"".join(chunks)
        result = vm.tools.precompiles.process(instr.address, data)
        q = LogQuery(vm.timestamp, vm.tx_number_in_block, AUX_BYTE_PRECOMPILE,
                     0, instr.address, 0, 0, 0, rw_flag=False)
        tracer.add_precompile_call_result(cycle, q, data, result)
        vm.reg_write(instr.dst, int.from_bytes(result, "big"))
        f.pc += 1

    else:
        raise NotImplementedError(type(instr).__name__)
