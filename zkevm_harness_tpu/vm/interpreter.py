"""Structured-ISA interpreter for the out-of-circuit zkEVM.

Executes the instruction set in vm/isa.py against VmState, recording every
memory/log/decommit/precompile query through the witness tracer — the role of
the reference's cycle loop `vm.cycle(&mut tracer)` (src/external_calls.rs:192-208
driving zk_evm, SURVEY L0/stack 3.2).

Round-1 scope: a structured instruction object per code slot (the binary
EraVM ISA decoder is the planned native component). Covered semantics:
arithmetic + flags, heap read/write, storage read/write with refunds,
events/L1 messages, near calls with frame rollback on panic, ret/panic
propagation, precompile calls.
"""

from __future__ import annotations

from typing import List, Optional

from ..witness.tracer import WitnessTracer
from ..vm import isa
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


ERGS_PER_CYCLE = 1  # flat per-cycle cost (per-opcode table comes with the
# binary ISA decoder)
DEPLOYER_ADDRESS = 0x8002_0000  # address -> code-hash mapping lives here
CODE_STORE: dict = {}  # code page id -> instruction list (structured ISA)
_CONTRACT_CODE: dict = {}  # code hash -> instruction list


def deploy_contract(tools, address: int, instructions) -> int:
    """Predeploy a contract (save_predeployed_contracts parity,
    src/tests/mod.rs:38-96): register its bytecode with the decommitter,
    record the versioned hash in the deployer mapping, and stash the
    structured instructions for execution after decommit. Returns the hash."""
    from ..witness.decommitter import bytecode_hash
    words = [i for i in range(len(instructions))]  # placeholder encoding
    code_hash = bytecode_hash(words)
    tools.decommitter.populate([(code_hash, words)])
    tools.storage.write(0, DEPLOYER_ADDRESS, address, code_hash)
    _CONTRACT_CODE[code_hash] = list(instructions)
    return code_hash


def run_vm(vm: VmState, code: List[isa.Instruction], cycle_limit: int) -> int:
    """Run until root frame returns or the cycle limit hits. Returns cycles.

    `code` is the entry contract's instruction list (page 0); far-called
    contracts' instructions come from CODE_STORE via their decommitted page.
    """
    tracer: WitnessTracer = vm.tools.tracer
    CODE_STORE[vm.frame.code_page] = list(code)
    for _ in range(cycle_limit):
        if vm.finished:
            break
        tracer.start_new_execution_cycle(_snapshot_repr(vm))
        cycle = vm.monotonic_cycle_counter
        pc = vm.frame.pc
        page_code = CODE_STORE[vm.frame.code_page]
        assert 0 <= pc < len(page_code), f"pc {pc} out of code"
        instr = page_code[pc]
        # ergs metering: every cycle costs ERGS_PER_CYCLE; running dry inside
        # a call frame panics to the handler (limited_ergs.rs semantics)
        if vm.frame.ergs_remaining < ERGS_PER_CYCLE:
            if len(vm.callstack) == 1:
                raise VmPanic("root frame out of ergs")
            popped = vm.callstack.pop()
            vm.tools.storage.finish_frame(True)
            vm.tools.event_sink.finish_frame(True)
            tracer.finish_execution_context(cycle, True)
            vm.frame.pc = popped.exception_handler
        else:
            vm.frame.ergs_remaining -= ERGS_PER_CYCLE
            tracer.add_execution_record(cycle, instr)
            _execute(vm, instr, cycle)
        vm.monotonic_cycle_counter += 1
        vm.timestamp += 2  # each cycle opens a fresh timestamp pair
    tracer.record_final_state(_snapshot_repr(vm))
    return vm.monotonic_cycle_counter


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


def _execute(vm: VmState, instr: isa.Instruction, cycle: int):
    tracer: WitnessTracer = vm.tools.tracer
    mem = vm.tools.memory
    f = vm.frame

    if isinstance(instr, isa.Nop):
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
        mem.write(page, addr, value)
        tracer.add_memory_query(cycle, MemoryQuery(
            vm.timestamp, MemoryLocation(page, addr), value, rw_flag=True))
        f.pc += 1

    elif isinstance(instr, isa.HeapRead):
        addr = _val(vm, instr.addr)
        page = f.base_memory_page
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
        tracer.start_new_execution_context(cycle)

    elif isinstance(instr, isa.Ret):
        panicked = instr.panic
        if len(vm.callstack) == 1:
            vm.finished = True
            assert not panicked, "root frame panicked"
            return
        popped = vm.callstack.pop()
        vm.tools.storage.finish_frame(panicked)
        vm.tools.event_sink.finish_frame(panicked)
        tracer.finish_execution_context(cycle, panicked)
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
        assert reg.is_pointer, "PtrRead through a non-pointer register"
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

    elif isinstance(instr, isa.FarCall):
        callee = _val(vm, instr.address)
        # deployer lookup: code hash for the callee address
        code_hash = vm.tools.storage.read(0, DEPLOYER_ADDRESS, callee)
        q = LogQuery(vm.timestamp, vm.tx_number_in_block, AUX_BYTE_STORAGE, 0,
                     DEPLOYER_ADDRESS, callee, code_hash, code_hash,
                     rw_flag=False)
        tracer.add_log_query(cycle, q)
        assert code_hash != 0, f"far call to undeployed address {callee:#x}"
        dq, _words = vm.tools.decommitter.decommit(code_hash, mem, vm.timestamp)
        tracer.add_decommittment(
            cycle, dq, vm.tools.decommitter.known.get(code_hash))
        CODE_STORE[dq.memory_page] = _CONTRACT_CODE[code_hash]
        heap_page = mem.new_page()
        new_frame = CallstackEntry(
            this_address=callee, msg_sender=f.this_address,
            code_address=callee, code_page=dq.memory_page,
            base_memory_page=heap_page, pc=0,
            exception_handler=instr.exception_handler,
            ergs_remaining=f.ergs_remaining, is_static=f.is_static,
            is_kernel_mode=False, is_local_call=False,
            context_u128=f.context_u128)
        f.pc += 1
        vm.callstack.append(new_frame)
        if isinstance(instr, isa.FarCallData):
            vm.reg_write(1, pack_fat_pointer(
                f.base_memory_page, _val(vm, instr.calldata_start),
                _val(vm, instr.calldata_len)), is_pointer=True)
        vm.tools.storage.start_frame()
        vm.tools.event_sink.start_frame()
        tracer.start_new_execution_context(cycle)

    elif isinstance(instr, isa.Precompile):
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
