"""Structured instruction set for the out-of-circuit VM (round-1 subset).

Each instruction is a dataclass; `Operand` is a register index or immediate.
The binary EraVM ISA (64-bit instruction words: opcode/condition/addressing
modes — decoded by zkevm-assembly in the reference test flow) maps onto these
via a decoder that is the planned native C++ component.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Operand:
    kind: str  # "reg" | "imm"
    value: int


def reg(i: int) -> Operand:
    return Operand("reg", i)


def imm(v: int) -> Operand:
    return Operand("imm", v)


class Instruction:
    pass


@dataclasses.dataclass(frozen=True)
class Nop(Instruction):
    pass


@dataclasses.dataclass(frozen=True)
class BinOp(Instruction):
    op: str  # add/sub/mul/and/or/xor/shl/shr
    src0: Operand
    src1: Operand
    dst: int


@dataclasses.dataclass(frozen=True)
class Jump(Instruction):
    target: int


@dataclasses.dataclass(frozen=True)
class JumpIfEq(Instruction):
    target: int


@dataclasses.dataclass(frozen=True)
class HeapWrite(Instruction):
    addr: Operand
    src: Operand


@dataclasses.dataclass(frozen=True)
class HeapRead(Instruction):
    addr: Operand
    dst: int


@dataclasses.dataclass(frozen=True)
class StorageWrite(Instruction):
    key: Operand
    src: Operand


@dataclasses.dataclass(frozen=True)
class StorageRead(Instruction):
    key: Operand
    dst: int


@dataclasses.dataclass(frozen=True)
class Event(Instruction):
    key: Operand
    value: Operand
    to_l1: bool = False


@dataclasses.dataclass(frozen=True)
class NearCall(Instruction):
    target: int
    exception_handler: int
    ergs: int = 0  # 0 = pass all remaining ergs


@dataclasses.dataclass(frozen=True)
class Ret(Instruction):
    panic: bool = False


@dataclasses.dataclass(frozen=True)
class Precompile(Instruction):
    address: int
    data: Operand
    dst: int
    # >1: `data` is a heap address; the call reads this many consecutive
    # 32-byte heap words as its input (ecrecover reads 4: h||v||r||s)
    data_words: int = 1


@dataclasses.dataclass(frozen=True)
class FarCall(Instruction):
    """Call into another contract: decommit its code, switch frames.

    The callee address is read from `address` (reg/imm); its versioned code
    hash comes from the deployer mapping (storage of the deployer system
    contract). Execution continues at callee pc 0; Ret returns here.
    """

    address: Operand
    exception_handler: int


@dataclasses.dataclass(frozen=True)
class FarCallData(FarCall):
    """FarCall passing a calldata fat pointer (caller-heap region) in r1."""

    calldata_start: Operand = Operand("imm", 0)
    calldata_len: Operand = Operand("imm", 0)


@dataclasses.dataclass(frozen=True)
class RetData(Ret):
    """Ret publishing a returndata fat pointer (callee-heap region) to the
    caller's r1."""

    data_start: Operand = Operand("imm", 0)
    data_len: Operand = Operand("imm", 0)


@dataclasses.dataclass(frozen=True)
class PtrRead(Instruction):
    """Read word `offset` through the fat pointer in register `ptr`;
    out-of-bounds reads 0 (EraVM fat-pointer semantics)."""

    ptr: int  # register holding the fat pointer
    offset: Operand
    dst: int


@dataclasses.dataclass(frozen=True)
class Invalid(Instruction):
    """Zero-padding slot of the binary encoding; executing it panics
    (EraVM invalid-opcode semantics, cf. simple_tests ptr_add.rs invalid
    cases)."""


@dataclasses.dataclass(frozen=True)
class Div(Instruction):
    """Unsigned division: dst_quot = src0 / src1, dst_rem = src0 % src1.
    Division by zero yields (0, 0) and sets the eq flag (EraVM div
    semantics: the result is zeroed, flags mark the degenerate case)."""

    src0: Operand
    src1: Operand
    dst_quot: int
    dst_rem: int


@dataclasses.dataclass(frozen=True)
class PtrAdd(Instruction):
    """Fat-pointer offset arithmetic (ptr_add family,
    simple_tests/ptr_add.rs): dst = ptr with start advanced by `delta`
    (and length shrunk); panics if `ptr` is not a pointer register or the
    delta exceeds the remaining length."""

    ptr: int
    delta: Operand
    dst: int


@dataclasses.dataclass(frozen=True)
class PtrShrink(Instruction):
    """dst = ptr with length reduced by `delta` (panic on underflow)."""

    ptr: int
    delta: Operand
    dst: int


@dataclasses.dataclass(frozen=True)
class PtrPack(Instruction):
    """dst = ptr with the upper 128 bits replaced by `high`<<128 — the
    EraVM ptr.pack used to smuggle metadata next to a pointer; the low
    128 pointer bits must stay intact."""

    ptr: int
    high: Operand
    dst: int


@dataclasses.dataclass(frozen=True)
class Context(Instruction):
    """Read an execution-context field into a register (the zk_evm
    context/meta opcode, simple_tests/context.rs): field ids in
    vm/encoding.py (CTX_THIS, CTX_SENDER, CTX_CODE_ADDRESS,
    CTX_ERGS_LEFT, CTX_U128, CTX_SP, CTX_META)."""

    field: int
    dst: int
