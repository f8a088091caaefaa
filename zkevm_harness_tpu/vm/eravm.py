"""EraVM bytecode front end: real 64-bit instruction words + `.asm` text.

The reference assembles zkEVM assembly text with `zkevm-assembly` and
executes the resulting bytecode with zk_evm's production decoder
(src/tests/run_manually.rs:24,169; decode mode
`zkevm_opcode_defs::decoding::EncodingModeProduction`,
src/witness/tracer.rs:13). This module is the framework's EraVM front end:

  * the PRODUCTION 64-bit instruction-word layout (little-endian u64):

        bits  0..11   opcode-variant index (11-bit OPCODES_TABLE index)
        bits 11..14   condition code (8 predicates)
        bits 16..20   src0 register index
        bits 20..24   src1 register index
        bits 24..28   dst0 register index
        bits 28..32   dst1 register index
        bits 32..48   imm0 (u16)
        bits 48..64   imm1 (u16)

    — the 2-byte [variant||condition] + 2-byte register nibbles + two u16
    immediates format of EraVM; FOUR instructions per 32-byte code word
    (lowest u64 first), zero-padded to an odd word count exactly like the
    versioned-hash rule the decommitter enforces;

  * an OPCODES_TABLE built by a deterministic enumeration over
    (opcode kind, sub-mode, src0 addressing mode, set_flags) in the
    documented zkevm_opcode_defs order (Invalid, Nop, arithmetic, Jump,
    Context, Shift, Binop, Ptr, NearCall, Log, FarCall, Ret, UMA).
    `zkevm_opcode_defs` is an external git crate that is NOT vendored in
    /root/reference and this environment has no egress, so index-level
    bit-exactness against the canonical table cannot be established here;
    the enumeration below is therefore the framework's PINNED production
    table, with `OPCODES_TABLE` as the single swap point should the
    canonical crate's table become available (the same conformance posture
    as the Poseidon2 round constants, ops/poseidon2_params.py).

  * an assembler for the reference test-suite `.asm` dialect
    (src/tests/simple_tests/*.rs): labels, `@label` references, section
    directives (ignored), `add/sub/mul/div`, `and/or/xor/shl/shr`,
    `jump`, `near_call rN, @t, @h`, `ret.ok/ret.revert/ret.panic`,
    `sstore/sload`, `event/to_l1`, `context.<field>`, UMA `st.1/ld.1`;

  * a decoder bridging decoded EraVM words onto the framework's
    structured execution ISA (vm/isa.py), so EraVM bytecode flows through
    the SAME trace -> witness -> prove pipeline as native programs.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Sequence, Tuple

from . import isa

# ---------------------------------------------------------------------------
# Opcode-variant table
# ---------------------------------------------------------------------------

# addressing modes for src0 (dst0 is register-only in this subset; EraVM's
# stack/code dst modes are table-allocated for index stability but not
# executed by the bridge)
SRC_REG, SRC_IMM, SRC_CODE, SRC_STACK_ABS, SRC_STACK_REL = range(5)
SRC_MODES = (SRC_REG, SRC_IMM, SRC_CODE, SRC_STACK_ABS, SRC_STACK_REL)

# condition codes (zk_evm predicates)
COND_ALWAYS, COND_GT, COND_LT, COND_EQ, COND_GE, COND_LE, COND_NE, \
    COND_GTLT = range(8)
_COND_NAMES = {"": COND_ALWAYS, "gt": COND_GT, "lt": COND_LT, "eq": COND_EQ,
               "ge": COND_GE, "le": COND_LE, "ne": COND_NE, "gtlt": COND_GTLT}


@dataclasses.dataclass(frozen=True)
class OpcodeVariant:
    kind: str       # "add", "ret", "log", ...
    submode: str    # e.g. "ok"/"revert"/"panic" for ret, "sstore" for log
    src_mode: int   # SRC_* addressing mode of src0
    set_flags: bool


def _build_opcodes_table() -> List[OpcodeVariant]:
    """Deterministic variant enumeration (see module docstring). Index 0 is
    Invalid; every (kind, submode) spans all src0 modes x set_flags in
    order, mirroring the canonical crate's dense variant packing."""
    table: List[OpcodeVariant] = [OpcodeVariant("invalid", "", SRC_REG,
                                                False)]

    def emit(kind: str, submodes: Sequence[str], flags: bool = True):
        for sub in submodes:
            for m in SRC_MODES:
                for sf in ((False, True) if flags else (False,)):
                    table.append(OpcodeVariant(kind, sub, m, sf))

    emit("nop", [""], flags=False)
    emit("add", [""])
    emit("sub", [""])
    emit("mul", [""])
    emit("div", [""])
    emit("jump", [""], flags=False)
    emit("context", ["this", "caller", "code_address", "ergs_left",
                     "u128", "sp", "meta", "set_ergs_per_pubdata"],
         flags=False)
    emit("shift", ["shl", "shr", "rol", "ror"])
    emit("binop", ["and", "or", "xor"])
    emit("ptr", ["add", "sub", "pack", "shrink"], flags=False)
    emit("near_call", [""], flags=False)
    emit("log", ["sread", "swrite", "event", "to_l1", "precompile"],
         flags=False)
    emit("far_call", ["normal", "delegate", "mimic"], flags=False)
    emit("ret", ["ok", "revert", "panic"], flags=False)
    emit("uma", ["heap_read", "heap_write", "aux_heap_read",
                 "aux_heap_write", "fat_ptr_read"], flags=False)
    assert len(table) <= (1 << 11), "variant table exceeds 11 bits"
    return table


OPCODES_TABLE: List[OpcodeVariant] = _build_opcodes_table()
_VARIANT_INDEX: Dict[Tuple[str, str, int, bool], int] = {
    (v.kind, v.submode, v.src_mode, v.set_flags): i
    for i, v in enumerate(OPCODES_TABLE)}

VARIANT_BITS = 11
CONDITION_SHIFT = 11
INSTRUCTIONS_PER_WORD = 4  # four u64 instructions per 32-byte code word


class EraVmEncodingError(ValueError):
    pass


def pack_instruction(variant: int, condition: int = COND_ALWAYS,
                     src0: int = 0, src1: int = 0, dst0: int = 0,
                     dst1: int = 0, imm0: int = 0, imm1: int = 0) -> int:
    assert 0 <= variant < (1 << VARIANT_BITS)
    assert 0 <= condition < 8
    for r in (src0, src1, dst0, dst1):
        assert 0 <= r < 16, "register index out of range"
    assert 0 <= imm0 < (1 << 16) and 0 <= imm1 < (1 << 16)
    return (variant | (condition << CONDITION_SHIFT)
            | (src0 << 16) | (src1 << 20) | (dst0 << 24) | (dst1 << 28)
            | (imm0 << 32) | (imm1 << 48))


@dataclasses.dataclass(frozen=True)
class DecodedEraOpcode:
    variant: OpcodeVariant
    condition: int
    src0: int
    src1: int
    dst0: int
    dst1: int
    imm0: int
    imm1: int


def unpack_instruction(word: int) -> DecodedEraOpcode:
    vidx = word & ((1 << VARIANT_BITS) - 1)
    if vidx >= len(OPCODES_TABLE):
        raise EraVmEncodingError(f"variant index {vidx} out of table")
    return DecodedEraOpcode(
        variant=OPCODES_TABLE[vidx],
        condition=(word >> CONDITION_SHIFT) & 0x7,
        src0=(word >> 16) & 0xF, src1=(word >> 20) & 0xF,
        dst0=(word >> 24) & 0xF, dst1=(word >> 28) & 0xF,
        imm0=(word >> 32) & 0xFFFF, imm1=(word >> 48) & 0xFFFF)


# ---------------------------------------------------------------------------
# Bytecode words (32-byte, odd-count rule)
# ---------------------------------------------------------------------------

def instructions_to_words(instr_words: Sequence[int]) -> List[int]:
    """u64 instruction stream -> 256-bit code words (4 per word, lowest
    first), zero-slot terminated, padded to an ODD 32-byte word count."""
    stream = list(instr_words) + [0]  # explicit Invalid terminator
    words: List[int] = []
    for i in range(0, len(stream), INSTRUCTIONS_PER_WORD):
        chunk = stream[i:i + INSTRUCTIONS_PER_WORD]
        w = 0
        for k, u in enumerate(chunk):
            w |= int(u) << (64 * k)
        words.append(w)
    if len(words) % 2 == 0:
        words.append(0)
    return words


def words_to_instructions(words: Sequence[int]) -> List[int]:
    out: List[int] = []
    for w in words:
        for k in range(INSTRUCTIONS_PER_WORD):
            out.append((int(w) >> (64 * k)) & ((1 << 64) - 1))
    return out


# ---------------------------------------------------------------------------
# Assembler for the reference `.asm` dialect (simple_tests subset)
# ---------------------------------------------------------------------------

_LABEL_RE = re.compile(r"^\.?([A-Za-z_][\w.]*):$")
_REG_RE = re.compile(r"^r(\d+)$")

_CTX_FIELDS = {"this": "this", "caller": "caller",
               "code_address": "code_address", "ergs_left": "ergs_left",
               "get_context_u128": "u128", "sp": "sp", "meta": "meta",
               "set_ergs_per_pubdata": "set_ergs_per_pubdata"}


@dataclasses.dataclass
class _PendingInstr:
    mnemonic: str
    cond: int
    operands: List[str]
    line: str


def _parse_operand(tok: str, labels: Dict[str, int]
                   ) -> Tuple[int, int, int]:
    """-> (src_mode, reg, imm). `@label` resolves to its pc as imm."""
    tok = tok.strip()
    m = _REG_RE.match(tok)
    if m:
        return SRC_REG, int(m.group(1)), 0
    if tok.startswith("@"):
        name = tok[1:]
        if name not in labels:
            raise EraVmEncodingError(f"unknown label @{name}")
        return SRC_IMM, 0, labels[name]
    v = int(tok, 0)
    if not 0 <= v < (1 << 16):
        raise EraVmEncodingError(
            f"immediate {v} exceeds u16 (spill via code page unsupported "
            "in this dialect subset)")
    return SRC_IMM, 0, v


def assemble_text(asm: str) -> List[int]:
    """Assemble reference-dialect `.asm` text into u64 EraVM instruction
    words (use `instructions_to_words` for deployable 32-byte words)."""
    pending: List[_PendingInstr] = []
    labels: Dict[str, int] = {}
    for raw in asm.splitlines():
        line = raw.split(";")[0].strip()
        if not line or line.startswith((".text", ".file", ".rodata",
                                        ".p2align", ".globl", ".data",
                                        ".dword", ".cell")):
            m = _LABEL_RE.match(line)
            if m:
                labels[m.group(1)] = len(pending)
            continue
        m = _LABEL_RE.match(line)
        if m:
            labels[m.group(1)] = len(pending)
            continue
        parts = line.split(None, 1)
        mnemonic = parts[0]
        ops = ([p.strip() for p in parts[1].split(",")]
               if len(parts) > 1 else [])
        cond = COND_ALWAYS
        base = mnemonic
        if "." in mnemonic and not mnemonic.startswith("context"):
            head, _, suffix = mnemonic.partition(".")
            if suffix in _COND_NAMES:
                base, cond = head, _COND_NAMES[suffix]
            else:
                base = mnemonic  # ret.ok / st.1 / ld.1 keep their suffix
        pending.append(_PendingInstr(base, cond, ops, line))

    out: List[int] = []
    for pi in pending:
        out.append(_encode_pending(pi, labels))
    return out


def _v(kind: str, sub: str, mode: int, sf: bool = False) -> int:
    return _VARIANT_INDEX[(kind, sub, mode, sf)]


def _encode_pending(pi: _PendingInstr, labels: Dict[str, int]) -> int:
    mn, ops = pi.mnemonic, pi.operands

    def src(tok):
        return _parse_operand(tok, labels)

    def reg(tok):
        m = _REG_RE.match(tok.strip())
        if not m:
            raise EraVmEncodingError(f"expected register, got {tok!r} "
                                     f"in {pi.line!r}")
        return int(m.group(1))

    if mn == "nop":
        return pack_instruction(_v("nop", "", SRC_REG), pi.cond)
    if mn in ("add", "sub", "mul", "div"):
        m0, r0, i0 = src(ops[0])
        r1 = reg(ops[1])
        d0 = reg(ops[2])
        d1 = reg(ops[3]) if len(ops) > 3 else 0
        return pack_instruction(_v(mn, "", m0), pi.cond, src0=r0, src1=r1,
                                dst0=d0, dst1=d1, imm0=i0)
    if mn in ("and", "or", "xor"):
        m0, r0, i0 = src(ops[0])
        return pack_instruction(_v("binop", mn, m0), pi.cond, src0=r0,
                                src1=reg(ops[1]), dst0=reg(ops[2]), imm0=i0)
    if mn in ("shl", "shr", "rol", "ror"):
        m0, r0, i0 = src(ops[0])
        return pack_instruction(_v("shift", mn, m0), pi.cond, src0=r0,
                                src1=reg(ops[1]), dst0=reg(ops[2]), imm0=i0)
    if mn in ("jump", "jmp"):
        m0, r0, i0 = src(ops[0])
        return pack_instruction(_v("jump", "", m0), pi.cond, src0=r0,
                                imm0=i0)
    if mn == "near_call":
        abi = reg(ops[0])
        _, _, tgt = src(ops[1])
        _, _, hdl = src(ops[2])
        return pack_instruction(_v("near_call", "", SRC_REG), pi.cond,
                                src0=abi, imm0=tgt, imm1=hdl)
    if mn in ("ret.ok", "ret"):
        return pack_instruction(_v("ret", "ok", SRC_REG), pi.cond,
                                src0=reg(ops[0]) if ops else 0)
    if mn in ("ret.revert", "revert"):
        return pack_instruction(_v("ret", "revert", SRC_REG), pi.cond,
                                src0=reg(ops[0]) if ops else 0)
    if mn in ("ret.panic", "panic"):
        return pack_instruction(_v("ret", "panic", SRC_REG), pi.cond,
                                src0=reg(ops[0]) if ops else 0)
    if mn == "sstore":
        m0, r0, i0 = src(ops[0])
        return pack_instruction(_v("log", "swrite", m0), pi.cond, src0=r0,
                                src1=reg(ops[1]), imm0=i0)
    if mn == "sload":
        m0, r0, i0 = src(ops[0])
        return pack_instruction(_v("log", "sread", m0), pi.cond, src0=r0,
                                dst0=reg(ops[1]), imm0=i0)
    if mn == "event":
        m0, r0, i0 = src(ops[0])
        return pack_instruction(_v("log", "event", m0), pi.cond, src0=r0,
                                src1=reg(ops[1]), imm0=i0)
    if mn == "to_l1":
        m0, r0, i0 = src(ops[0])
        return pack_instruction(_v("log", "to_l1", m0), pi.cond, src0=r0,
                                src1=reg(ops[1]), imm0=i0)
    if mn.startswith("context."):
        field = mn.split(".", 1)[1]
        if field not in _CTX_FIELDS:
            raise EraVmEncodingError(f"unknown context field {field!r}")
        sub = _CTX_FIELDS[field]
        if sub == "set_ergs_per_pubdata":
            return pack_instruction(_v("context", sub, SRC_REG), pi.cond,
                                    src0=reg(ops[0]))
        return pack_instruction(_v("context", sub, SRC_REG), pi.cond,
                                dst0=reg(ops[0]))
    if mn in ("st.1", "st"):
        m0, r0, i0 = src(ops[0])
        return pack_instruction(_v("uma", "heap_write", m0), pi.cond,
                                src0=r0, src1=reg(ops[1]), imm0=i0)
    if mn in ("ld.1", "ld"):
        m0, r0, i0 = src(ops[0])
        return pack_instruction(_v("uma", "heap_read", m0), pi.cond,
                                src0=r0, dst0=reg(ops[1]), imm0=i0)
    raise EraVmEncodingError(f"unsupported mnemonic {mn!r} in {pi.line!r}")


# ---------------------------------------------------------------------------
# Decode bridge: EraVM words -> framework execution ISA
# ---------------------------------------------------------------------------

_CTX_TO_FIELD = {"this": 0, "caller": 1, "code_address": 2, "ergs_left": 3,
                 "u128": 4, "sp": 5, "meta": 6}


def decode_to_structured(word: int) -> isa.Instruction:
    """One decoded EraVM instruction word -> the framework's structured
    execution op. Conditions other than ALWAYS are not bridged (the
    structured ISA is predicate-free); raising keeps the gap explicit."""
    d = unpack_instruction(word)
    v = d.variant
    if d.condition == COND_EQ and v.kind == "jump" and v.src_mode == SRC_IMM:
        # `jump.eq @target`: the ONE predicate the circuit already carries
        # in-gates (EQF column + zero-sum flag gadget,
        # circuits/main_vm_circuit.py JumpIfEq) — bridged natively instead
        # of raising. Other predicates (lt/gt/ge/le/ne/gtlt) would need
        # more carried flag columns; they still raise below.
        return isa.JumpIfEq(d.imm0)
    if d.condition != COND_ALWAYS:
        raise EraVmEncodingError(
            "conditional execution is not bridged to the structured ISA "
            f"(condition {d.condition}; only jump.eq is)")

    def s0():
        if v.src_mode == SRC_REG:
            return isa.reg(d.src0)
        if v.src_mode == SRC_IMM:
            return isa.imm(d.imm0)
        raise EraVmEncodingError(
            f"src0 mode {v.src_mode} not bridged (code/stack operands)")

    if v.kind == "invalid":
        return isa.Invalid()
    if v.kind == "nop":
        return isa.Nop()
    if v.kind in ("add", "sub", "mul"):
        return isa.BinOp(v.kind, s0(), isa.reg(d.src1), d.dst0)
    if v.kind == "div":
        return isa.Div(s0(), isa.reg(d.src1), d.dst0, d.dst1)
    if v.kind == "binop":
        return isa.BinOp(v.submode, s0(), isa.reg(d.src1), d.dst0)
    if v.kind == "shift":
        return isa.BinOp(v.submode, s0(), isa.reg(d.src1), d.dst0)
    if v.kind == "jump":
        if v.src_mode != SRC_IMM:
            raise EraVmEncodingError("register jumps not bridged")
        return isa.Jump(d.imm0)
    if v.kind == "near_call":
        if d.src0 != 0:
            # the abi register carries a RUNTIME ergs budget; the
            # structured ISA's budget is static — only the r0
            # (pass-all-ergs, zk_evm convention) form bridges
            raise EraVmEncodingError(
                "near_call with a runtime ergs register is not bridged")
        return isa.NearCall(d.imm0, d.imm1, ergs=0)
    if v.kind == "ret":
        return isa.Ret(panic=(v.submode == "panic"))
    if v.kind == "log":
        if v.submode == "swrite":
            return isa.StorageWrite(s0(), isa.reg(d.src1))
        if v.submode == "sread":
            return isa.StorageRead(s0(), d.dst0)
        if v.submode == "event":
            return isa.Event(s0(), isa.reg(d.src1), to_l1=False)
        if v.submode == "to_l1":
            return isa.Event(s0(), isa.reg(d.src1), to_l1=True)
        raise EraVmEncodingError("precompile log not bridged here")
    if v.kind == "context":
        if v.submode == "set_ergs_per_pubdata":
            return isa.Nop()  # metering knob: no architectural effect here
        return isa.Context(_CTX_TO_FIELD[v.submode], d.dst0)
    if v.kind == "uma":
        if v.submode == "heap_write":
            return isa.HeapWrite(s0(), isa.reg(d.src1))
        if v.submode == "heap_read":
            return isa.HeapRead(s0(), d.dst0)
        raise EraVmEncodingError(f"uma {v.submode} not bridged")
    raise EraVmEncodingError(f"{v.kind} not bridged")


def disassemble_eravm(instr_words: Sequence[int]) -> List[isa.Instruction]:
    """u64 instruction stream -> structured program (stops at the zero
    terminator; everything after decodes Invalid, matching the native
    disassembler's padding semantics)."""
    out: List[isa.Instruction] = []
    done = False
    for u in instr_words:
        if done or u == 0:
            done = True
            out.append(isa.Invalid())
            continue
        out.append(decode_to_structured(u))
    return out


def assemble_era_program(asm: str) -> Tuple[List[int], List[isa.Instruction]]:
    """.asm text -> (deployable 32-byte code words, structured program)."""
    instr_words = assemble_text(asm)
    words = instructions_to_words(instr_words)
    prog = disassemble_eravm(words_to_instructions(words))
    # strip the terminator/padding Invalids: the execution path re-encodes
    # the structured program through the native binary layer, which adds
    # its own zero-slot terminator (vm/encoding.assemble)
    while prog and isinstance(prog[-1], isa.Invalid):
        prog.pop()
    return words, prog
