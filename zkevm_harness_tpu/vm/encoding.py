"""Binary ISA encoding: structured instructions <-> bytecode words.

The reference executes REAL bytecode: `zkevm-assembly` assembles `.asm`
text into 32-byte code words, the decommitter hashes them (versioned
sha256), and zk_evm decodes 64-bit instruction words on the fly
(src/tests/run_manually.rs:24,169 for the assemble step;
src/external_calls.rs:116-139 for populate/decommit). This module is our
equivalent binary layer: every deployed contract's structured instructions
are ENCODED into fixed-width binary words, those words are what the
decommitter hashes and the code-decommitter circuit re-hashes in-circuit,
and the interpreter executes by DECODING the decommitted words — the
structured objects never travel with the code.

Format (documented TPU-framework ISA, EraVM-shaped):
  - one instruction = 128 bits (lo u64 control word + hi u64 immediates);
    two instructions per 32-byte code word, lo-instruction first;
  - operands are reg / imm32 / pool: immediates wider than 32 bits are
    materialized into a CONSTANT POOL of 256-bit words appended after the
    instruction region (zkevm-assembly does the same for big constants),
    and the operand field holds the absolute word index;
  - the instruction region is terminated by an INVALID (all-zero) slot —
    executing INVALID panics, exactly EraVM's zero-padding semantics;
  - total bytecode length in 32-byte words is padded to be ODD (the EraVM
    versioned-hash rule the reference's decommitter enforces).

lo u64 layout:
  bits  0..7   opcode id
  bits  8..11  modifier (binop sub-op / panic / to_l1 / context field)
  bits 12..13  src0 mode   (0 reg, 1 imm32, 2 pool)
  bits 14..15  src1 mode
  bits 16..17  aux  mode   (third operand, pool-only immediates)
  bits 18..21  src0 reg
  bits 22..25  src1 reg
  bits 26..29  aux  reg
  bits 30..33  dst0 reg
  bits 34..37  dst1 reg    (second destination: div remainder / mul high)
  bits 38..53  target      (jump target / pool index of the aux operand /
                            precompile data_words)
  bits 54..63  reserved (zero)
hi u64 layout:
  bits  0..31  imm0    (src0 imm32 or pool index; NearCall: ergs budget)
  bits 32..47  imm1    (src1 imm16 or pool index; wider src1 immediates
                        are pool-spilled)
  bits 48..63  handler (exception handler pc)
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from . import isa

# opcode ids (0 = INVALID: zero padding panics on execution)
OP_INVALID = 0
OP_NOP = 1
OP_BINOP = 2
OP_JUMP = 3
OP_JEQ = 4
OP_HEAPW = 5
OP_HEAPR = 6
OP_STOW = 7
OP_STOR = 8
OP_EVENT = 9
OP_NCALL = 10
OP_RET = 11
OP_RETDATA = 12
OP_PRECOMPILE = 13
OP_FARCALL = 14
OP_FARCALLDATA = 15
OP_PTRREAD = 16
OP_CONTEXT = 17
OP_PTRADD = 18
OP_PTRPACK = 19
OP_PTRSHRINK = 20
OP_DIV = 21

BINOP_IDS = {"add": 0, "sub": 1, "mul": 2, "and": 3, "or": 4, "xor": 5,
             "shl": 6, "shr": 7, "rol": 8, "ror": 9}
BINOP_NAMES = {v: k for k, v in BINOP_IDS.items()}

# Context opcode field ids (zk_evm context/meta opcode analogue)
CTX_THIS, CTX_SENDER, CTX_CODE_ADDRESS, CTX_ERGS_LEFT = 0, 1, 2, 3
CTX_U128, CTX_SP, CTX_META = 4, 5, 6

MODE_REG, MODE_IMM, MODE_POOL = 0, 1, 2
_IMM0_MAX = 1 << 32
_IMM1_MAX = 1 << 16
_TARGET_MAX = 1 << 16
_HANDLER_MAX = 1 << 16


class EncodingError(ValueError):
    pass


def _pack_lo(opcode, modifier=0, m0=0, m1=0, ma=0, r0=0, r1=0, ra=0,
             d0=0, d1=0, target=0) -> int:
    assert 0 <= target < _TARGET_MAX, "target field overflow"
    return (opcode | (modifier << 8) | (m0 << 12) | (m1 << 14) | (ma << 16)
            | (r0 << 18) | (r1 << 22) | (ra << 26) | (d0 << 30) | (d1 << 34)
            | (target << 38))


def _pack_hi(imm0=0, imm1=0, handler=0) -> int:
    assert 0 <= imm0 < _IMM0_MAX and 0 <= imm1 < _IMM1_MAX
    assert 0 <= handler < _HANDLER_MAX, "handler field overflow"
    return imm0 | (imm1 << 32) | (handler << 48)


def _unpack_lo(lo: int):
    return {
        "opcode": lo & 0xFF, "modifier": (lo >> 8) & 0xF,
        "m0": (lo >> 12) & 0x3, "m1": (lo >> 14) & 0x3,
        "ma": (lo >> 16) & 0x3,
        "r0": (lo >> 18) & 0xF, "r1": (lo >> 22) & 0xF,
        "ra": (lo >> 26) & 0xF, "d0": (lo >> 30) & 0xF,
        "d1": (lo >> 34) & 0xF, "target": (lo >> 38) & 0xFFFF,
    }


def _unpack_hi(hi: int):
    return {"imm0": hi & 0xFFFFFFFF, "imm1": (hi >> 32) & 0xFFFF,
            "handler": (hi >> 48) & 0xFFFF}


class _Pool:
    """Constant pool builder: dedups 256-bit constants, assigns absolute
    word indices once the instruction-region size is known."""

    def __init__(self):
        self.values: List[int] = []
        self._index: Dict[int, int] = {}

    def slot(self, value: int) -> int:
        value = int(value)
        if value not in self._index:
            self._index[value] = len(self.values)
            self.values.append(value)
        return self._index[value]


def _enc_operand(op: isa.Operand, pool: _Pool, imm_max: int
                 ) -> Tuple[int, int, int]:
    """-> (mode, reg_field, imm_field)."""
    if op.kind == "reg":
        return MODE_REG, op.value, 0
    v = int(op.value)
    if 0 <= v < imm_max:
        return MODE_IMM, 0, v
    return MODE_POOL, 0, pool.slot(v)


def encode_instruction(instr: isa.Instruction, pool: _Pool
                       ) -> Tuple[int, int]:
    """-> (lo, hi) 64-bit halves. Pool indices are pool-local here and
    rebased by `assemble` once the layout is fixed."""
    t = type(instr)
    if t is isa.Nop:
        return _pack_lo(OP_NOP), _pack_hi()
    if t is isa.BinOp:
        m0, r0, i0 = _enc_operand(instr.src0, pool, _IMM0_MAX)
        m1, r1, i1 = _enc_operand(instr.src1, pool, _IMM1_MAX)
        return (_pack_lo(OP_BINOP, BINOP_IDS[instr.op], m0=m0, m1=m1,
                         r0=r0, r1=r1, d0=instr.dst),
                _pack_hi(imm0=i0, imm1=i1))
    if t is isa.Div:
        m0, r0, i0 = _enc_operand(instr.src0, pool, _IMM0_MAX)
        m1, r1, i1 = _enc_operand(instr.src1, pool, _IMM1_MAX)
        return (_pack_lo(OP_DIV, m0=m0, m1=m1, r0=r0, r1=r1,
                         d0=instr.dst_quot, d1=instr.dst_rem),
                _pack_hi(imm0=i0, imm1=i1))
    if t is isa.Jump:
        return _pack_lo(OP_JUMP, target=instr.target), _pack_hi()
    if t is isa.JumpIfEq:
        return _pack_lo(OP_JEQ, target=instr.target), _pack_hi()
    if t is isa.HeapWrite:
        m0, r0, i0 = _enc_operand(instr.addr, pool, _IMM0_MAX)
        m1, r1, i1 = _enc_operand(instr.src, pool, _IMM1_MAX)
        return (_pack_lo(OP_HEAPW, m0=m0, m1=m1, r0=r0, r1=r1),
                _pack_hi(imm0=i0, imm1=i1))
    if t is isa.HeapRead:
        m0, r0, i0 = _enc_operand(instr.addr, pool, _IMM0_MAX)
        return (_pack_lo(OP_HEAPR, m0=m0, r0=r0, d0=instr.dst),
                _pack_hi(imm0=i0))
    if t is isa.StorageWrite:
        m0, r0, i0 = _enc_operand(instr.key, pool, _IMM0_MAX)
        m1, r1, i1 = _enc_operand(instr.src, pool, _IMM1_MAX)
        return (_pack_lo(OP_STOW, m0=m0, m1=m1, r0=r0, r1=r1),
                _pack_hi(imm0=i0, imm1=i1))
    if t is isa.StorageRead:
        m0, r0, i0 = _enc_operand(instr.key, pool, _IMM0_MAX)
        return (_pack_lo(OP_STOR, m0=m0, r0=r0, d0=instr.dst),
                _pack_hi(imm0=i0))
    if t is isa.Event:
        m0, r0, i0 = _enc_operand(instr.key, pool, _IMM0_MAX)
        m1, r1, i1 = _enc_operand(instr.value, pool, _IMM1_MAX)
        return (_pack_lo(OP_EVENT, 1 if instr.to_l1 else 0,
                         m0=m0, m1=m1, r0=r0, r1=r1),
                _pack_hi(imm0=i0, imm1=i1))
    if t is isa.NearCall:
        return (_pack_lo(OP_NCALL, target=instr.target),
                _pack_hi(imm0=instr.ergs, handler=instr.exception_handler))
    if t is isa.RetData:  # subclass of Ret — test before Ret
        m0, r0, i0 = _enc_operand(instr.data_start, pool, _IMM0_MAX)
        m1, r1, i1 = _enc_operand(instr.data_len, pool, _IMM1_MAX)
        return (_pack_lo(OP_RETDATA, 1 if instr.panic else 0,
                         m0=m0, m1=m1, r0=r0, r1=r1),
                _pack_hi(imm0=i0, imm1=i1))
    if t is isa.Ret:
        return _pack_lo(OP_RET, 1 if instr.panic else 0), _pack_hi()
    if t is isa.Precompile:
        m0, r0, i0 = _enc_operand(instr.data, pool, _IMM0_MAX)
        m1, r1, i1 = _enc_operand(isa.imm(instr.address), pool, _IMM1_MAX)
        return (_pack_lo(OP_PRECOMPILE, m0=m0, m1=m1, r0=r0, r1=r1,
                         d0=instr.dst, target=instr.data_words),
                _pack_hi(imm0=i0, imm1=i1))
    if t is isa.FarCallData:  # subclass of FarCall — test before FarCall
        m0, r0, i0 = _enc_operand(instr.address, pool, _IMM0_MAX)
        m1, r1, i1 = _enc_operand(instr.calldata_start, pool, _IMM1_MAX)
        if instr.calldata_len.kind == "reg":
            ma, ra, tgt = MODE_REG, instr.calldata_len.value, 0
        else:  # aux immediates are pool-only (their index rides `target`)
            ma, ra = MODE_POOL, 0
            tgt = pool.slot(int(instr.calldata_len.value))
        return (_pack_lo(OP_FARCALLDATA, m0=m0, m1=m1, ma=ma,
                         r0=r0, r1=r1, ra=ra, target=tgt),
                _pack_hi(imm0=i0, imm1=i1,
                         handler=instr.exception_handler))
    if t is isa.FarCall:
        m0, r0, i0 = _enc_operand(instr.address, pool, _IMM0_MAX)
        return (_pack_lo(OP_FARCALL, m0=m0, r0=r0),
                _pack_hi(imm0=i0, handler=instr.exception_handler))
    if t is isa.PtrRead:
        m1, r1, i1 = _enc_operand(instr.offset, pool, _IMM1_MAX)
        return (_pack_lo(OP_PTRREAD, m1=m1, r0=instr.ptr, r1=r1,
                         d0=instr.dst),
                _pack_hi(imm1=i1))
    if t is isa.PtrAdd:
        m1, r1, i1 = _enc_operand(instr.delta, pool, _IMM1_MAX)
        return (_pack_lo(OP_PTRADD, m1=m1, r0=instr.ptr, r1=r1,
                         d0=instr.dst),
                _pack_hi(imm1=i1))
    if t is isa.PtrShrink:
        m1, r1, i1 = _enc_operand(instr.delta, pool, _IMM1_MAX)
        return (_pack_lo(OP_PTRSHRINK, m1=m1, r0=instr.ptr, r1=r1,
                         d0=instr.dst),
                _pack_hi(imm1=i1))
    if t is isa.PtrPack:
        m1, r1, i1 = _enc_operand(instr.high, pool, _IMM1_MAX)
        return (_pack_lo(OP_PTRPACK, m1=m1, r0=instr.ptr, r1=r1,
                         d0=instr.dst),
                _pack_hi(imm1=i1))
    if t is isa.Context:
        return _pack_lo(OP_CONTEXT, instr.field, d0=instr.dst), _pack_hi()
    raise EncodingError(f"cannot encode {t.__name__}")


def _dec_operand(mode: int, reg: int, imm: int,
                 words: Sequence[int]) -> isa.Operand:
    if mode == MODE_REG:
        return isa.reg(reg)
    if mode == MODE_IMM:
        return isa.imm(imm)
    if mode == MODE_POOL:
        return isa.imm(int(words[imm]))
    raise EncodingError(f"bad operand mode {mode}")


def decode_instruction(lo: int, hi: int,
                       words: Sequence[int]) -> isa.Instruction:
    f, g = _unpack_lo(lo), _unpack_hi(hi)
    op = f["opcode"]
    s0 = lambda: _dec_operand(f["m0"], f["r0"], g["imm0"], words)  # noqa: E731
    s1 = lambda: _dec_operand(f["m1"], f["r1"], g["imm1"], words)  # noqa: E731
    if op == OP_INVALID:
        return isa.Invalid()
    if op == OP_NOP:
        return isa.Nop()
    if op == OP_BINOP:
        return isa.BinOp(BINOP_NAMES[f["modifier"]], s0(), s1(), f["d0"])
    if op == OP_DIV:
        return isa.Div(s0(), s1(), f["d0"], f["d1"])
    if op == OP_JUMP:
        return isa.Jump(f["target"])
    if op == OP_JEQ:
        return isa.JumpIfEq(f["target"])
    if op == OP_HEAPW:
        return isa.HeapWrite(s0(), s1())
    if op == OP_HEAPR:
        return isa.HeapRead(s0(), f["d0"])
    if op == OP_STOW:
        return isa.StorageWrite(s0(), s1())
    if op == OP_STOR:
        return isa.StorageRead(s0(), f["d0"])
    if op == OP_EVENT:
        return isa.Event(s0(), s1(), to_l1=bool(f["modifier"] & 1))
    if op == OP_NCALL:
        return isa.NearCall(f["target"], g["handler"], ergs=g["imm0"])
    if op == OP_RET:
        return isa.Ret(panic=bool(f["modifier"] & 1))
    if op == OP_RETDATA:
        return isa.RetData(panic=bool(f["modifier"] & 1),
                           data_start=s0(), data_len=s1())
    if op == OP_PRECOMPILE:
        addr_op = s1()
        assert addr_op.kind == "imm", "precompile address must be immediate"
        return isa.Precompile(addr_op.value, s0(), f["d0"],
                              data_words=f["target"])
    if op == OP_FARCALL:
        return isa.FarCall(s0(), g["handler"])
    if op == OP_FARCALLDATA:
        if f["ma"] == MODE_REG:
            clen = isa.reg(f["ra"])
        else:
            clen = isa.imm(int(words[f["target"]]))
        return isa.FarCallData(s0(), g["handler"],
                               calldata_start=s1(), calldata_len=clen)
    if op == OP_PTRREAD:
        return isa.PtrRead(f["r0"], s1(), f["d0"])
    if op == OP_PTRADD:
        return isa.PtrAdd(f["r0"], s1(), f["d0"])
    if op == OP_PTRSHRINK:
        return isa.PtrShrink(f["r0"], s1(), f["d0"])
    if op == OP_PTRPACK:
        return isa.PtrPack(f["r0"], s1(), f["d0"])
    if op == OP_CONTEXT:
        return isa.Context(f["modifier"], f["d0"])
    raise EncodingError(f"unknown opcode {op}")


INSTR_PER_WORD = 2  # 128-bit instructions, 32-byte code words


def assemble(instructions: Sequence[isa.Instruction]) -> List[int]:
    """Instructions -> 256-bit bytecode words (instruction region +
    constant pool, zero-slot terminated, padded to an ODD word count)."""
    pool = _Pool()
    halves: List[Tuple[int, int]] = [encode_instruction(i, pool)
                                     for i in instructions]
    n_slots = len(halves) + 1  # explicit INVALID terminator slot
    n_code_words = -(-n_slots // INSTR_PER_WORD)
    pool_base = n_code_words  # pool words start right after the code region

    # rebase pool-local indices to absolute word indices
    rebased: List[Tuple[int, int]] = []
    for (lo, hi), instr in zip(halves, instructions):
        f, g = _unpack_lo(lo), _unpack_hi(hi)
        if f["m0"] == MODE_POOL:
            hi = (hi & ~0xFFFFFFFF) | (g["imm0"] + pool_base)
        if f["m1"] == MODE_POOL:
            imm1 = g["imm1"] + pool_base
            assert imm1 < _IMM1_MAX, "pool index overflows imm1"
            hi = (hi & ~(0xFFFF << 32)) | (imm1 << 32)
        if f["opcode"] == OP_FARCALLDATA and f["ma"] == MODE_POOL:
            tgt = f["target"] + pool_base
            assert tgt < _TARGET_MAX, "pool index overflows target"
            lo = (lo & ~(0xFFFF << 38)) | (tgt << 38)
        rebased.append((lo, hi))
    rebased.append((0, 0))  # terminator

    words: List[int] = []
    for i in range(0, len(rebased), INSTR_PER_WORD):
        chunk = rebased[i:i + INSTR_PER_WORD]
        w = 0
        for k, (lo, hi) in enumerate(chunk):
            w |= (lo | (hi << 64)) << (128 * k)
        words.append(w)
    words.extend(pool.values)
    if len(words) % 2 == 0:
        words.append(0)  # odd-length rule
    return words


def disassemble(words: Sequence[int]) -> List[isa.Instruction]:
    """Bytecode words -> executable instruction list. Decoding stops at the
    INVALID terminator; every later slot (terminator, pool constants, pad)
    becomes an explicit Invalid so jumping into padding or the pool panics
    on execution (EraVM zero-padding semantics) instead of decoding
    arbitrary constants."""
    out: List[isa.Instruction] = []
    done = False
    for w in words:
        for k in range(INSTR_PER_WORD):
            if done:
                out.append(isa.Invalid())
                continue
            half = (int(w) >> (128 * k)) & ((1 << 128) - 1)
            lo, hi = half & ((1 << 64) - 1), half >> 64
            if lo == 0 and hi == 0:
                done = True
                out.append(isa.Invalid())
                continue
            out.append(decode_instruction(lo, hi, words))
    return out
