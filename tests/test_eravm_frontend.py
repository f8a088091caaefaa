"""EraVM bytecode front end (VERDICT r4 missing item 1, the four-round L0
gap): real 64-bit instruction-word encode/decode, the reference `.asm` test
dialect, and a reference-style asm program through trace -> prove.

Reference anchors: src/tests/run_manually.rs:24,169 (assemble + run),
src/tests/simple_tests/log.rs test_write_same_value (the asm text below is
the same program), zkevm_opcode_defs production encoding layout.
"""

import pytest

from zkevm_harness_tpu import harness
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.vm import eravm, isa

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=2, final_fri_size=8)

# the reference's test_write_same_value program (log.rs), verbatim dialect
WRITE_SAME_VALUE_ASM = r"""
        .text
        .file	"Test_26"
        .rodata.cst32
        .p2align	5
        .text
        .globl	__entry
    __entry:
    .main:
        near_call r0, @inner, @handler
        context.ergs_left r15
        ret.ok r0
    inner:
        add 10000, r0, r1
        add 1000, r0, r10
        sstore r1, r10
        sstore r1, r0
        ret.ok r0
    handler:
        ret.ok r0
"""


def test_word_roundtrip_every_variant_field():
    w = eravm.pack_instruction(37, eravm.COND_NE, src0=3, src1=14, dst0=7,
                               dst1=1, imm0=0xBEEF, imm1=0x1234)
    d = eravm.unpack_instruction(w)
    assert (d.condition, d.src0, d.src1, d.dst0, d.dst1) == \
        (eravm.COND_NE, 3, 14, 7, 1)
    assert (d.imm0, d.imm1) == (0xBEEF, 0x1234)
    assert d.variant is eravm.OPCODES_TABLE[37]
    # the layout is the production one: 2-byte variant||condition,
    # 2-byte register nibbles, two u16 immediates
    assert w & 0xFFFF == 37 | (eravm.COND_NE << 11)
    assert (w >> 16) & 0xFFFF == 3 | (14 << 4) | (7 << 8) | (1 << 12)


def test_opcodes_table_is_stable():
    """The pinned variant table (the conformance swap point): spot-pin a
    few indices so accidental enumeration changes fail loudly."""
    t = eravm.OPCODES_TABLE
    assert t[0].kind == "invalid"
    assert t[1].kind == "nop"
    add_reg = eravm._VARIANT_INDEX[("add", "", eravm.SRC_REG, False)]
    assert t[add_reg].kind == "add" and not t[add_reg].set_flags
    ret_ok = eravm._VARIANT_INDEX[("ret", "ok", eravm.SRC_REG, False)]
    assert t[ret_ok].submode == "ok"
    assert len(t) <= 2048


def test_assemble_reference_dialect():
    instr_words = eravm.assemble_text(WRITE_SAME_VALUE_ASM)
    assert len(instr_words) == 9
    # first instruction: near_call r0, @inner(=3), @handler(=8)
    d = eravm.unpack_instruction(instr_words[0])
    assert d.variant.kind == "near_call"
    assert (d.imm0, d.imm1) == (3, 8)
    # labels resolved: add 10000 -> imm mode
    d3 = eravm.unpack_instruction(instr_words[3])
    assert d3.variant.kind == "add"
    assert d3.variant.src_mode == eravm.SRC_IMM
    assert d3.imm0 == 10000 and d3.dst0 == 1


def test_code_words_odd_padding_and_decode():
    words, prog = eravm.assemble_era_program(WRITE_SAME_VALUE_ASM)
    assert len(words) % 2 == 1  # versioned-hash odd-length rule
    kinds = [type(i).__name__ for i in prog]
    assert kinds == ["NearCall", "Context", "Ret", "BinOp", "BinOp",
                     "StorageWrite", "StorageWrite", "Ret", "Ret"]
    # the raw word stream zero-terminates (padding decodes Invalid)
    stream = eravm.words_to_instructions(words)
    assert stream[9] == 0 and isinstance(
        eravm.disassemble_eravm(stream)[9], isa.Invalid)


def test_unknown_label_and_mnemonic_raise():
    with pytest.raises(eravm.EraVmEncodingError):
        eravm.assemble_text("jump @nowhere")
    with pytest.raises(eravm.EraVmEncodingError):
        eravm.assemble_text("frobnicate r1, r2")


def test_write_same_value_through_trace_and_prove():
    """The reference-style asm program runs through the FULL pipeline:
    assemble -> decode -> execute -> witness artifacts -> REAL storage
    sorter proof (the type the program exercises: two sstores of the same
    key, second writes the initial value back)."""
    from zkevm_harness_tpu.prover import layers as ly
    _words, prog = eravm.assemble_era_program(WRITE_SAME_VALUE_ASM)
    with ly.engine_override(CFG):
        blk = harness.run_block(prog, prove_mode="spot", spot_types=(9,))
    # near_call, add, add, sstore, sstore, inner ret, context, root ret
    assert blk.cycles == 8
    # both storage writes traced into the sorter (key 10000: write 1000,
    # then write 0 = the initial value back)
    assert blk.artifacts.per_circuit[9].num_instances >= 1
    rec = blk.source.get_base_layer_proof(9, 0)
    assert rec is not None and rec.get("real"), \
        "storage sorter instance must be really proven"


def test_era_and_native_programs_trace_identically():
    """The SAME logical program via the EraVM front end and via the native
    structured ISA produces identical storage/event traces (the bridge is
    semantics-preserving)."""
    _w, era_prog = eravm.assemble_era_program(WRITE_SAME_VALUE_ASM)
    I, R = isa.imm, isa.reg
    native = [
        isa.NearCall(3, 8),
        isa.Context(3, 15),
        isa.Ret(),
        isa.BinOp("add", I(10000), R(0), 1),
        isa.BinOp("add", I(1000), R(0), 10),
        isa.StorageWrite(R(1), R(10)),
        isa.StorageWrite(R(1), R(0)),
        isa.Ret(),
        isa.Ret(),
    ]
    b1 = harness.run_block(era_prog, prove_mode="dry")
    b2 = harness.run_block(native, prove_mode="dry")
    # the recursion-queue tails bind every instance's full PI stream: equal
    # tails across ALL types means the two programs traced identically
    for t in b1.artifacts.recursion_queues:
        q1 = b1.artifacts.recursion_queues[t]
        q2 = b2.artifacts.recursion_queues[t]
        assert [int(v) for v in q1.tail] == [int(v) for v in q2.tail], t
    assert b1.artifacts.per_circuit[9].num_instances >= 1


COND_LOOP_ASM = r"""
        .text
        .globl	__entry
    __entry:
    .main:
        add 5, r0, r1
        add 1, r0, r3
        add 0, r0, r2
    loop:
        add r2, r1, r2
        sub r1, r3, r1
        jump.eq @done
        jump @loop
    done:
        event r2, r0
        ret.ok r0
"""


def test_jump_eq_predicate_bridges_and_traces_identically():
    """`jump.eq` is the one EraVM predicate the MainVM circuit already
    carries in-gates (EQF column); the bridge maps it onto JumpIfEq. A
    countdown loop (5..1, accumulating 15) runs through the front end and
    traces identically to the hand-written native program."""
    _w, era_prog = eravm.assemble_era_program(COND_LOOP_ASM)
    assert any(isinstance(op, isa.JumpIfEq) for op in era_prog)
    I, R = isa.imm, isa.reg
    native = [
        isa.BinOp("add", I(5), R(0), 1),
        isa.BinOp("add", I(1), R(0), 3),
        isa.BinOp("add", I(0), R(0), 2),
        isa.BinOp("add", R(2), R(1), 2),
        isa.BinOp("sub", R(1), R(3), 1),
        isa.JumpIfEq(7),
        isa.Jump(3),
        isa.Event(R(2), R(0)),
        isa.Ret(),
    ]
    b1 = harness.run_block(era_prog, prove_mode="dry")
    b2 = harness.run_block(native, prove_mode="dry")
    # 3 prologue + 4 full iterations x4 + final iteration x3 + event + ret
    assert b1.cycles == b2.cycles == 24
    for t in b1.artifacts.recursion_queues:
        q1 = b1.artifacts.recursion_queues[t]
        q2 = b2.artifacts.recursion_queues[t]
        assert [int(v) for v in q1.tail] == [int(v) for v in q2.tail], t
    # the event sink saw the accumulated 5+4+3+2+1
    assert b1.artifacts.per_circuit[11].num_instances >= 1


def test_other_predicates_still_raise():
    w = eravm.pack_instruction(
        eravm._VARIANT_INDEX[("jump", "", eravm.SRC_IMM, False)],
        eravm.COND_LT, imm0=3)
    with pytest.raises(eravm.EraVmEncodingError, match="conditional"):
        eravm.decode_to_structured(w)
