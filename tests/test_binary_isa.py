"""Binary ISA: encode/decode round-trips + the opcode semantics the
reference's simple_tests exercise (ptr_add.rs, context.rs, kernel_ops.rs,
memory_growth.rs, limited_ergs.rs invalid/panic cases).

Code here is REAL bytecode: deploy_contract assembles to 256-bit words,
the decommitter hashes them, execution decodes the decommitted words.
"""

import pytest

from zkevm_harness_tpu.vm import encoding, isa
from zkevm_harness_tpu.vm.interpreter import (VmPanic, deploy_contract,
                                              pack_fat_pointer, run_vm)
from tests.test_vm import I, R, make_vm


ALL_KINDS = [
    isa.Nop(),
    isa.BinOp("add", R(1), I(7), 2),
    isa.BinOp("xor", R(3), R(4), 5),
    isa.BinOp("shl", I(1), I(255), 6),
    isa.Div(R(1), I(3), 2, 3),
    isa.Jump(17),
    isa.JumpIfEq(3),
    isa.HeapWrite(I(5), R(2)),
    isa.HeapRead(R(3), 4),
    isa.StorageWrite(I(2**200), R(1)),          # big imm -> constant pool
    isa.StorageRead(I(0xFFFF_FFFF), 7),          # 32-bit imm fits inline
    isa.Event(I(1), I(2**130), to_l1=False),     # big src1 imm -> pool
    isa.Event(R(1), R(2), to_l1=True),
    isa.NearCall(target=9, exception_handler=3, ergs=1000),
    isa.Ret(),
    isa.Ret(panic=True),
    isa.RetData(data_start=I(0), data_len=I(4)),
    isa.Precompile(0x8010, R(1), 2, data_words=4),
    isa.FarCall(I(0xBB), exception_handler=2),
    isa.FarCallData(I(0xBB), 2, calldata_start=I(5), calldata_len=I(1)),
    isa.FarCallData(R(1), 2, calldata_start=R(2), calldata_len=R(3)),
    isa.FarCallData(I(0xBB), 2, calldata_start=I(2**40),
                    calldata_len=I(2**33)),      # both spill to the pool
    isa.PtrRead(1, I(0), 4),
    isa.PtrAdd(1, I(2), 2),
    isa.PtrShrink(2, R(3), 2),
    isa.PtrPack(1, I(5 << 128), 2),
    isa.Context(encoding.CTX_ERGS_LEFT, 8),
    isa.Context(encoding.CTX_META, 9),
]


def test_roundtrip_every_instruction_kind():
    words = encoding.assemble(ALL_KINDS)
    back = encoding.disassemble(words)
    assert back[:len(ALL_KINDS)] == ALL_KINDS
    # everything after the instruction region decodes as Invalid (padding,
    # terminator, constant pool)
    assert all(isinstance(i, isa.Invalid) for i in back[len(ALL_KINDS):])


def test_bytecode_layout_rules():
    words = encoding.assemble(ALL_KINDS)
    # odd word count (EraVM versioned-hash rule)
    assert len(words) % 2 == 1
    # every word fits 256 bits
    assert all(0 <= w < (1 << 256) for w in words)
    # constant pool dedups repeated big constants
    prog = [isa.StorageWrite(I(2**200), R(1)),
            isa.StorageWrite(I(2**200), R(2)),
            isa.StorageWrite(I(2**201), R(3))]
    w1 = encoding.assemble(prog)
    n_instr_words = -(-(len(prog) + 1) // encoding.INSTR_PER_WORD)
    pool = [w for w in w1[n_instr_words:] if w]
    assert sorted(pool) == [2**200, 2**201]


def test_roundtrip_preserves_hash_determinism():
    from zkevm_harness_tpu.witness.decommitter import bytecode_hash
    h1 = bytecode_hash(encoding.assemble(ALL_KINDS))
    h2 = bytecode_hash(encoding.assemble(list(ALL_KINDS)))
    assert h1 == h2
    h3 = bytecode_hash(encoding.assemble(ALL_KINDS[:-1]))
    assert h1 != h3


def test_executed_code_is_the_decommitted_bytecode():
    # the callee's behavior must come from decode(assemble(...)), including
    # a pool-spilled 256-bit immediate
    big = 2**222 + 17
    callee = [isa.StorageWrite(I(3), I(big)), isa.Ret()]
    code = [isa.FarCall(I(0xBB), 2), isa.Ret(), isa.Ret()]
    vm, tracer, tools = make_vm()
    deploy_contract(tools, 0xBB, callee)
    run_vm(vm, code, 100)
    assert vm.finished
    assert tools.storage.read(0, 0xBB, 3) == big


def test_invalid_opcode_panics_to_handler():
    # jumping past the code lands on the zero-padded INVALID slot; inside a
    # near-call frame that panics to the handler, not the process
    code = [
        isa.NearCall(target=3, exception_handler=2, ergs=100),  # 0
        isa.Ret(),                                              # 1 (resume)
        isa.Ret(),                                              # 2 handler
        isa.Jump(40),                                           # 3 -> invalid
    ]
    vm, tracer, tools = make_vm()
    with pytest.raises(AssertionError):
        # beyond the decoded region entirely: pc out of code
        run_vm(vm, code, 100)

    code2 = [
        isa.BinOp("add", I(0), I(0), 1),
        isa.NearCall(target=4, exception_handler=2, ergs=100),
        isa.BinOp("add", I(1), I(1), 5),   # handler: r5 = 2
        isa.Ret(),
        # pc 4: one slot before the terminator in the same code word pair
        isa.Jump(5),                       # 5 is the INVALID terminator slot
    ]
    vm2, _, _ = make_vm()
    run_vm(vm2, code2, 100)
    assert vm2.finished
    assert vm2.reg_read(5).value == 2  # handler ran after the invalid panic


def test_div_semantics():
    code = [
        isa.Div(I(43), I(5), 1, 2),   # q=8 r=3
        isa.Div(R(1), I(0), 3, 4),    # div by zero -> zeros + eq flag
        isa.JumpIfEq(4),
        isa.Ret(panic=True),
        isa.Ret(),
    ]
    vm, _, _ = make_vm()
    run_vm(vm, code, 100)
    assert vm.finished
    assert vm.reg_read(1).value == 8 and vm.reg_read(2).value == 3
    assert vm.reg_read(3).value == 0 and vm.reg_read(4).value == 0


def test_context_fields():
    code = [
        isa.Context(encoding.CTX_THIS, 1),
        isa.Context(encoding.CTX_SENDER, 2),
        isa.Context(encoding.CTX_ERGS_LEFT, 3),
        isa.Context(encoding.CTX_META, 4),
        isa.Ret(),
    ]
    vm, _, _ = make_vm()
    run_vm(vm, code, 100)
    assert vm.reg_read(1).value == 0xAA
    assert vm.reg_read(2).value == 0
    assert vm.reg_read(3).value > 0
    assert (vm.reg_read(4).value >> 96) & 1 == 1  # root frame is kernel


def test_ptr_add_shrink_pack():
    ptr = pack_fat_pointer(page=7, start=10, length=6)
    vm, _, _ = make_vm()
    vm.reg_write(1, ptr, is_pointer=True)
    vm.tools.memory.write(7, 12, 999)
    code = [
        isa.PtrAdd(1, I(2), 2),        # start 12, len 4
        isa.PtrRead(2, I(0), 3),       # reads page 7 word 12 -> 999
        isa.PtrShrink(2, I(3), 4),     # len 1
        isa.PtrRead(4, I(1), 5),       # out of bounds -> 0
        isa.PtrPack(2, I(5 << 128), 6),
        isa.Ret(),
    ]
    run_vm(vm, code, 100)
    assert vm.finished
    assert vm.reg_read(3).value == 999
    assert vm.reg_read(5).value == 0
    assert vm.reg_read(6).value == (5 << 128) | pack_fat_pointer(7, 12, 4)
    assert vm.reg_read(6).is_pointer


def test_ptr_ops_panic_cases():
    # ptr_add.rs invalid cases: non-pointer source / advancing past bound —
    # each panics the frame (handler observes it), not the process
    for bad in ([isa.PtrAdd(1, I(1), 2)],           # r1 not a pointer
                [isa.PtrPack(1, I(3), 2)]):         # low bits set
        code = [
            isa.NearCall(target=4, exception_handler=2, ergs=0),  # 0
            isa.Ret(),                                            # 1
            isa.BinOp("add", I(7), I(0), 5),                      # 2 handler
            isa.Ret(),                                            # 3
        ] + bad + [isa.Ret(panic=True)]                           # 4: bad
        vm, _, _ = make_vm()
        vm.reg_write(1, pack_fat_pointer(1, 0, 4),
                     is_pointer=(bad[0].__class__ is isa.PtrPack))
        run_vm(vm, code, 100)
        assert vm.finished
        assert vm.reg_read(5).value == 7, f"handler missed for {bad}"
    # advancing past the bound
    code = [
        isa.NearCall(target=4, exception_handler=2, ergs=0),
        isa.Ret(),
        isa.BinOp("add", I(7), I(0), 5),
        isa.Ret(),
        isa.PtrAdd(1, I(99), 2),
        isa.Ret(panic=True),
    ]
    vm, _, _ = make_vm()
    vm.reg_write(1, pack_fat_pointer(1, 0, 4), is_pointer=True)
    run_vm(vm, code, 100)
    assert vm.reg_read(5).value == 7


def test_kernel_only_ops_enforced_in_strict_mode():
    # kernel_ops.rs semantics: events panic outside kernel mode. The callee
    # at a non-kernel address (>= 2^16) emits an event -> frame panic; the
    # caller's handler observes it. A kernel-space callee succeeds.
    evil = [isa.Event(I(1), I(2)), isa.Ret()]
    code = [
        isa.FarCall(I(0xBB + (1 << 16)), exception_handler=2),
        isa.Ret(),
        isa.BinOp("add", I(9), I(0), 5),   # handler: r5 = 9
        isa.Ret(),
    ]
    vm, tracer, tools = make_vm()
    deploy_contract(tools, 0xBB + (1 << 16), evil)
    run_vm(vm, code, 200, strict_kernel=True)
    assert vm.finished and vm.reg_read(5).value == 9
    evs, l1s = tools.event_sink.events_and_l1_messages()
    assert len(evs) + len(l1s) == 0  # rolled back

    good = [isa.Event(I(1), I(2)), isa.Ret()]
    code2 = [
        isa.FarCall(I(0x9001), exception_handler=2),  # kernel space
        isa.Ret(),
        isa.Ret(panic=True),
    ]
    vm2, _, tools2 = make_vm()
    deploy_contract(tools2, 0x9001, good)
    run_vm(vm2, code2, 200, strict_kernel=True)
    assert vm2.finished
    evs2, l1s2 = tools2.event_sink.events_and_l1_messages()
    assert len(evs2) == 1


def test_heap_growth_costs_ergs():
    # memory_growth.rs semantics: a frame with a tiny ergs budget cannot
    # grow the heap to a far address — it panics and rolls back
    code = [
        isa.NearCall(target=4, exception_handler=2, ergs=30),
        isa.Ret(),
        isa.BinOp("add", I(1), I(0), 5),   # handler
        isa.Ret(),
        isa.HeapWrite(I(10_000), I(1)),    # needs ~10k growth ergs
        isa.Ret(panic=True),
    ]
    vm, _, _ = make_vm()
    run_vm(vm, code, 100)
    assert vm.finished and vm.reg_read(5).value == 1
    # with enough budget the same write succeeds and later access is free
    code2 = [
        isa.Context(encoding.CTX_ERGS_LEFT, 1),
        isa.HeapWrite(I(10_000), I(7)),
        isa.Context(encoding.CTX_ERGS_LEFT, 2),
        isa.HeapRead(I(10_000), 3),
        isa.Context(encoding.CTX_ERGS_LEFT, 4),
        isa.Ret(),
    ]
    vm2, _, _ = make_vm()
    run_vm(vm2, code2, 100)
    assert vm2.reg_read(3).value == 7
    spent_grow = vm2.reg_read(1).value - vm2.reg_read(2).value
    spent_read = vm2.reg_read(2).value - vm2.reg_read(4).value
    assert spent_grow > 10_000  # growth paid once
    assert spent_read < 10      # re-access within the bound is cheap
