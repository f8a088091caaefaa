"""MainVM circuit (type 1, stage A): per-cycle transition proofs from the
traced block — decode binding, add/sub register semantics, control flow,
and log/memory side-effect accumulators."""

import dataclasses as dc

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import main_vm_circuit as mvc
from zkevm_harness_tpu.circuits.types import testing_geometry
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover import satisfy
from zkevm_harness_tpu.vm import isa
from zkevm_harness_tpu.vm.environment import (DefaultPrecompilesProcessor,
                                              InMemoryEventSink,
                                              InMemoryStorage,
                                              SimpleDecommitter, SimpleMemory)
from zkevm_harness_tpu.vm.interpreter import run_vm
from zkevm_harness_tpu.vm.state import (BlockProperties, ProvingToolset,
                                        create_vm)
from zkevm_harness_tpu.witness import main_vm as wmv
from zkevm_harness_tpu.witness.tracer import WitnessTracer

I = isa.imm
R = isa.reg

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)
GEO = mvc.VmGeometry(log_n=8, limb_bits=8, num_limbs=16)  # u128 regs

BLOCK = [
    isa.BinOp("add", I(40), I(2), dst=1),        # r1 = 42
    isa.BinOp("sub", R(1), I(42), dst=2),        # r2 = 0, eq flag set
    isa.JumpIfEq(target=4),                      # taken
    isa.Nop(),                                   # skipped
    isa.BinOp("add", R(1), R(1), dst=3),         # r3 = 84
    isa.StorageWrite(I(7), R(3)),                # log write
    isa.StorageRead(I(7), 4),                    # r4 = 84 (oracle read)
    isa.HeapWrite(I(0), R(4)),                   # memory write
    isa.HeapRead(I(0), 5),                       # r5 = 84
    isa.Event(I(2), R(5)),                       # event log
    isa.BinOp("sub", R(5), R(3), dst=6),         # r6 = 0, eq set
    isa.Jump(target=12),
    isa.Ret(),                                   # ext row
]


@pytest.fixture(scope="module")
def rig():
    tracer = WitnessTracer(5)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    run_vm(vm, BLOCK, 100)
    assert vm.finished
    art = wmv.compute_main_vm_artifacts(tracer, GEO, capacity=len(BLOCK))
    assert len(art.instances) == 1
    inst = art.instances[0]
    ir = mvc.main_vm_ir(GEO)
    setup = mvc.main_vm_setup(ir, GEO, CFG)
    W = mvc.main_vm_witness(ir, GEO, inst)
    return dict(tracer=tracer, art=art, inst=inst, ir=ir, setup=setup, W=W)


def test_rows_decode_the_block(rig):
    rows = rig["inst"].rows
    assert [r.op for r in rows] == [
        mvc.OP_ADD, mvc.OP_SUB, mvc.OP_JEQ, mvc.OP_ADD, mvc.OP_STOW,
        mvc.OP_STOR, mvc.OP_HEAPW, mvc.OP_HEAPR, mvc.OP_EVT, mvc.OP_SUB,
        mvc.OP_JUMP, mvc.OP_HALT]
    assert rows[3].pc == 4          # the JumpIfEq was taken over the Nop
    assert rows[5].res == 84        # storage read bound to the traced value
    assert rows[7].res == 84        # heap read bound to the traced value


def test_witness_satisfies(rig):
    inst, ir, W = rig["inst"], rig["ir"], rig["W"]
    Wint = np.asarray(W.lo, dtype=object) + \
        (np.asarray(W.hi, dtype=object) << 32)
    pis = mvc.expected_public_inputs(GEO, inst)
    violations = satisfy.check_satisfied(
        ir, Wint, mvc._const_rows(GEO).T,
        pk.identity_permutation(ir.num_witness, GEO.n), pis)
    assert violations == [], violations[:8]


def test_proves_and_verifies(rig):
    proof = pk.prove(rig["ir"], rig["setup"], rig["W"], CFG)
    expected = mvc.expected_public_inputs(GEO, rig["inst"])
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected]
    assert pk.verify(rig["ir"], rig["setup"].vk(), proof, CFG)
    # tampered exit-pc PI must be rejected (PI order: ch, 4 gammas, 4
    # accumulator in/out pairs, depth in/out, pc in/out at 15/16, ...)
    pis = list(proof.public_inputs)
    pis[16] = (int(pis[16]) + 1) % pk.gl.P
    bad = dc.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(rig["ir"], rig["setup"].vk(), bad, CFG)


def test_forged_storage_read_changes_log_accumulator(rig):
    """Claiming a different read value changes the log fingerprint, so the
    proof cannot match the oracle-recomputed PI."""
    inst = rig["inst"]
    rows = [dc.replace(r) for r in inst.rows]
    rows[5] = dc.replace(rows[5], res=85)
    forged = dc.replace(inst, rows=rows)
    assert wmv.replay_accumulators(GEO, forged)[1] != \
        wmv.replay_accumulators(GEO, inst)[1]


def test_multi_instance_accumulators_chain():
    tracer = WitnessTracer(5)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    run_vm(vm, BLOCK, 100)
    art = wmv.compute_main_vm_artifacts(tracer, GEO, capacity=5)
    assert len(art.instances) == 3
    for a, b in zip(art.instances, art.instances[1:]):
        assert a.acc_out == b.acc_in
        assert a.exit_pc == b.rows[0].pc
        assert a.exit_regs == b.rows[0].regs
    assert art.instances[-1].acc_out == art.final_accs


# ---------------------------------------------------------------------------
# Stage B: near-call/ret stack argument
# ---------------------------------------------------------------------------

CALL_BLOCK = [
    isa.BinOp("add", I(1), I(2), dst=1),         # 0: r1 = 3
    isa.NearCall(target=5, exception_handler=4), # 1: push (ret_pc=2)
    isa.BinOp("add", R(2), I(0), dst=3),         # 2: resume: r3 = r2
    isa.Ret(),                                   # 3: root ret (EXT)
    isa.Ret(panic=True),                         # 4: handler (unused)
    isa.BinOp("add", R(1), I(10), dst=2),        # 5: callee: r2 = 13
    isa.NearCall(target=8, exception_handler=7), # 6: nested push
    isa.Ret(),                                   # 7: resume: near ret
    isa.Ret(),                                   # 8: inner: near ret
]


def _trace(block, cycle_limit=100):
    tracer = WitnessTracer(5)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    run_vm(vm, block, cycle_limit)
    assert vm.finished
    return tracer


@pytest.fixture(scope="module")
def call_rig():
    tracer = _trace(CALL_BLOCK)
    art = wmv.compute_main_vm_artifacts(tracer, GEO, capacity=GEO.n)
    inst = art.instances[0]
    ir = mvc.main_vm_ir(GEO)
    setup = mvc.main_vm_setup(ir, GEO, CFG)
    W = mvc.main_vm_witness(ir, GEO, inst)
    return dict(art=art, inst=inst, ir=ir, setup=setup, W=W)


def test_near_call_rows_and_depth(call_rig):
    rows = call_rig["inst"].rows
    ops = [r.op for r in rows]
    assert ops == [mvc.OP_ADD, mvc.OP_NCALL, mvc.OP_ADD, mvc.OP_NCALL,
                   mvc.OP_RET, mvc.OP_RET, mvc.OP_ADD, mvc.OP_HALT]
    assert [r.depth for r in rows] == [0, 0, 1, 1, 2, 1, 0, 0]
    # returns restored the pushed return points
    assert rows[4].pop_ret_pc == 7 and rows[5].pop_ret_pc == 2
    # the block is balanced: stack accumulator back to its seed
    assert call_rig["art"].final_accs[3] == 1
    assert call_rig["inst"].depth_out == 0


def test_near_call_block_satisfies_and_proves(call_rig):
    inst, ir, W = call_rig["inst"], call_rig["ir"], call_rig["W"]
    Wint = np.asarray(W.lo, dtype=object) + \
        (np.asarray(W.hi, dtype=object) << 32)
    pis = mvc.expected_public_inputs(GEO, inst)
    violations = satisfy.check_satisfied(
        ir, Wint, mvc._const_rows(GEO).T,
        pk.identity_permutation(ir.num_witness, GEO.n), pis)
    assert violations == [], violations[:8]
    proof = pk.prove(ir, call_rig["setup"], W, CFG)
    assert pk.verify(ir, call_rig["setup"].vk(), proof, CFG)


def test_forged_return_pc_unsatisfiable(call_rig):
    """A RET that resumes at the wrong pc cannot satisfy the stack unfold:
    the pinned pc_next diverges from the tuple the NCALL folded."""
    inst, ir = call_rig["inst"], call_rig["ir"]
    rows = [dc.replace(r) for r in inst.rows]
    # claim the outer ret resumed at pc 3 instead of the pushed 2
    rows[5] = dc.replace(rows[5], pop_ret_pc=3)
    forged = dc.replace(inst, rows=rows)
    W = mvc.main_vm_witness(ir, GEO, forged)
    Wint = np.asarray(W.lo, dtype=object) + \
        (np.asarray(W.hi, dtype=object) << 32)
    pis = mvc.expected_public_inputs(GEO, forged)
    violations = satisfy.check_satisfied(
        ir, Wint, mvc._const_rows(GEO).T,
        pk.identity_permutation(ir.num_witness, GEO.n), pis)
    assert violations, "forged return pc must violate a constraint"
    # and the honest-boundary stack PI cannot be met either: the unfold
    # of a mismatched tuple drags the accumulator off its seed
    assert wmv.replay_accumulators(GEO, forged)[3] != 1


def test_panic_ret_resumes_at_handler():
    block = [
        isa.NearCall(target=3, exception_handler=2),  # 0
        isa.Ret(),                                    # 1 (never: panic path)
        isa.Ret(),                                    # 2 handler -> root ret
        isa.Ret(panic=True),                          # 3 callee panics
    ]
    tracer = _trace(block)
    art = wmv.compute_main_vm_artifacts(tracer, GEO, capacity=GEO.n)
    rows = art.instances[0].rows
    assert [r.op for r in rows] == [mvc.OP_NCALL, mvc.OP_RETP, mvc.OP_HALT]
    assert rows[1].pop_handler == 2
    assert art.final_accs[3] == 1
    ir = mvc.main_vm_ir(GEO)
    inst = art.instances[0]
    W = mvc.main_vm_witness(ir, GEO, inst)
    Wint = np.asarray(W.lo, dtype=object) + \
        (np.asarray(W.hi, dtype=object) << 32)
    violations = satisfy.check_satisfied(
        ir, Wint, mvc._const_rows(GEO).T,
        pk.identity_permutation(ir.num_witness, GEO.n),
        mvc.expected_public_inputs(GEO, inst))
    assert violations == [], violations[:8]


def test_stack_chains_across_instances():
    tracer = _trace(CALL_BLOCK)
    art = wmv.compute_main_vm_artifacts(tracer, GEO, capacity=3)
    assert len(art.instances) == 3
    # instance 1 starts mid-call: nonzero depth and a mid-fold stack acc
    assert art.instances[1].depth_in == 1
    assert art.instances[0].acc_out == art.instances[1].acc_in
    # pops inside instance 1/2 unfold pushes from instance 0 via the
    # scalar chain (modular-inverse unfolding, no saved-stack needed)
    assert art.instances[-1].depth_out == 0
    assert art.final_accs[3] == 1


# ---------------------------------------------------------------------------
# Stage C: div semantics + single-writeback (ctx) rows
# ---------------------------------------------------------------------------

DIV_BLOCK = [
    isa.BinOp("add", I(85), I(0), dst=1),        # r1 = 85
    isa.Div(I(85), I(6), dst_quot=2, dst_rem=3),  # r2 = 14, r3 = 1
    isa.Div(R(1), R(2), dst_quot=4, dst_rem=5),   # r4 = 6, r5 = 1
    isa.Div(R(1), I(0), dst_quot=6, dst_rem=7),   # div by zero: 0,0, eq set
    isa.JumpIfEq(target=5),                       # taken (eq from div-by-0)
    isa.Context(field=0, dst=8),                  # ctx: single writeback
    isa.Ret(),
]


@pytest.fixture(scope="module")
def div_rig():
    tracer = WitnessTracer(5)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    run_vm(vm, DIV_BLOCK, 100)
    assert vm.finished
    art = wmv.compute_main_vm_artifacts(tracer, GEO,
                                        capacity=len(DIV_BLOCK))
    assert len(art.instances) == 1
    inst = art.instances[0]
    ir = mvc.main_vm_ir(GEO)
    W = mvc.main_vm_witness(ir, GEO, inst)
    const = mvc._const_rows(GEO).T
    import zkevm_harness_tpu.ops.goldilocks as gl
    pis = mvc.expected_public_inputs(GEO, inst)
    return dict(inst=inst, ir=ir, W=W, const=const, pis=pis)


def _div_viol(rig_d, W):
    import zkevm_harness_tpu.ops.goldilocks as gl
    ir = rig_d["ir"]
    perm = pk.identity_permutation(ir.num_witness, 1 << ir.log_n)
    return satisfy.check_satisfied(ir, gl.to_ints(W),
                                   np.asarray(rig_d["const"], dtype=object),
                                   perm, rig_d["pis"])


def test_div_and_ctx_rows_satisfy(div_rig):
    rows = div_rig["inst"].rows
    assert [r.op for r in rows[:6]] == [mvc.OP_ADD, mvc.OP_DIV, mvc.OP_DIV,
                                        mvc.OP_DIV, mvc.OP_JEQ, mvc.OP_CTX]
    assert rows[1].res == 14 and rows[1].rem == 1
    assert rows[3].res == 0 and rows[3].rem == 0  # div by zero
    assert _div_viol(div_rig, div_rig["W"]) == []


def test_tampered_quotient_rejected(div_rig):
    import zkevm_harness_tpu.ops.goldilocks as gl
    ir = div_rig["ir"]
    off = mvc._cols(GEO)
    Wi = gl.to_ints(div_rig["W"]).copy()
    # row 1 is the first div: bump the quotient limb AND the written
    # register so the writeback stays consistent — the mul identity must
    # still reject
    Wi[off["RES"], 1] = (int(Wi[off["RES"], 1]) + 1)
    Wi[off["REG"] + 1 * GEO.num_limbs, 2] = \
        (int(Wi[off["REG"] + 1 * GEO.num_limbs, 2]) + 1)
    perm = pk.identity_permutation(ir.num_witness, 1 << ir.log_n)
    viol = satisfy.check_satisfied(ir, Wi,
                                   np.asarray(div_rig["const"], dtype=object),
                                   perm, div_rig["pis"])
    assert viol


def test_tampered_ctx_row_untouched_register_rejected(div_rig):
    """A ctx row may write ONLY its destination: forging any other
    register's next value is unsatisfiable (the old EXT hole, closed)."""
    import zkevm_harness_tpu.ops.goldilocks as gl
    ir = div_rig["ir"]
    off = mvc._cols(GEO)
    Wi = gl.to_ints(div_rig["W"]).copy()
    # ctx row is index 5; forge r2's value entering row 6
    Wi[off["REG"] + 1 * GEO.num_limbs, 6] = \
        (int(Wi[off["REG"] + 1 * GEO.num_limbs, 6]) + 1)
    perm = pk.identity_permutation(ir.num_witness, 1 << ir.log_n)
    viol = satisfy.check_satisfied(ir, Wi,
                                   np.asarray(div_rig["const"], dtype=object),
                                   perm, div_rig["pis"])
    assert viol


def test_div_remainder_bound_rejected(div_rig):
    """Claiming q-1, r+divisor (a valid mul identity with r >= divisor)
    must fail the remainder-compare chain."""
    tracer = WitnessTracer(5)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    run_vm(vm, DIV_BLOCK, 100)
    art = wmv.compute_main_vm_artifacts(tracer, GEO,
                                        capacity=len(DIV_BLOCK))
    inst = art.instances[0]
    # forge the witness: row 1 claims (q-1, r+6) for 85 / 6
    row = inst.rows[1]
    forged = dc.replace(row, res=13, rem=7)
    inst.rows[1] = forged
    ir = mvc.main_vm_ir(GEO)
    with pytest.raises(AssertionError):
        # witness generation itself enforces r < divisor; a prover forging
        # past it hits the in-circuit compare (covered by construction:
        # DCAR final borrow cannot be zero when r >= divisor)
        mvc.main_vm_witness(ir, GEO, inst)


# ---------------------------------------------------------------------------
# Stage C: fat-pointer ops + pointer-tag register file
# ---------------------------------------------------------------------------

GEO256 = mvc.VmGeometry(log_n=8, limb_bits=8, num_limbs=32)  # full u256

PTR_CALLEE = [
    isa.PtrAdd(ptr=1, delta=I(1), dst=2),      # advance calldata ptr
    isa.PtrRead(ptr=2, offset=I(0), dst=3),    # reads 43 (mem-bound row)
    isa.PtrRead(ptr=2, offset=I(9), dst=6),    # OUT OF BOUNDS -> 0
    isa.PtrShrink(ptr=2, delta=I(1), dst=4),   # shrink to len 0
    isa.PtrPack(ptr=2, high=I(7 << 128), dst=5),
    isa.Ret(),
]
PTR_BLOCK = [
    isa.HeapWrite(I(5), I(41)),
    isa.HeapWrite(I(6), I(43)),
    isa.FarCallData(I(0xBB), exception_handler=4,
                    calldata_start=I(5), calldata_len=I(2)),
    isa.Ret(),
    isa.Ret(),  # handler
]


@pytest.fixture(scope="module")
def ptr_rig():
    from zkevm_harness_tpu.vm.interpreter import deploy_contract
    tracer = WitnessTracer(5)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    deploy_contract(tools, 0xBB, PTR_CALLEE)
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    run_vm(vm, PTR_BLOCK, 100)
    assert vm.finished
    art = wmv.compute_main_vm_artifacts(tracer, GEO256, capacity=64)
    inst = art.instances[0]
    ir = mvc.main_vm_ir(GEO256)
    W = mvc.main_vm_witness(ir, GEO256, inst)
    const = mvc._const_rows(GEO256).T
    pis = mvc.expected_public_inputs(GEO256, inst)
    return dict(inst=inst, ir=ir, W=W, const=const, pis=pis)


def _ptr_viol(rig_d, Wi):
    ir = rig_d["ir"]
    perm = pk.identity_permutation(ir.num_witness, 1 << ir.log_n)
    return satisfy.check_satisfied(ir, Wi,
                                   np.asarray(rig_d["const"], dtype=object),
                                   perm, rig_d["pis"])


def test_ptr_ops_satisfy(ptr_rig):
    import zkevm_harness_tpu.ops.goldilocks as gl
    ops = [r.op for r in ptr_rig["inst"].rows]
    assert mvc.OP_PADD in ops and mvc.OP_PSHR in ops and mvc.OP_PPACK in ops
    assert mvc.OP_PREAD in ops  # the PtrRead row (stage F: mem-bound)
    assert _ptr_viol(ptr_rig, gl.to_ints(ptr_rig["W"])) == []
    # stage F: the PtrRead's VALUE is bound through the memory fingerprint
    # (page + start+offset + value folded into AM), not just the register
    rd = next(r for r in ptr_rig["inst"].rows if r.op == mvc.OP_PREAD)
    assert rd.res == 43


def test_ptr_tamper_length_rejected(ptr_rig):
    """Forging the PtrAdd result's length segment breaks the borrow chain."""
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO256)
    rows = ptr_rig["inst"].rows
    r_idx = next(i for i, r in enumerate(rows) if r.op == mvc.OP_PADD)
    Wi = gl.to_ints(ptr_rig["W"]).copy()
    Wi[off["RES"], r_idx] = (int(Wi[off["RES"], r_idx]) + 1)
    assert _ptr_viol(ptr_rig, Wi)


def test_ptr_tamper_tag_rejected(ptr_rig):
    """Claiming a non-pointer source register is tagged fails booleanity/
    writeback; clearing the true tag fails the source check."""
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO256)
    rows = ptr_rig["inst"].rows
    r_idx = next(i for i, r in enumerate(rows) if r.op == mvc.OP_PADD)
    Wi = gl.to_ints(ptr_rig["W"]).copy()
    # clear the source pointer tag (r1) on the PADD row
    assert int(Wi[off["PTRB"] + 0, r_idx]) == 1
    Wi[off["PTRB"] + 0, r_idx] = 0
    assert _ptr_viol(ptr_rig, Wi)


# ---------------------------------------------------------------------------
# Stage D: mul / bitwise / shifts in-gates (the last ALU EXT rows closed)
# ---------------------------------------------------------------------------

ALU_BLOCK = [
    isa.BinOp("add", I(0xF0F0), I(0x1111), dst=1),   # r1 = 0x10201
    isa.BinOp("mul", R(1), I(0x1234), dst=2),        # full-width product low
    isa.BinOp("and", R(1), I(0xFF00), dst=3),
    isa.BinOp("or", R(3), I(0x00FF), dst=4),
    isa.BinOp("xor", R(4), R(1), dst=5),
    isa.BinOp("shl", R(1), I(37), dst=6),            # cross-limb shift
    isa.BinOp("shr", R(6), I(21), dst=7),
    isa.BinOp("shl", R(1), I(0), dst=8),             # s = 0 edge
    isa.BinOp("shr", R(1), I(120), dst=9),           # drops everything low
    isa.BinOp("mul", R(6), R(6), dst=10),            # high half discarded
    isa.BinOp("xor", R(10), R(10), dst=11),          # zero result: eq set
    isa.JumpIfEq(target=13),
    isa.Nop(),                                       # skipped
    isa.Ret(),
]


@pytest.fixture(scope="module")
def alu_rig():
    tracer = WitnessTracer(5)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    run_vm(vm, ALU_BLOCK, 100)
    assert vm.finished
    art = wmv.compute_main_vm_artifacts(tracer, GEO, capacity=len(ALU_BLOCK))
    inst = art.instances[0]
    ir = mvc.main_vm_ir(GEO)
    W = mvc.main_vm_witness(ir, GEO, inst)
    const = mvc._const_rows(GEO).T
    pis = mvc.expected_public_inputs(GEO, inst)
    return dict(inst=inst, ir=ir, W=W, const=const, pis=pis)


def _alu_viol(rig_d, Wi):
    ir = rig_d["ir"]
    perm = pk.identity_permutation(ir.num_witness, 1 << ir.log_n)
    return satisfy.check_satisfied(ir, Wi,
                                   np.asarray(rig_d["const"], dtype=object),
                                   perm, rig_d["pis"])


def test_alu_stage_d_rows_satisfy(alu_rig):
    import zkevm_harness_tpu.ops.goldilocks as gl
    rows = alu_rig["inst"].rows
    ops = [r.op for r in rows[:11]]
    assert ops == [mvc.OP_ADD, mvc.OP_MUL, mvc.OP_AND, mvc.OP_OR,
                   mvc.OP_XOR, mvc.OP_SHL, mvc.OP_SHR, mvc.OP_SHL,
                   mvc.OP_SHR, mvc.OP_MUL, mvc.OP_XOR]
    # interpreter semantics reproduced by the decomposer
    assert rows[1].res == (0x10201 * 0x1234)
    assert rows[5].res == 0x10201 << 37
    assert rows[6].res == (0x10201 << 37) >> 21
    assert rows[10].res == 0
    assert _alu_viol(alu_rig, gl.to_ints(alu_rig["W"])) == []


def test_tampered_mul_low_limb_rejected(alu_rig):
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO)
    Wi = gl.to_ints(alu_rig["W"]).copy()
    # row 1 is the mul: bump the product's low limb AND the written register
    Wi[off["RES"], 1] = (int(Wi[off["RES"], 1]) + 1)
    Wi[off["REG"] + 1 * GEO.num_limbs, 2] = \
        (int(Wi[off["REG"] + 1 * GEO.num_limbs, 2]) + 1)
    assert _alu_viol(alu_rig, Wi)


def test_tampered_xor_chunk_rejected(alu_rig):
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO)
    rows = alu_rig["inst"].rows
    r_idx = next(i for i, r in enumerate(rows) if r.op == mvc.OP_XOR)
    Wi = gl.to_ints(alu_rig["W"]).copy()
    # forge the xor result limb and its chunk consistently: the (a,b,a^b)
    # LOOKUP must reject the forged triple
    Wi[off["RES"], r_idx] = int(Wi[off["RES"], r_idx]) ^ 1
    Wi[off["BX"], r_idx] = int(Wi[off["BX"], r_idx]) ^ 1
    Wi[off["REG"] + 4 * GEO.num_limbs, r_idx + 1] = \
        int(Wi[off["REG"] + 4 * GEO.num_limbs, r_idx + 1]) ^ 1
    viol = _alu_viol(alu_rig, Wi)
    assert viol


def test_tampered_shift_amount_rejected(alu_rig):
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO)
    rows = alu_rig["inst"].rows
    r_idx = next(i for i, r in enumerate(rows) if r.op == mvc.OP_SHL)
    Wi = gl.to_ints(alu_rig["W"]).copy()
    # claim a different intra-limb shift: BS one-hot moves but s-equation
    # (pinned to v1's low byte chunks) must break
    L = GEO.limb_bits
    s = 37 % L
    assert int(Wi[off["BS"] + s, r_idx]) == 1
    Wi[off["BS"] + s, r_idx] = 0
    Wi[off["BS"] + ((s + 1) % L), r_idx] = 1
    assert _alu_viol(alu_rig, Wi)


# ---------------------------------------------------------------------------
# Stage E: far-call / far-ret frame switches in-gates (the last frame EXT
# rows closed; only mid-instruction panic unwinds remain EXT)
# ---------------------------------------------------------------------------

CALLEE = [
    isa.BinOp("add", I(7), I(35), dst=3),   # r3 = 42 inside the callee
    isa.RetData(data_start=I(0), data_len=I(4)),
]

FAR_BLOCK = [
    isa.BinOp("add", I(1), I(2), dst=2),     # r2 = 3
    isa.FarCallData(address=I(0xBB), exception_handler=5,
                    calldata_start=I(0), calldata_len=I(8)),
    isa.BinOp("add", R(3), R(2), dst=4),     # resumes HERE: r4 = 45
    isa.Ret(),
]


@pytest.fixture(scope="module")
def far_rig():
    from zkevm_harness_tpu.vm.interpreter import deploy_contract
    tracer = WitnessTracer(5)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    deploy_contract(tools, 0xBB, CALLEE)
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    run_vm(vm, FAR_BLOCK, 100)
    assert vm.finished
    art = wmv.compute_main_vm_artifacts(tracer, GEO, capacity=16)
    inst = art.instances[0]
    ir = mvc.main_vm_ir(GEO)
    W = mvc.main_vm_witness(ir, GEO, inst)
    const = mvc._const_rows(GEO).T
    pis = mvc.expected_public_inputs(GEO, inst)
    return dict(inst=inst, ir=ir, W=W, const=const, pis=pis)


def _far_viol(rig_d, Wi):
    ir = rig_d["ir"]
    perm = pk.identity_permutation(ir.num_witness, 1 << ir.log_n)
    return satisfy.check_satisfied(ir, Wi,
                                   np.asarray(rig_d["const"], dtype=object),
                                   perm, rig_d["pis"])


def test_far_call_rows_satisfy(far_rig):
    import zkevm_harness_tpu.ops.goldilocks as gl
    rows = far_rig["inst"].rows
    ops = [r.op for r in rows]
    assert mvc.OP_FCALL in ops and mvc.OP_FRET in ops
    fc = ops.index(mvc.OP_FCALL)
    fr = ops.index(mvc.OP_FRET)
    # callee executes between the frame switches, at pc 0
    assert rows[fc + 1].pc == 0
    # the far ret resumed the caller past the call site
    assert rows[fr + 1].pc == 2
    # returndata fat pointer written to r1 (and its tag set next row)
    assert rows[fr].dst == 1 and rows[fr].fpop
    assert rows[fr + 1].ptrs[0]
    assert _far_viol(far_rig, gl.to_ints(far_rig["W"])) == []


def test_far_ret_wrong_resume_pc_rejected(far_rig):
    """A far RET resuming at the wrong pc cannot satisfy the stack unfold:
    the popped tuple no longer cancels the far push."""
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO)
    rows = far_rig["inst"].rows
    fr = next(i for i, r in enumerate(rows) if r.op == mvc.OP_FRET)
    Wi = gl.to_ints(far_rig["W"]).copy()
    Wi[off["RPC"], fr] = int(Wi[off["RPC"], fr]) + 1
    assert _far_viol(far_rig, Wi)


def test_far_tag_lane_blocks_cross_matching(far_rig):
    """Claiming the far pop as a NEAR pop (clearing FPOP, setting SPOP)
    breaks the accumulator: the pushed tuple carries the FAR tag lane."""
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO)
    rows = far_rig["inst"].rows
    fr = next(i for i, r in enumerate(rows) if r.op == mvc.OP_FRET)
    Wi = gl.to_ints(far_rig["W"]).copy()
    Wi[off["FPOP"], fr] = 0
    Wi[off["SPOP"], fr] = 1
    assert _far_viol(far_rig, Wi)


def test_far_call_forged_register_rejected(far_rig):
    """Registers other than the r1 fat pointer are PRESERVED across the
    frame switch — the old EXT free-for-all is gone."""
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO)
    rows = far_rig["inst"].rows
    fc = next(i for i, r in enumerate(rows) if r.op == mvc.OP_FCALL)
    Wi = gl.to_ints(far_rig["W"]).copy()
    # forge r2's first limb on the row AFTER the far call
    col = off["REG"] + 1 * GEO.num_limbs
    Wi[col, fc + 1] = (int(Wi[col, fc + 1]) + 1)
    assert _far_viol(far_rig, Wi)


def test_pread_forged_value_breaks_mem_fingerprint(ptr_rig):
    """Forging the PtrRead value (both RES and the register update) now
    breaks the MEMORY fingerprint fold — the old CTX hole is closed."""
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO256)
    rows = ptr_rig["inst"].rows
    r_idx = next(i for i, r in enumerate(rows) if r.op == mvc.OP_PREAD)
    Wi = gl.to_ints(ptr_rig["W"]).copy()
    NL = GEO256.num_limbs
    Wi[off["RES"], r_idx] = (int(Wi[off["RES"], r_idx]) + 1)
    Wi[off["REG"] + (rows[r_idx].dst - 1) * NL, r_idx + 1] = \
        (int(Wi[off["REG"] + (rows[r_idx].dst - 1) * NL, r_idx + 1]) + 1)
    assert _ptr_viol(ptr_rig, Wi)


# ---------------------------------------------------------------------------
# Stage G: mid-instruction panic unwinds in-gates (the last EXT rows closed;
# OP_EXT now matches no decoder path for executable instructions)
# ---------------------------------------------------------------------------

PANIC_BLOCK = [
    isa.BinOp("add", I(5), I(6), dst=3),           # 0: r3 = 11 (NOT a pointer)
    isa.NearCall(target=4, exception_handler=3),   # 1
    isa.BinOp("add", R(3), I(1), dst=4),           # 2 (never reached)
    isa.Ret(),                                     # 3: handler -> root ret
    isa.PtrAdd(ptr=3, delta=I(1), dst=5),          # 4: SoftPanic (untagged src)
    isa.Ret(),                                     # 5 (never)
]


@pytest.fixture(scope="module")
def panic_rig():
    tracer = _trace(PANIC_BLOCK)
    art = wmv.compute_main_vm_artifacts(tracer, GEO, capacity=GEO.n)
    inst = art.instances[0]
    ir = mvc.main_vm_ir(GEO)
    W = mvc.main_vm_witness(ir, GEO, inst)
    const = mvc._const_rows(GEO).T
    pis = mvc.expected_public_inputs(GEO, inst)
    return dict(art=art, inst=inst, ir=ir, W=W, const=const, pis=pis)


def _panic_viol(rig_d, Wi):
    ir = rig_d["ir"]
    perm = pk.identity_permutation(ir.num_witness, 1 << ir.log_n)
    return satisfy.check_satisfied(ir, Wi,
                                   np.asarray(rig_d["const"], dtype=object),
                                   perm, rig_d["pis"])


def test_panic_unwind_rows_satisfy(panic_rig):
    import zkevm_harness_tpu.ops.goldilocks as gl
    rows = panic_rig["inst"].rows
    ops = [r.op for r in rows]
    # add, ncall, panic (at the PtrAdd cycle), handler ret = root halt
    assert ops == [mvc.OP_ADD, mvc.OP_NCALL, mvc.OP_PANIC, mvc.OP_HALT]
    pr = rows[2]
    assert pr.spop and not pr.fpop and pr.pop_handler == 3
    # the unwind resumed the parent at the handler
    assert rows[3].pc == 3
    # registers preserved across the unwind (r3 still 11, r5 never written)
    assert rows[3].regs[2] == 11 and rows[3].regs[4] == 0
    # the block is stack-balanced
    assert panic_rig["art"].final_accs[3] == 1
    assert _panic_viol(panic_rig, gl.to_ints(panic_rig["W"])) == []


def test_panic_wrong_resume_pc_rejected(panic_rig):
    """Claiming the panic resumed anywhere but the popped handler breaks
    either the pinned pc' gate or the stack-unfold/balance argument."""
    inst, ir = panic_rig["inst"], panic_rig["ir"]
    rows = [dc.replace(r) for r in inst.rows]
    rows[2] = dc.replace(rows[2], pop_handler=4)
    forged = dc.replace(inst, rows=rows)
    W = mvc.main_vm_witness(ir, GEO, forged)
    Wi = np.asarray(W.lo, dtype=object) + (np.asarray(W.hi, dtype=object) << 32)
    viol = satisfy.check_satisfied(
        ir, Wi, np.asarray(panic_rig["const"], dtype=object),
        pk.identity_permutation(ir.num_witness, 1 << ir.log_n),
        mvc.expected_public_inputs(GEO, forged))
    assert viol or wmv.replay_accumulators(GEO, forged)[3] != 1


def test_panic_forged_register_rejected(panic_rig):
    """A panic row writes NO register: forging any register's next value
    (the old EXT escape hatch) is now unsatisfiable."""
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO)
    Wi = gl.to_ints(panic_rig["W"]).copy()
    NL = GEO.num_limbs
    # forge r5's value entering the row after the panic
    Wi[off["REG"] + 4 * NL, 3] = (int(Wi[off["REG"] + 4 * NL, 3]) + 1)
    assert _panic_viol(panic_rig, Wi)


def test_panic_selected_destination_rejected(panic_rig):
    """Selecting a writeback destination on a panic row violates the
    stage-G no-destination gate even if the write itself is consistent."""
    import zkevm_harness_tpu.ops.goldilocks as gl
    off = mvc._cols(GEO)
    Wi = gl.to_ints(panic_rig["W"]).copy()
    NL = GEO.num_limbs
    Wi[off["DST"] + 4, 2] = 1  # dst = r5 on the panic row
    # make the write self-consistent: RES limbs already equal r5 (= 0)?
    # keep RES as-is; forge the register to match RES so only the
    # no-destination gate can reject
    for j in range(NL):
        Wi[off["REG"] + 4 * NL + j, 3] = int(Wi[off["RES"] + j, 2])
    assert _panic_viol(panic_rig, Wi)
