"""MainVM circuit witness decomposer (type 1, stage A).

Parity with the reference's VmWitnessOracle + vm-instance splitting
(src/witness/oracle.rs:1164-1420): replay the tracer's per-cycle state log
into circuit row payloads (decoded instruction, operand values, results,
flag state), split at the snapshot capacity, and chain the three binding
accumulators (code / log queries / memory queries) across instances. The
decoded stream is bound challenge-after-commit; read results come from the
traced queries (the same values the RAM-permutation and log circuits
consume, which is the cross-circuit glue)."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..circuits.main_vm_circuit import (NREGS, OP_ADD, OP_AND, OP_CTX,
                                        OP_DIV, OP_EVT, OP_EVTL1, OP_EXT,
                                        OP_FCALL, OP_FRET, OP_FRETP,
                                        OP_HEAPR, OP_HEAPW, OP_JEQ, OP_JUMP,
                                        OP_MUL, OP_NCALL, OP_NOP, OP_OR,
                                        OP_HALT,
                                        OP_PADD, OP_PANIC, OP_PPACK,
                                        OP_PREAD, OP_PSHR, OP_RET,
                                        OP_RETP, OP_SHL, OP_SHR, OP_STOR,
                                        OP_STOW, OP_SUB, OP_XOR, VmGeometry)
from ..ops import goldilocks as gl
from ..vm import isa
from .tracer import WitnessTracer

P = gl.P


@dataclasses.dataclass
class VmRow:
    op: int
    pc: int
    ts: int
    regs: List[int]            # 15 values entering the row
    flags: Tuple[bool, bool]   # (eq, lt) entering the row
    dst: int = 0               # 1-based; 0 = no write
    s0_kind: Optional[str] = None   # "imm" | "reg" | None
    s0_val: int = 0
    s1_kind: Optional[str] = None
    s1_val: int = 0
    tgt: int = 0
    v0: int = 0
    v1: int = 0
    res: int = 0
    dst2: int = 0           # div remainder destination (1-based; 0 = none)
    rem: int = 0            # div remainder value
    ptrs: tuple = ()        # 15 pointer tags entering the row
    page: int = 0           # heap-query memory page (mem fingerprint lane)
    addr: int = 0           # log-query address (3 fingerprint lanes)
    handler: int = 0        # NCALL exception handler (instruction field)
    spop: bool = False      # this row pops a local frame
    fpop: bool = False      # this row pops a FAR frame (stage E)
    pop_ret_pc: int = 0     # popped frame's pushed return pc
    pop_handler: int = 0    # popped frame's exception handler
    depth: int = 0          # call-stack depth entering the row (near + far)


@dataclasses.dataclass
class VmCircuitInstance:
    index: int
    rows: List[VmRow]
    exit_regs: List[int]
    exit_pc: int
    exit_ts: int
    exit_flags: Tuple[bool, bool]
    challenge: int
    gamma_code: int
    gamma_log: int
    gamma_mem: int
    gamma_stack: int
    acc_in: Tuple[int, int, int, int]
    acc_out: Tuple[int, int, int, int]
    depth_in: int = 0
    depth_out: int = 0
    exit_ptrs: Tuple[bool, ...] = (False,) * NREGS


@dataclasses.dataclass
class VmCircuitArtifacts:
    instances: List[VmCircuitInstance]
    challenge: int
    gammas: Tuple[int, int, int]
    final_accs: Tuple[int, int, int]


def _operand(op: isa.Operand, regs: List[int]) -> Tuple[str, int, int]:
    """(kind, encoded value, runtime value)."""
    if op.kind == "imm":
        return "imm", int(op.value), int(op.value)
    idx = int(op.value)
    val = 0 if idx == 0 else regs[idx - 1]
    return "reg", idx, val


def _addr_lanes(addr: int) -> List[int]:
    """A 160-bit address as 3 Goldilocks lanes (54 bits each)."""
    m = (1 << 54) - 1
    a = int(addr)
    return [(a >> (54 * i)) & m for i in range(3)]


def decode_cycle_rows(tracer: WitnessTracer) -> List[VmRow]:
    instrs = dict(tracer.cycle_instructions)
    mem_reads = {c: q.value for (c, q) in tracer.memory_queries
                 if not q.rw_flag}
    mem_q: Dict[int, object] = {}
    for (c, q) in tracer.memory_queries:
        mem_q.setdefault(c, q)
    log_q: Dict[int, object] = {}
    log_reads: Dict[int, int] = {}
    for (c, q) in tracer.callstack_with_aux_data.forward:
        if not q.rollback:
            log_q.setdefault(c, q)
        if not q.rw_flag and not q.rollback:
            log_reads.setdefault(c, q.read_value)
    rows: List[VmRow] = []
    near_depth = 0
    for cyc, state in enumerate(tracer.cycle_states):
        regs = [v for (v, _ptr) in state["registers"]]
        ptr_tags = tuple(bool(p) for (_v, p) in state["registers"])
        eqf, ltf, _ = state["flags"]
        # call-stack argument: any cycle that popped a frame is a pop row
        # (Ret instructions get proven pc semantics — local AND far since
        # stage E; other panic unwinds stay EXT but still unfold the
        # accumulator through spop/fpop)
        pop = tracer.frame_pops.get(cyc)
        local_pop = bool(pop and pop.get("is_local"))
        far_pop = bool(pop and not pop.get("is_local"))
        base = dict(pc=state["pc"], ts=state["timestamp"], regs=regs,
                    ptrs=ptr_tags,
                    flags=(bool(eqf), bool(ltf)), depth=near_depth,
                    spop=local_pop, fpop=far_pop,
                    pop_ret_pc=pop["ret_pc"] if pop else 0,
                    pop_handler=pop["handler"] if pop else 0)
        instr = instrs.get(cyc)
        row = None
        if pop is not None:
            near_depth -= 1
        if isinstance(instr, isa.Ret) and local_pop:
            rows.append(VmRow(
                op=OP_RETP if pop["panicked"] else OP_RET, **base))
            continue
        if isinstance(instr, isa.Ret) and far_pop:
            # far return: registers preserved except a RetData returndata
            # fat pointer landing in r1 (the VALUE is oracle data like CTX
            # rows; the tag and every other register are proven)
            if pop["panicked"]:
                rows.append(VmRow(op=OP_FRETP, **base))
            elif isinstance(instr, isa.RetData):
                nxt = (tracer.cycle_states[cyc + 1]
                       if cyc + 1 < len(tracer.cycle_states)
                       else tracer.final_state)
                rows.append(VmRow(op=OP_FRET, dst=1,
                                  res=nxt["registers"][0][0], **base))
            else:
                rows.append(VmRow(op=OP_FRET, **base))
            continue
        if pop is not None and not isinstance(instr, isa.Ret):
            # stage G: a panic unwind fired on this cycle (ergs metering,
            # invalid opcode, kernel/pointer violation): the instruction's
            # own side effects never executed — OP_PANIC proves pc' = the
            # popped handler and register/flag preservation in-gates; the
            # stack unfold applies through spop/fpop
            rows.append(VmRow(op=OP_PANIC, **base))
            continue
        if isinstance(instr, isa.FarCall):
            # far call: pc' = 0 in the callee, <ret_pc, handler, depth,
            # FAR> folded into the stack accumulator; a FarCallData
            # calldata fat pointer lands in r1 (value oracle, tag proven)
            k0, e0, v0 = _operand(instr.address, regs)
            kw = dict(base)
            if isinstance(instr, isa.FarCallData):
                nxt = (tracer.cycle_states[cyc + 1]
                       if cyc + 1 < len(tracer.cycle_states)
                       else tracer.final_state)
                kw.update(dst=1)
                row = VmRow(op=OP_FCALL, s0_kind=k0, s0_val=e0, v0=v0,
                            handler=int(instr.exception_handler),
                            res=nxt["registers"][0][0], **kw)
            else:
                row = VmRow(op=OP_FCALL, s0_kind=k0, s0_val=e0, v0=v0,
                            handler=int(instr.exception_handler), **kw)
            near_depth += 1
            rows.append(row)
            continue
        if isinstance(instr, isa.Nop):
            row = VmRow(op=OP_NOP, **base)
        elif isinstance(instr, isa.BinOp) and instr.op in (
                "add", "sub", "mul", "and", "or", "xor", "shl", "shr"):
            k0, e0, v0 = _operand(instr.src0, regs)
            k1, e1, v1 = _operand(instr.src1, regs)
            mask = (1 << 256) - 1
            opmap = {"add": OP_ADD, "sub": OP_SUB, "mul": OP_MUL,
                     "and": OP_AND, "or": OP_OR, "xor": OP_XOR,
                     "shl": OP_SHL, "shr": OP_SHR}
            if instr.op == "add":
                res = (v0 + v1) & mask
            elif instr.op == "sub":
                res = (v0 - v1) & mask
            elif instr.op == "mul":
                res = (v0 * v1) & mask
            elif instr.op == "and":
                res = v0 & v1
            elif instr.op == "or":
                res = v0 | v1
            elif instr.op == "xor":
                res = v0 ^ v1
            elif instr.op == "shl":
                res = (v0 << (v1 & 0xFF)) & mask
            else:  # shr
                res = v0 >> (v1 & 0xFF)
            row = VmRow(op=opmap[instr.op],
                        dst=int(instr.dst), s0_kind=k0, s0_val=e0,
                        s1_kind=k1, s1_val=e1, v0=v0, v1=v1, res=res, **base)
        elif isinstance(instr, isa.Jump):
            row = VmRow(op=OP_JUMP, tgt=int(instr.target), **base)
        elif isinstance(instr, isa.JumpIfEq):
            row = VmRow(op=OP_JEQ, tgt=int(instr.target), **base)
        elif isinstance(instr, isa.HeapWrite):
            k0, e0, v0 = _operand(instr.addr, regs)
            k1, e1, v1 = _operand(instr.src, regs)
            row = VmRow(op=OP_HEAPW, s0_kind=k0, s0_val=e0, s1_kind=k1,
                        s1_val=e1, v0=v0, v1=v1,
                        page=mem_q[cyc].location.page, **base)
        elif isinstance(instr, isa.HeapRead):
            k0, e0, v0 = _operand(instr.addr, regs)
            row = VmRow(op=OP_HEAPR, dst=int(instr.dst), s0_kind=k0,
                        s0_val=e0, v0=v0, res=mem_reads.get(cyc, 0),
                        page=mem_q[cyc].location.page, **base)
        elif isinstance(instr, isa.StorageWrite):
            k0, e0, v0 = _operand(instr.key, regs)
            k1, e1, v1 = _operand(instr.src, regs)
            row = VmRow(op=OP_STOW, s0_kind=k0, s0_val=e0, s1_kind=k1,
                        s1_val=e1, v0=v0, v1=v1,
                        addr=log_q[cyc].address, **base)
        elif isinstance(instr, isa.StorageRead):
            k0, e0, v0 = _operand(instr.key, regs)
            row = VmRow(op=OP_STOR, dst=int(instr.dst), s0_kind=k0,
                        s0_val=e0, v0=v0, res=log_reads.get(cyc, 0),
                        addr=log_q[cyc].address, **base)
        elif isinstance(instr, isa.Div):
            k0, e0, v0 = _operand(instr.src0, regs)
            k1, e1, v1 = _operand(instr.src1, regs)
            q, r = (0, 0) if v1 == 0 else divmod(v0, v1)
            assert instr.dst_quot != instr.dst_rem, \
                "div destinations must be distinct registers"
            row = VmRow(op=OP_DIV, dst=int(instr.dst_quot),
                        dst2=int(instr.dst_rem), s0_kind=k0, s0_val=e0,
                        s1_kind=k1, s1_val=e1, v0=v0, v1=v1, res=q, rem=r,
                        **base)
        elif isinstance(instr, isa.Context):
            # single-writeback row: the context VALUE is oracle data (the
            # frame state is not circuit-tracked yet) but pc/flags/every
            # other register are proven preserved; the field id is
            # code-bound through tgt. The written value rides RES so the
            # writeback gate binds exactly one register to it.
            nxt = (tracer.cycle_states[cyc + 1]
                   if cyc + 1 < len(tracer.cycle_states)
                   else tracer.final_state)
            res = nxt["registers"][int(instr.dst) - 1][0]
            row = VmRow(op=OP_CTX, dst=int(instr.dst),
                        tgt=int(instr.field), res=res, **base)
        elif isinstance(instr, isa.Precompile):
            # single-writeback row; the precompile address is code-bound
            nxt = (tracer.cycle_states[cyc + 1]
                   if cyc + 1 < len(tracer.cycle_states)
                   else tracer.final_state)
            res = nxt["registers"][int(instr.dst) - 1][0]
            row = VmRow(op=OP_CTX, dst=int(instr.dst),
                        tgt=int(instr.address) & 0xFFFF, res=res, **base)
        elif isinstance(instr, (isa.PtrAdd, isa.PtrShrink)):
            opid = OP_PADD if isinstance(instr, isa.PtrAdd) else OP_PSHR
            v0 = regs[instr.ptr - 1]
            k1, e1, v1 = _operand(instr.delta, regs)
            page = (v0 >> 64) & 0xFFFFFFFF
            start = (v0 >> 32) & 0xFFFFFFFF
            length = v0 & 0xFFFFFFFF
            high = v0 >> 128
            if isinstance(instr, isa.PtrAdd):
                res = ((high << 128) | (page << 64)
                       | ((start + v1) << 32) | (length - v1))
            else:
                res = ((high << 128) | (page << 64)
                       | (start << 32) | (length - v1))
            row = VmRow(op=opid, dst=int(instr.dst), s0_kind="reg",
                        s0_val=int(instr.ptr), s1_kind=k1, s1_val=e1,
                        v0=v0, v1=v1, res=res, **base)
        elif isinstance(instr, isa.PtrPack):
            v0 = regs[instr.ptr - 1]
            k1, e1, v1 = _operand(instr.high, regs)
            res = v1 | (v0 & ((1 << 128) - 1))
            row = VmRow(op=OP_PPACK, dst=int(instr.dst), s0_kind="reg",
                        s0_val=int(instr.ptr), s1_kind=k1, s1_val=e1,
                        v0=v0, v1=v1, res=res, **base)
        elif isinstance(instr, isa.PtrRead):
            # stage F: the read is BOUND through the page-tagged memory
            # fingerprint — page/index derive in-gates from the fat
            # pointer's segments, the value rides RES into the same
            # accumulator the RAM-permutation circuit consumes;
            # out-of-bounds reads prove off >= length and force RES = 0
            nxt = (tracer.cycle_states[cyc + 1]
                   if cyc + 1 < len(tracer.cycle_states)
                   else tracer.final_state)
            res = nxt["registers"][int(instr.dst) - 1][0]
            k1, e1, v1 = _operand(instr.offset, regs)
            ptr_val = regs[int(instr.ptr) - 1]
            page = (ptr_val >> 64) & 0xFFFFFFFF
            row = VmRow(op=OP_PREAD, dst=int(instr.dst), s0_kind="reg",
                        s0_val=int(instr.ptr), s1_kind=k1, s1_val=e1,
                        v0=ptr_val, v1=v1, res=res, page=page, **base)
        elif isinstance(instr, isa.NearCall):
            row = VmRow(op=OP_NCALL, tgt=int(instr.target),
                        handler=int(instr.exception_handler), **base)
            near_depth += 1
        elif isinstance(instr, isa.Event):
            k0, e0, v0 = _operand(instr.key, regs)
            k1, e1, v1 = _operand(instr.value, regs)
            row = VmRow(op=OP_EVTL1 if instr.to_l1 else OP_EVT,
                        s0_kind=k0, s0_val=e0, s1_kind=k1, s1_val=e1,
                        v0=v0, v1=v1, addr=log_q[cyc].address, **base)
        elif isinstance(instr, isa.Ret):
            # pop is None here: the ROOT-frame return — the block halts.
            # OP_HALT proves pc' = pc and full state preservation in-gates
            # (the old OP_EXT fallback left pc/halt semantics
            # unconstrained — VERDICT r4 weak item 9)
            row = VmRow(op=OP_HALT, **base)
        else:
            row = VmRow(op=OP_EXT, **base)
        rows.append(row)
    return rows


def _limbs(v: int, NL: int, L: int) -> List[int]:
    return [(int(v) >> (L * i)) & ((1 << L) - 1) for i in range(NL)]


def _fold(geo: VmGeometry, acc: int, gamma: int, pows: List[int],
          fields: Sequence[int]) -> int:
    t = 0
    for j, f in enumerate(fields):
        t = (t + pows[j] * (int(f) % P)) % P
    return (acc * gamma + t) % P


def row_fingerprint_fields(geo: VmGeometry, row: VmRow):
    """(code_fields, log_fields|None, mem_fields|None) — must mirror the
    gate's field layout exactly."""
    NL, L = geo.num_limbs, geo.limb_bits
    opid = row.op + 1
    s0id = (NREGS + 1 if row.s0_kind == "imm"
            else (row.s0_val if row.s0_kind == "reg" else 0))
    s1id = (NREGS + 1 if row.s1_kind == "imm"
            else (row.s1_val if row.s1_kind == "reg" else 0))
    imm0 = row.s0_val if row.s0_kind == "imm" else 0
    imm1 = row.s1_val if row.s1_kind == "imm" else 0
    code = ([row.pc, opid, row.dst + 16 * s0id + 512 * row.dst2,
             s1id + 32 * row.tgt, row.handler]
            + _limbs(imm0, NL, L) + _limbs(imm1, NL, L))
    log = mem = None
    if row.op in (OP_STOW, OP_STOR, OP_EVT, OP_EVTL1):
        value = row.res if row.op == OP_STOR else row.v1
        log = ([opid, row.ts] + _addr_lanes(row.addr)
               + _limbs(row.v0, NL, L) + _limbs(value, NL, L))
    if row.op in (OP_HEAPW, OP_HEAPR):
        value = row.res if row.op == OP_HEAPR else row.v1
        mem = ([1 if row.op == OP_HEAPW else 0, row.ts, int(row.page)]
               + _limbs(row.v0, NL, L) + _limbs(value, NL, L))
    if row.op == OP_PREAD:
        length = row.v0 & 0xFFFFFFFF
        start = (row.v0 >> 32) & 0xFFFFFFFF
        if row.v1 < length:  # in-bounds: folded into the mem fingerprint
            mem = ([0, row.ts, int(row.page)]
                   + _limbs(start + row.v1, NL, L)
                   + _limbs(row.res, NL, L))
    return code, log, mem


def replay_accumulators(geo: VmGeometry, inst: VmCircuitInstance
                        ) -> Tuple[int, int, int, int]:
    NL = geo.num_limbs
    NPOW = 6 + 2 * NL
    ch = int(inst.challenge) % P
    pows = [pow(ch, j + 1, P) for j in range(NPOW)]
    accs = [int(a) % P for a in inst.acc_in]
    gammas = [int(inst.gamma_code) % P, int(inst.gamma_log) % P,
              int(inst.gamma_mem) % P, int(inst.gamma_stack) % P]
    gs_inv = pow(gammas[3], P - 2, P)

    def tup_fold(fields):
        return sum(pw * (int(f) % P) for pw, f in zip(pows, fields)) % P

    depth = int(inst.depth_in)
    for row in inst.rows:
        code, log, mem = row_fingerprint_fields(geo, row)
        accs[0] = _fold(geo, accs[0], gammas[0], pows, code)
        if log is not None:
            accs[1] = _fold(geo, accs[1], gammas[1], pows, log)
        if mem is not None:
            accs[2] = _fold(geo, accs[2], gammas[2], pows, mem)
        if row.op in (OP_NCALL, OP_FCALL):
            accs[3] = (accs[3] * gammas[3]
                       + tup_fold([row.pc + 1, row.handler, depth,
                                   1 if row.op == OP_FCALL else 0])) % P
            depth += 1
        elif row.spop or row.fpop:
            depth -= 1
            t = tup_fold([row.pop_ret_pc, row.pop_handler, depth,
                          1 if row.fpop else 0])
            accs[3] = (accs[3] - t) * gs_inv % P
    return tuple(accs)


def draw_vm_challenges(rows: Sequence[VmRow], geo: VmGeometry
                       ) -> Tuple[int, int, int, int, int]:
    """Fiat-Shamir challenges bound to the decoded cycle stream (including
    the stack push/pop tuples the stack accumulator folds)."""
    from ..ops import poseidon2 as p2
    from ..prover.transcript import Transcript
    tr = Transcript(domain_tag=1)
    flat: List[int] = []
    for row in rows:
        code, log, mem = row_fingerprint_fields(geo, row)
        flat += [f % P for f in code]
        for extra in (log, mem):
            if extra is not None:
                flat += [f % P for f in extra]
        if row.spop or row.fpop:
            flat += [2 if row.fpop else 1, row.pop_ret_pc % P,
                     row.pop_handler % P, row.depth % P]
    # every element is already reduced mod P (< 2^64): np.fromiter into
    # uint64 avoids the object-array boxing that dominated the fill profile
    # (np.asarray(list, object) + .astype(uint64) was ~5 s at 500k elements)
    arr = (np.fromiter(flat, dtype=np.uint64, count=len(flat)) if flat
           else np.zeros(1, dtype=np.uint64))
    # gl.from_u64 requires canonical (< P) input and does not reduce; a
    # missed `% P` above must fail loudly, not corrupt the FS digest
    if flat and int(arr.max()) >= P:
        raise ValueError("draw_vm_challenges: non-canonical fingerprint limb")
    digest = gl.to_ints(p2.hash_elements(gl.from_u64(arr)))
    tr.absorb_ints([int(v) for v in digest] + [len(rows)])
    return (tr.challenge_base(), tr.challenge_base(), tr.challenge_base(),
            tr.challenge_base(), tr.challenge_base())


def crosscheck_query_binding(tracer: WitnessTracer, geo: VmGeometry,
                             art: "VmCircuitArtifacts") -> None:
    """Cross-circuit binding check: the host half of the scheduler glue.

    The MainVM circuit proves Horner accumulators over the log/memory side
    effects of the cycles it executes, while the RAM-permutation circuit
    consumes `tracer.memory_queries` and the log-demuxer the forward log
    queue. This re-derives the MainVM accumulator boundary PIs FROM THE
    TRACED QUERY OBJECTS (never from the VmRow payloads) and asserts the
    per-instance chain matches, so a MainVM proof cannot bind a different
    (timestamp, key/address, written-value) stream than the queue circuits
    prove over. Read VALUES are oracle-provided by construction — their
    consistency is exactly what the RAM-permutation/storage-sorter circuits
    establish; everything else (op kind, timestamp, address/key, written
    value) must agree between the two derivations or this raises ValueError
    (explicit raise, not assert: the check must survive `python -O`).

    The fold binds (op/rw, timestamp, PAGE, index, value) for memory and
    (op, timestamp, ADDRESS lanes, key, value) for logs — the page/address
    lanes (round 3) close the multi-context gap: a MainVM proof can no
    longer bind a different page's or address's stream (shard/tx stay
    single-valued in this VM and are asserted below).
    (Reference: closed-form-input observable queue states cross-checked by
    the scheduler, src/witness/oracle.rs:185-206 + recursion_layer/
    scheduler.rs; precompile/fat-pointer reads are CTX rows and excluded
    on both sides.)
    """
    from ..vm.environment import AUX_BYTE_EVENT, AUX_BYTE_L1_MESSAGE
    NL, L = geo.num_limbs, geo.limb_bits
    NPOW = 6 + 2 * NL
    ch = int(art.challenge) % P
    pows = [pow(ch, j + 1, P) for j in range(NPOW)]
    _, g_log, g_mem, _ = (int(g) % P for g in art.gammas)

    mem_by_cycle: Dict[int, List] = {}
    for c, q in tracer.memory_queries:
        mem_by_cycle.setdefault(c, []).append(q)
    log_by_cycle: Dict[int, List] = {}
    for c, q in tracer.callstack_with_aux_data.forward:
        if not q.rollback:
            log_by_cycle.setdefault(c, []).append(q)

    def fold(acc: int, gamma: int, fields: Sequence[int]) -> int:
        t = 0
        for pw, f in zip(pows, fields):
            t = (t + pw * (int(f) % P)) % P
        return (acc * gamma + t) % P

    def _req(cond: bool, msg: str) -> None:
        if not cond:
            raise ValueError(f"cross-binding check failed: {msg}")

    acc_log = acc_mem = 1
    cycle = 0
    for inst in art.instances:
        _req((acc_log, acc_mem) == (int(inst.acc_in[1]) % P,
                                    int(inst.acc_in[2]) % P),
             "instance accumulator chain diverged from the traced queues")
        for row in inst.rows:
            if row.op in (OP_HEAPW, OP_HEAPR):
                qs = mem_by_cycle.get(cycle, [])
                _req(len(qs) == 1,
                     f"cycle {cycle}: heap op must trace exactly one query")
                q = qs[0]
                _req(bool(q.rw_flag) == (row.op == OP_HEAPW),
                     f"cycle {cycle}: rw flag mismatch vs traced query")
                acc_mem = fold(acc_mem, g_mem,
                               [1 if q.rw_flag else 0, q.timestamp,
                                int(q.location.page)]
                               + _limbs(q.location.index, NL, L)
                               + _limbs(q.value, NL, L))
            elif row.op == OP_PREAD and row.v1 < (row.v0 & 0xFFFFFFFF):
                qs = mem_by_cycle.get(cycle, [])
                _req(len(qs) == 1,
                     f"cycle {cycle}: in-bounds PtrRead must trace a query")
                q = qs[0]
                _req(not q.rw_flag,
                     f"cycle {cycle}: PtrRead query must be a read")
                acc_mem = fold(acc_mem, g_mem,
                               [0, q.timestamp, int(q.location.page)]
                               + _limbs(q.location.index, NL, L)
                               + _limbs(q.value, NL, L))
            elif row.op in (OP_STOW, OP_STOR, OP_EVT, OP_EVTL1):
                qs = log_by_cycle.get(cycle, [])
                _req(len(qs) == 1,
                     f"cycle {cycle}: log op must trace exactly one query")
                q = qs[0]
                _req(int(q.shard_id) == 0 and int(q.tx_number_in_block) == 0,
                     f"cycle {cycle}: shard/tx lanes are single-valued in "
                     "this VM (extend the fingerprint before multi-tx)")
                if q.aux_byte == AUX_BYTE_EVENT:
                    opid, value = OP_EVT + 1, q.written_value
                elif q.aux_byte == AUX_BYTE_L1_MESSAGE:
                    opid, value = OP_EVTL1 + 1, q.written_value
                elif q.rw_flag:
                    opid, value = OP_STOW + 1, q.written_value
                else:
                    opid, value = OP_STOR + 1, q.read_value
                _req(opid == row.op + 1,
                     f"cycle {cycle}: op kind mismatch vs traced query")
                acc_log = fold(acc_log, g_log,
                               [opid, q.timestamp]
                               + _addr_lanes(q.address)
                               + _limbs(q.key, NL, L)
                               + _limbs(value, NL, L))
            cycle += 1
        _req((acc_log, acc_mem) == (int(inst.acc_out[1]) % P,
                                    int(inst.acc_out[2]) % P),
             "MainVM accumulator PIs do not bind the traced query stream")
    _req((acc_log, acc_mem) == (int(art.final_accs[1]) % P,
                                int(art.final_accs[2]) % P),
         "final accumulators diverged from the traced queues")


def compute_main_vm_artifacts(tracer: WitnessTracer, geo: VmGeometry,
                              capacity: int) -> VmCircuitArtifacts:
    rows = decode_cycle_rows(tracer)
    ch, gc, glg, gm, gst = draw_vm_challenges(rows, geo)
    chunks = [rows[i:i + capacity] for i in range(0, len(rows), capacity)] \
        or [[]]
    assert capacity <= geo.n, "instance capacity exceeds trace rows"
    fs = tracer.final_state
    instances: List[VmCircuitInstance] = []
    accs = (1, 1, 1, 1)
    depth = 0
    for i, chunk in enumerate(chunks):
        nxt = (i + 1) * capacity
        if nxt < len(rows):
            exit_state = tracer.cycle_states[nxt]
        else:
            exit_state = fs
        exit_regs = [v for (v, _p) in exit_state["registers"]]
        exit_ptrs = tuple(bool(p) for (_v, p) in exit_state["registers"])
        eqf, ltf, _ = exit_state["flags"]
        depth_out = depth + sum(
            (1 if r.op in (OP_NCALL, OP_FCALL) else 0)
            - (1 if (r.spop or r.fpop) else 0) for r in chunk)
        inst = VmCircuitInstance(
            index=i, rows=list(chunk), exit_regs=exit_regs,
            exit_pc=exit_state["pc"], exit_ts=exit_state["timestamp"],
            exit_flags=(bool(eqf), bool(ltf)), exit_ptrs=exit_ptrs,
            challenge=ch, gamma_code=gc, gamma_log=glg, gamma_mem=gm,
            gamma_stack=gst, acc_in=accs, acc_out=(0, 0, 0, 0),
            depth_in=depth, depth_out=depth_out)
        acc_out = replay_accumulators(geo, inst)
        inst.acc_out = acc_out
        accs = acc_out
        depth = depth_out
        instances.append(inst)
    # block-level balance: a finished block leaves the near-call stack
    # empty, so the LIFO fold/unfold argument must return to its seed —
    # THE soundness anchor for the per-row unfolds (mismatched tuples
    # cannot cancel once the stack gamma is fixed by Fiat-Shamir)
    assert depth == 0, "unbalanced near-call stack at block exit"
    assert accs[3] == 1, "stack accumulator did not return to its seed"
    return VmCircuitArtifacts(instances=instances, challenge=ch,
                              gammas=(gc, glg, gm, gst), final_accs=accs)
