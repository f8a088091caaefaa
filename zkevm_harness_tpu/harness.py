"""Block-level proving flow: the `external_calls::run` + basic_test analogue.

Ties the full pipeline together (SURVEY stacks 3.1/3.2):
  run VM -> tracer -> oracle artifacts -> per-circuit CircuitMakers (closed
  form inputs + PI commitments) -> recursion queues -> proof DAG ->
  base/leaf/node/scheduler proving via the typed layer surface -> scheduler
  witness assembly.

`prove_mode` controls the per-task work, mirroring the reference's tiers:
  - "full": real PLONKish proofs via prover/layers registry;
  - "spot": real proofs for `spot_types` only, satisfiability-style metadata
    for the rest (the reference's basic_test proves everything but only
    spot-checks ECRecover satisfiability up front —
    complex_tests/mod.rs:283-301);
  - "dry": metadata everywhere (DAG/pipeline validation).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

from .circuits.types import GeometryConfig, testing_geometry
from .prover import layers as ly
from .prover import scheduler as sch
from .utils.data_source import InMemoryDataSource
from .vm import isa
from .vm.environment import (DefaultPrecompilesProcessor, InMemoryEventSink,
                             InMemoryStorage, SimpleDecommitter, SimpleMemory)
from .vm.interpreter import run_vm
from .vm.state import BlockProperties, ProvingToolset, create_vm
from .witness import oracle as orc
from .witness import postprocessing as pp
from .witness import scheduler_witness as sw
from .witness.tracer import WitnessTracer


@dataclasses.dataclass
class BlockProvingResult:
    cycles: int
    artifacts: orc.BlockArtifacts
    circuit_makers: Dict[int, pp.CircuitMaker]
    dag_results: Dict
    scheduler_witness: sw.SchedulerCircuitInstanceWitness
    source: InMemoryDataSource
    recursion_rigs: Dict = dataclasses.field(default_factory=dict)


def run_block(code: Sequence[isa.Instruction], entry_address: int = 0xAA,
              geometry: Optional[GeometryConfig] = None,
              cycle_limit: int = 10_000,
              prove_mode: str = "dry",
              spot_types: Sequence[int] = (),
              source: Optional[InMemoryDataSource] = None,
              contracts: Optional[Dict[int, Sequence[isa.Instruction]]] = None,
              tower: bool = False,
              recursion_cfg=None,
              leaf_arity: Optional[int] = None,
              block_number: int = 1,
              eip4844_outputs=(),
              eip4844_slots=()) -> BlockProvingResult:
    """With `tower=True` the DAG's leaf/node/scheduler tasks are REAL
    proofs (not metadata): each leaf verifies its base-proof chunk
    in-circuit against the task's recursion-queue segment, nodes splice
    leaf intervals, and the scheduler verifies every real type's final
    node — all through run_dag, so skip-if-present resume and parallel
    waves apply to the whole tower (the reference's basic_test protocol,
    complex_tests/mod.rs:323-331,588-592). Tower tasks follow the same
    real-proof eligibility as base tasks ("full" = all types, "spot" =
    spot_types).

    `eip4844_slots`: per-blob dicts {"ir", "cfg", "vk", "proof"} of
    already-proven blob fold proofs; the scheduler task grows one
    in-circuit verifier slot per blob, so the block commitment attests the
    blob openings (complex_tests/mod.rs:993-1007 parity). The fold proofs
    are block-independent, so they are proven before the DAG runs."""
    geometry = geometry or testing_geometry()
    source = source or InMemoryDataSource()

    # -- L0/L1: execute and trace -----------------------------------------
    tracer = WitnessTracer(geometry.cycles_per_vm_snapshot)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=geometry)
    if contracts:
        from .vm.interpreter import deploy_contract
        for addr, instrs in contracts.items():
            deploy_contract(tools, addr, instrs)
    pre_state = dict(tools.storage.inner)  # post-predeploy, pre-execution
    vm = create_vm(tools, BlockProperties(block_number=1), entry_address,
                   code_page=0)
    cycles = run_vm(vm, list(code), cycle_limit)
    assert vm.finished, "block did not finish within the cycle limit"

    # -- L2: witness artifacts --------------------------------------------
    artifacts = orc.create_artifacts_from_tracer(tracer, geometry,
                                                 initial_storage=pre_state)

    # per-type instance payloads + binding challenges (the decomposer's
    # output, consumed by both the CircuitMaker pass and real proving)
    real_payloads = {
        1: (artifacts.main_vm.instances, None,
            geometry.cycles_per_vm_snapshot),
        2: (artifacts.decommitts_sorter.instances,
            artifacts.decommitts_sorter.challenges,
            geometry.cycles_per_code_decommitter_sorter),
        3: (artifacts.code_decommitter.instances, None,
            geometry.cycles_per_code_decommitter),
        4: (artifacts.log_demuxer.instances, None,
            geometry.cycles_per_log_demuxer),
        5: (artifacts.keccak_rounds.instances,
            (artifacts.keccak_rounds.challenges,
             artifacts.keccak_rounds.gammas),
            geometry.cycles_per_keccak256_circuit),
        6: (artifacts.sha256_rounds.instances,
            (artifacts.sha256_rounds.challenges,
             artifacts.sha256_rounds.gammas),
            geometry.cycles_per_sha256_circuit),
        7: (artifacts.ecrecover, None,
            geometry.cycles_per_ecrecover_circuit),
        8: (artifacts.ram_permutation.instances,
            artifacts.ram_permutation.challenges,
            geometry.cycles_per_ram_permutation),
        # type 10: the decomposer's (read, write) pairs FLATTEN into
        # individual path instances so the recursion tower verifies each
        # path proof as one leaf slot (queue order read_i, write_i binds
        # the pairing; root chaining is pinned by the PI root bits)
        10: ([p for pair in artifacts.storage_application.instances
              for p in pair], None,
             geometry.cycles_per_storage_application),
        9: (artifacts.storage_sorter.instances,
            artifacts.storage_sorter.challenges,
            geometry.cycles_per_storage_sorter),
        11: (artifacts.events_sorter.instances,
             artifacts.events_sorter.challenges,
             geometry.cycles_per_events_or_l1_messages_sorter),
        12: (artifacts.l1_messages_sorter.instances,
             artifacts.l1_messages_sorter.challenges,
             geometry.cycles_per_events_or_l1_messages_sorter),
        13: (artifacts.linear_hasher.instances, None,
             geometry.limit_for_l1_messages_pudata_hasher),
    }
    # -- CircuitMaker pass: REAL closed-form inputs + recursion queues -----
    # Each instance carries its real observable/FSM data from the
    # decomposer witness (witness/closed_form.py); the recursion-queue
    # digest is the Poseidon2 hash of the instance's REAL public-input
    # vector — the value the leaf circuit re-verifies in-circuit. The FSM
    # continuation assertion is therefore a genuine cross-instance chain
    # check (postprocessing/mod.rs:136-294 parity).
    from .witness import closed_form as cf
    makers: Dict[int, pp.CircuitMaker] = {}
    for ctype, (insts, challenges, cap) in real_payloads.items():
        cm = pp.CircuitMaker(ctype)
        for idx, inst_w in enumerate(insts):
            pis = ly.real_base_instance_public_inputs(ctype, inst_w,
                                                      challenges, cap)
            cfi = cf.build_closed_form(ctype, inst_w, challenges,
                                       is_first=(idx == 0),
                                       is_last=(idx == len(insts) - 1))
            cm.process_real(cfi, pis, witness_payload=inst_w)
        makers[ctype] = cm
        artifacts.recursion_queues[ctype] = cm.queue
        # reconcile the capacity-derived instance estimate with the
        # decomposer's actual count (the decomposer is authoritative)
        artifacts.per_circuit[ctype].num_instances = len(insts)

    # -- L5: proof DAG -----------------------------------------------------
    dag = sch.build_block_dag(
        {t: m.queue for t, m in makers.items()},
        {t: a.num_instances for t, a in artifacts.per_circuit.items()},
        leaf_arity=leaf_arity)

    # scheduler witness assembled BEFORE the DAG runs: the real scheduler
    # task consumes its aux values in-circuit
    first_last = {t: (m.first, m.last) for t, m in makers.items()}
    sched_wit = sw.assemble_scheduler_witness(
        block_number, artifacts, first_last,
        eip4844_output_hashes=tuple(eip4844_outputs))

    # per-type dispatch: (prove, verify) closures over the instance payload
    # and its binding challenges — types 4 (no challenges) and 11/12 (shared
    # gate set, domain-tagged challenges) normalize through the lambdas
    real_dispatch = {
        1: (lambda w, c, s: ly.prove_main_vm_instance(w, c[1], s),
            lambda w, c, p: ly.verify_main_vm_instance(w, c[1], p)),
        2: (lambda w, c, s: ly.prove_decommitts_instance(w, c[0], c[1], s),
            lambda w, c, p: ly.verify_decommitts_instance(w, c[0], c[1], p)),
        3: (lambda w, c, s: ly.prove_code_decommitter_instance(w, c[1], s),
            lambda w, c, p: ly.verify_code_decommitter_instance(w, c[1], p)),
        4: (lambda w, c, s: ly.prove_demux_instance(w, c[1], s),
            lambda w, c, p: ly.verify_demux_instance(w, c[1], p)),
        5: (lambda w, c, s: ly.prove_keccak_instance(w, c[0], c[1], s),
            lambda w, c, p: ly.verify_keccak_instance(w, c[0], c[1], p)),
        6: (lambda w, c, s: ly.prove_sha256_instance(w, c[0], c[1], s),
            lambda w, c, p: ly.verify_sha256_instance(w, c[0], c[1], p)),
        7: (lambda w, c, s: ly.prove_ecrecover_invocation(
                w.invocations[0], s),
            lambda w, c, p: ly.verify_ecrecover_invocation(
                w.invocations[0], p)),
        8: (lambda w, c, s: ly.prove_ram_instance(w, c[0], c[1], s),
            lambda w, c, p: ly.verify_ram_instance(w, c[0], c[1], p)),
        10: (lambda w, c, s: ly.prove_storage_application_path(w, s),
             lambda w, c, p: ly.verify_storage_application_path(w, p)),
        9: (lambda w, c, s: ly.prove_storage_instance(w, c[0], c[1], s),
            lambda w, c, p: ly.verify_storage_instance(w, c[0], c[1], p)),
        11: (lambda w, c, s: ly.prove_events_instance(
                 w, c[0], c[1], s, circuit_type=11),
             lambda w, c, p: ly.verify_events_instance(
                 w, c[0], c[1], p, circuit_type=11)),
        12: (lambda w, c, s: ly.prove_events_instance(
                 w, c[0], c[1], s, circuit_type=12),
             lambda w, c, p: ly.verify_events_instance(
                 w, c[0], c[1], p, circuit_type=12)),
        13: (lambda w, c, s: ly.prove_hasher_instance(w, c[1], s),
             lambda w, c, p: ly.verify_hasher_instance(w, c[1], p)),
    }

    # recursion rigs (tower=True): synthesized circuits, keyed so the
    # scheduler task and the caller (full_chain's compression stage) can
    # retrieve (ir, vk, cfg) per stage
    from .circuits import leaf_circuit as lc
    from .circuits import node_circuit as nc
    from .circuits import scheduler_circuit as sc_circ
    from .ops import goldilocks as gl
    from .prover import plonkish as pk
    P = gl.P
    rec_cfg = recursion_cfg or pk.PlonkishConfig(
        rate=2, cap_size=4, num_queries=2, final_fri_size=8)
    rigs: Dict = {}

    def _eligible(base_t: int) -> bool:
        return prove_mode == "full" or (prove_mode == "spot"
                                        and base_t in spot_types)

    from .witness.recursion import RECURSION_ARITY
    eff_arity = leaf_arity or RECURSION_ARITY

    def _type_is_ragged(base_t: int) -> bool:
        """A type whose queue splits into MULTIPLE chunks with a short
        tail chunk needs ONE shared (padded) leaf circuit so all its
        leaves — and hence the node's children — share a VK (the
        reference's padding-proof protocol,
        recursive_aggregation.rs:385-389)."""
        n = artifacts.per_circuit[base_t].num_instances
        return n > eff_arity and n % eff_arity != 0

    def _leaf_rig(base_t: int, k: int, padded: bool = False):
        key = ("leaf", base_t, k, padded)
        if key not in rigs:
            sd = ly.base_setup_for_type(base_t, geometry)
            b, lay = lc.synthesize_leaf(sd.ir, sd.config, arity=k,
                                        base_circuit_type=base_t,
                                        padded=padded)
            built = b.finalize()
            setup = built.setup(rec_cfg)
            rigs[key] = (b, lay, built, setup, sd)
        return rigs[key]

    def _node_rig(base_t: int, k: int, child_ir):
        key = ("node", base_t, k, id(child_ir))
        if key not in rigs:
            nb, nlay = nc.synthesize_node(child_ir, rec_cfg, arity=k)
            nbuilt = nb.finalize()
            nsetup = nbuilt.setup(rec_cfg)
            rigs[key] = (nb, nlay, nbuilt, nsetup)
        return rigs[key]

    def _prove_leaf(task, deps):
        lw = task.payload
        base_t = lw.base_circuit_type
        chunk = [deps[d.key()]["proof"] for d in task.deps]
        padded = _type_is_ragged(base_t)
        synth_arity = eff_arity if padded else len(chunk)
        b, lay, built, setup, sd = _leaf_rig(base_t, synth_arity, padded)
        padding = None
        if padded and len(chunk) < synth_arity:
            # reference protocol: instance 0's proof is the type's padding
            # proof (complex_tests/mod.rs:326,395)
            prec = source.get_base_layer_proof(base_t, 0)
            padding = prec["proof"] if prec else chunk[0]
            if source.get_base_layer_padding_proof(base_t) is None:
                source.set_base_layer_padding_proof(
                    {"kind": "base_padding", "real": True,
                     "proof": padding}, base_t)
        W = b.fill_witness(lc.leaf_assignments(lay, sd.vk, chunk,
                                               queue_head=lw.queue_head,
                                               padding_proof=padding))
        proof = pk.prove(built.ir, setup, W, rec_cfg)
        expect = lc.leaf_public_inputs(lay, sd.vk, chunk,
                                       queue_head=lw.queue_head)
        assert [int(v) for v in proof.public_inputs] == \
            [int(v) % P for v in expect], "leaf PI mismatch"
        assert pk.verify(built.ir, setup.vk(), proof, rec_cfg), \
            f"leaf proof for type {base_t} failed verification"
        assert tuple(int(v) for v in proof.public_inputs[-12:]) == \
            tuple(int(v) % P for v in lw.queue_tail), \
            "leaf tail diverged from its recursion-queue segment"
        rigs[("leaf_final", base_t)] = (built.ir, setup.vk())
        return {"kind": "leaf", "real": True, "circuit_type": base_t,
                "proof": proof, "vk": setup.vk(), "arity": synth_arity,
                "num_real": len(chunk),
                "public_inputs": proof.public_inputs}

    def _ensure_leaf_final(base_t: int, k: int, vk):
        """Re-synthesize the leaf rig after a resume skipped the leaf task
        (synthesis is deterministic in (base ir, cfg, arity, raggedness))."""
        if ("leaf_final", base_t) not in rigs:
            _b, _lay, built, setup, _sd = _leaf_rig(
                base_t, k, _type_is_ragged(base_t))
            assert setup.vk() == list(vk), \
                "resumed leaf VK does not match the re-synthesized circuit"
            rigs[("leaf_final", base_t)] = (built.ir, setup.vk())

    def _prove_node(task, deps):
        base_t = task.circuit_type
        children = [deps[d.key()] for d in task.deps]
        child_kind = task.deps[0].kind
        if child_kind == "leaf":
            _ensure_leaf_final(base_t, children[0]["arity"],
                               children[0]["vk"])
            child_ir, _ = rigs[("leaf_final", base_t)]
        else:
            child_ir, _ = rigs[("node_final", base_t)]
        child_vk = children[0]["vk"]
        assert all(c["vk"] == child_vk for c in children), \
            "node children must share one VK (ragged chunks synthesize " \
            "padded leaves at the fixed arity, so this cannot fire)"
        child_proofs = [c["proof"] for c in children]
        nb, nlay, nbuilt, nsetup = _node_rig(base_t, len(children),
                                             child_ir)
        nW = nb.fill_witness(nc.node_assignments(nlay, child_vk,
                                                 child_proofs))
        proof = pk.prove(nbuilt.ir, nsetup, nW, rec_cfg)
        nexpect = nc.node_public_inputs(nlay, child_vk, child_proofs)
        assert [int(v) for v in proof.public_inputs] == \
            [int(v) % P for v in nexpect], "node PI mismatch"
        assert pk.verify(nbuilt.ir, nsetup.vk(), proof, rec_cfg), \
            f"node proof for type {base_t} failed verification"
        rigs[("node_final", base_t)] = (nbuilt.ir, nsetup.vk())
        return {"kind": "node", "real": True, "circuit_type": base_t,
                "proof": proof, "vk": nsetup.vk(), "arity": len(children),
                "public_inputs": proof.public_inputs}

    def _prove_scheduler(task, deps):
        real_types = sorted(d.circuit_type for d in task.deps
                            if deps[d.key()].get("real"))
        node_recs = {d.circuit_type: deps[d.key()] for d in task.deps
                     if deps[d.key()].get("real")}
        aux = sc_circ.scheduler_aux_values(sched_wit)
        for t in real_types:
            if ("node_final", t) not in rigs:
                # resumed node: re-synthesize its rig (single node level at
                # this scale; deeper towers resume from the node records)
                leaf_rec = source.get_leaf_layer_proof(t + 2, 0)
                assert leaf_rec and leaf_rec.get("real")
                _ensure_leaf_final(t, leaf_rec["arity"], leaf_rec["vk"])
                child_ir, _ = rigs[("leaf_final", t)]
                _nb, _nl, nbuilt, nsetup = _node_rig(
                    t, node_recs[t]["arity"], child_ir)
                assert nsetup.vk() == list(node_recs[t]["vk"])
                rigs[("node_final", t)] = (nbuilt.ir, nsetup.vk())
        shapes = [(rigs[("node_final", t)][0], rec_cfg) for t in real_types]
        blob_shapes = [(s["ir"], s["cfg"]) for s in eip4844_slots]
        blob_vks = [s["vk"] for s in eip4844_slots]
        blob_prfs = [s["proof"] for s in eip4844_slots]
        sb, slay = sc_circ.synthesize_scheduler_multi(
            shapes, type_ids=tuple(real_types), aux_len=len(aux),
            blob_children=blob_shapes)
        sbuilt = sb.finalize()
        node_vks = [node_recs[t]["vk"] for t in real_types]
        node_prfs = [node_recs[t]["proof"] for t in real_types]
        sW = sb.fill_witness(sc_circ.scheduler_multi_assignments(
            slay, node_vks, node_prfs, block_number, aux,
            blob_vks=blob_vks, blob_proofs=blob_prfs))
        ssetup = sbuilt.setup(rec_cfg)
        proof = pk.prove(sbuilt.ir, ssetup, sW, rec_cfg)
        sched_pi = sc_circ.scheduler_multi_public_inputs(
            slay, node_vks, node_prfs, block_number, aux,
            blob_vks=blob_vks, blob_proofs=blob_prfs)
        assert [int(v) for v in proof.public_inputs] == \
            [int(v) % P for v in sched_pi], "scheduler PI mismatch"
        assert pk.verify(sbuilt.ir, ssetup.vk(), proof, rec_cfg), \
            "scheduler proof failed verification"
        rigs[("scheduler",)] = (sbuilt.ir, ssetup.vk())
        return {"kind": "scheduler", "real": True, "proof": proof,
                "vk": ssetup.vk(), "types": real_types,
                "public_inputs": proof.public_inputs,
                "num_blob_slots": len(eip4844_slots),
                "scheduler_pi": [int(v) % P for v in sched_pi]}

    def prove_fn(task: sch.ProofTask, deps):
        # leaf tasks carry the RECURSION-layer circuit type; eligibility is
        # decided by the BASE type they aggregate
        if tower and task.kind == "leaf" and \
                _eligible(task.payload.base_circuit_type):
            return _prove_leaf(task, deps)
        if tower and task.kind == "node" and _eligible(task.circuit_type):
            return _prove_node(task, deps)
        if tower and task.kind == "scheduler" and any(
                deps[d.key()].get("real") for d in task.deps):
            return _prove_scheduler(task, deps)
        real = (prove_mode == "full" or
                (prove_mode == "spot" and task.kind == "base"
                 and task.circuit_type in spot_types))
        if real and task.kind == "base":
            # witness->column synthesis from the decomposer's instance
            # payload: the proven columns ARE the block's trace (every base
            # type has a real gate set; the round-1 flagship stand-in with
            # random witnesses is gone)
            ctype = task.circuit_type
            instances, challenges, cap = real_payloads[ctype]
            if task.index < len(instances):
                inst_w = instances[task.index]
                prove, verify = real_dispatch[ctype]
                proof = prove(inst_w, (challenges, cap), source)
                assert verify(inst_w, (challenges, cap), proof), \
                    "verify-after-prove failed"
                return {"kind": task.kind, "real": True,
                        "circuit_type": ctype, "proof": proof,
                        "public_inputs": proof.public_inputs}
            # empty argument: no decomposer instance to prove
            return {"kind": task.kind, "circuit_type": ctype,
                    "index": task.index, "ndeps": len(deps),
                    "real": False, "empty": True}
        return {"kind": task.kind, "circuit_type": task.circuit_type,
                "index": task.index, "ndeps": len(deps), "real": False}

    dag_results = sch.run_dag(dag, prove_fn, source)

    return BlockProvingResult(cycles=cycles, artifacts=artifacts,
                              circuit_makers=makers, dag_results=dag_results,
                              scheduler_witness=sched_wit, source=source,
                              recursion_rigs=rigs)
