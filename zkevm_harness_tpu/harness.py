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


def run_block(code: Sequence[isa.Instruction], entry_address: int = 0xAA,
              geometry: Optional[GeometryConfig] = None,
              cycle_limit: int = 10_000,
              prove_mode: str = "dry",
              spot_types: Sequence[int] = (),
              source: Optional[InMemoryDataSource] = None,
              contracts: Optional[Dict[int, Sequence[isa.Instruction]]] = None
              ) -> BlockProvingResult:
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
        10: (artifacts.storage_application.instances, None,
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
        {t: a.num_instances for t, a in artifacts.per_circuit.items()})

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
        10: (lambda w, c, s: ly.prove_storage_application_query(w, s),
             lambda w, c, p: ly.verify_storage_application_query(w, p)),
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

    def prove_fn(task: sch.ProofTask, deps):
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

    # -- scheduler witness -------------------------------------------------
    first_last = {t: (m.first, m.last) for t, m in makers.items()}
    sched_wit = sw.assemble_scheduler_witness(1, artifacts, first_last)

    return BlockProvingResult(cycles=cycles, artifacts=artifacts,
                              circuit_makers=makers, dag_results=dag_results,
                              scheduler_witness=sched_wit, source=source)
