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
from typing import Dict, List, Optional, Sequence, Tuple

from .circuits import flagship as fl
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
              source: Optional[InMemoryDataSource] = None
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
    vm = create_vm(tools, BlockProperties(block_number=1), entry_address,
                   code_page=0)
    cycles = run_vm(vm, list(code), cycle_limit)
    assert vm.finished, "block did not finish within the cycle limit"

    # -- L2: witness artifacts --------------------------------------------
    artifacts = orc.create_artifacts_from_tracer(tracer, geometry)

    # recursion queues for the REAL base circuits carry REAL public-input
    # commitments (Poseidon2 digest of the instance's expected PIs — the
    # exact digest leaf circuits recompute in-circuit from the child proof;
    # circuits/leaf_circuit.py). Stand-in types keep index placeholders
    # until their gate sets land.
    from .ops import goldilocks as _gl
    from .ops import poseidon2 as _p2
    from .witness.recursion import (RecursionQueueSimulator, RecursionRequest)
    real_payloads = {
        2: (artifacts.decommitts_sorter.instances,
            artifacts.decommitts_sorter.challenges,
            geometry.cycles_per_code_decommitter_sorter),
        4: (artifacts.log_demuxer.instances, None,
            geometry.cycles_per_log_demuxer),
        8: (artifacts.ram_permutation.instances,
            artifacts.ram_permutation.challenges,
            geometry.cycles_per_ram_permutation),
        11: (artifacts.events_sorter.instances,
             artifacts.events_sorter.challenges,
             geometry.cycles_per_events_or_l1_messages_sorter),
        12: (artifacts.l1_messages_sorter.instances,
             artifacts.l1_messages_sorter.challenges,
             geometry.cycles_per_events_or_l1_messages_sorter),
    }
    for ctype, (insts, challenges, cap) in real_payloads.items():
        rq = RecursionQueueSimulator()
        for inst_w in insts:
            pis = ly.real_base_instance_public_inputs(ctype, inst_w,
                                                      challenges, cap)
            digest = tuple(int(v) for v in _gl.to_ints(_p2.hash_elements(
                _gl.from_int([int(p) % (2**64 - 2**32 + 1) for p in pis]))))
            rq.push_request(RecursionRequest(ctype, digest))
        artifacts.recursion_queues[ctype] = rq

    # -- CircuitMaker pass: PI commitments + recursion queues -------------
    makers: Dict[int, pp.CircuitMaker] = {}
    for ctype, pca in artifacts.per_circuit.items():
        cm = pp.CircuitMaker(ctype)
        fsm = (0,)
        for idx in range(pca.num_instances):
            nxt_fsm = (idx + 1,)
            cm.process(observable_input=(ctype,), observable_output=(idx,),
                       fsm_input=fsm, fsm_output=nxt_fsm,
                       is_last=(idx == pca.num_instances - 1))
            fsm = nxt_fsm
        makers[ctype] = cm

    # -- L5: proof DAG -----------------------------------------------------
    dag = sch.build_block_dag(
        {t: m.queue for t, m in makers.items()},
        {t: a.num_instances for t, a in artifacts.per_circuit.items()})

    def prove_fn(task: sch.ProofTask, deps):
        real = (prove_mode == "full" or
                (prove_mode == "spot" and task.kind == "base"
                 and task.circuit_type in spot_types))
        if real and task.kind == "base":
            ctype = task.circuit_type
            if ctype in ly.REAL_BASE_CIRCUITS:
                # witness->column synthesis from the decomposer's instance
                # payload: the proven columns ARE the block's trace
                if ctype == 8:
                    ram = artifacts.ram_permutation
                    if task.index < len(ram.instances):
                        inst_w = ram.instances[task.index]
                        cap = geometry.cycles_per_ram_permutation
                        proof = ly.prove_ram_instance(inst_w, ram.challenges,
                                                      cap, source)
                        assert ly.verify_ram_instance(inst_w, ram.challenges,
                                                      cap, proof), \
                            "verify-after-prove failed"
                        return {"kind": task.kind, "real": True,
                                "circuit_type": ctype,
                                "public_inputs": proof.public_inputs}
                elif ctype in (11, 12):
                    art = (artifacts.events_sorter if ctype == 11
                           else artifacts.l1_messages_sorter)
                    if task.index < len(art.instances):
                        inst_w = art.instances[task.index]
                        cap = geometry.cycles_per_events_or_l1_messages_sorter
                        proof = ly.prove_events_instance(
                            inst_w, art.challenges, cap, source,
                            circuit_type=ctype)
                        assert ly.verify_events_instance(
                            inst_w, art.challenges, cap, proof,
                            circuit_type=ctype), "verify-after-prove failed"
                        return {"kind": task.kind, "real": True,
                                "circuit_type": ctype,
                                "public_inputs": proof.public_inputs}
                elif ctype == 2:
                    art = artifacts.decommitts_sorter
                    if task.index < len(art.instances):
                        inst_w = art.instances[task.index]
                        cap = geometry.cycles_per_code_decommitter_sorter
                        proof = ly.prove_decommitts_instance(
                            inst_w, art.challenges, cap, source)
                        assert ly.verify_decommitts_instance(
                            inst_w, art.challenges, cap, proof), \
                            "verify-after-prove failed"
                        return {"kind": task.kind, "real": True,
                                "circuit_type": ctype,
                                "public_inputs": proof.public_inputs}
                elif ctype == 4:
                    art = artifacts.log_demuxer
                    if task.index < len(art.instances):
                        inst_w = art.instances[task.index]
                        cap = geometry.cycles_per_log_demuxer
                        proof = ly.prove_demux_instance(inst_w, cap, source)
                        assert ly.verify_demux_instance(inst_w, cap, proof), \
                            "verify-after-prove failed"
                        return {"kind": task.kind, "real": True,
                                "circuit_type": ctype,
                                "public_inputs": proof.public_inputs}
                # empty argument: no decomposer instance to prove
                return {"kind": task.kind, "circuit_type": ctype,
                        "index": task.index, "ndeps": len(deps),
                        "real": False, "empty": True}
            sd = ly.create_base_layer_setup_data(ctype, source)
            witness = fl.flagship_witness(sd.ir, seed=task.index)
            proof = ly.prove_base_layer_circuit(ctype, witness, source)
            assert ly.verify_base_layer_proof(ctype, proof), \
                "verify-after-prove failed"
            return {"kind": task.kind, "real": True,
                    "public_inputs": proof.public_inputs}
        return {"kind": task.kind, "circuit_type": task.circuit_type,
                "index": task.index, "ndeps": len(deps), "real": False}

    dag_results = sch.run_dag(dag, prove_fn, source)

    # -- scheduler witness -------------------------------------------------
    first_last = {t: (m.first, m.last) for t, m in makers.items()}
    sched_wit = sw.assemble_scheduler_witness(1, artifacts, first_last)

    return BlockProvingResult(cycles=cycles, artifacts=artifacts,
                              circuit_makers=makers, dag_results=dag_results,
                              scheduler_witness=sched_wit, source=source)
