"""Witness oracle: tracer -> per-circuit artifacts (queues, dedups, instances).

The round-1 slice of `create_artifacts_from_tracer` (src/witness/oracle.rs:185,
SURVEY component 6 + stack 3.3):
  - flatten the rollback-resolved log queue through a Poseidon2 queue
    simulator (the chain-of-states the demux circuit consumes);
  - demux into the 7 query classes (storage / events / L1 messages /
    keccak / sha256 / ecrecover precompiles) — log_demux.rs:20;
  - simulate the memory queue; sort it by (location, timestamp) for the RAM
    permutation argument — ram_permutation.rs:26-120;
  - storage dedup via the slot-history sorter; events/L1 dedup by
    rollback-cancellation — storage_sort_dedup.rs / events_sort_dedup.rs;
  - split every per-circuit argument into fixed-capacity instances per the
    geometry (FSM continuation splitting, SURVEY §5 long-context) and build
    the per-type recursion queues consumed by the aggregation DAG.

Query encodings are the reference's bit-exact packings
(witness/encodings.py, mirroring circuit_encodings/src/{memory_query,
log_query,decommittment_request}.rs): injective, every limb < 2^56.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

from ..circuits.types import BaseLayerCircuitType, GeometryConfig
from ..vm.environment import (AUX_BYTE_EVENT, AUX_BYTE_L1_MESSAGE,
                              AUX_BYTE_PRECOMPILE, AUX_BYTE_STORAGE,
                              DefaultPrecompilesProcessor, LogQuery,
                              MemoryQuery)
from ..witness.encodings import (encode_log_query, encode_memory_query,
                                 memory_sorting_key)
from ..witness.queues import FullWidthQueueSimulator, QueueSimulator
from ..witness.ram_permutation import (RamPermutationArtifacts,
                                       compute_ram_circuit_snapshots)
from ..witness.recursion import RecursionQueueSimulator, RecursionRequest
from ..witness.storage_sort import sort_storage_access_queries
from ..witness.tracer import WitnessTracer

P = 0xFFFFFFFF_00000001
_M32 = (1 << 32) - 1


@dataclasses.dataclass
class PerCircuitArtifacts:
    queue: QueueSimulator
    num_instances: int
    capacity: int


@dataclasses.dataclass
class BlockArtifacts:
    log_queue: QueueSimulator  # full rollback-resolved log queue (narrow, 20)
    demuxed: Dict[int, List[Tuple[int, LogQuery]]]
    memory_queue: FullWidthQueueSimulator
    sorted_memory_queue: FullWidthQueueSimulator
    deduplicated_storage: List[LogQuery]
    deduplicated_events: List[LogQuery]
    deduplicated_l1_messages: List[LogQuery]
    per_circuit: Dict[int, PerCircuitArtifacts]
    recursion_queues: Dict[int, RecursionQueueSimulator]
    # per-type decomposer outputs consumed by the REAL base circuits
    # (witness->column synthesis; ram_permutation.rs:26-120,
    # events_sort_dedup.rs:16)
    ram_permutation: RamPermutationArtifacts = None
    events_sorter: "EventsCircuitArtifacts" = None
    l1_messages_sorter: "EventsCircuitArtifacts" = None
    log_demuxer: "DemuxCircuitArtifacts" = None
    decommitts_sorter: "DecommittsCircuitArtifacts" = None
    storage_sorter: "StorageCircuitArtifacts" = None
    keccak_rounds: "RoundFunctionCircuitArtifacts" = None
    sha256_rounds: "RoundFunctionCircuitArtifacts" = None
    linear_hasher: "LinearHasherCircuitArtifacts" = None
    code_decommitter: "CodeDecommitterCircuitArtifacts" = None
    main_vm: "VmCircuitArtifacts" = None
    ecrecover: List = None  # [EcrecoverInstanceWitness]
    storage_application: "StorageApplicationCircuitArtifacts" = None
    # callstack sponge witnesses + per-frame log boundary states
    # (witness/callstack_sim.py; oracle.rs:560-790 role)
    callstack_witness: "CallstackSimResult" = None


def _instances_for(count: int, capacity: int) -> int:
    return max(1, -(-count // capacity))


def demux_log_queue(queue: List[Tuple[int, LogQuery]]
                    ) -> Dict[int, List[Tuple[int, LogQuery]]]:
    """Split by class (log_demux.rs): storage, events, L1 msgs, and the three
    precompile streams by address."""
    out: Dict[int, List[Tuple[int, LogQuery]]] = {
        "storage": [], "events": [], "l1": [],
        "keccak": [], "sha256": [], "ecrecover": [],
    }
    for cycle, q in queue:
        if q.aux_byte == AUX_BYTE_STORAGE:
            out["storage"].append((cycle, q))
        elif q.aux_byte == AUX_BYTE_EVENT:
            out["events"].append((cycle, q))
        elif q.aux_byte == AUX_BYTE_L1_MESSAGE:
            out["l1"].append((cycle, q))
        elif q.aux_byte == AUX_BYTE_PRECOMPILE:
            if q.address == DefaultPrecompilesProcessor.KECCAK_ADDRESS:
                out["keccak"].append((cycle, q))
            elif q.address == DefaultPrecompilesProcessor.SHA256_ADDRESS:
                out["sha256"].append((cycle, q))
            else:
                out["ecrecover"].append((cycle, q))
    return out


def dedup_events(events: List[LogQuery]) -> List[LogQuery]:
    """Cancel (forward, rollback) pairs by timestamp; keep net events in
    original order (events_sort_dedup.rs behavior)."""
    rolled_back = {q.timestamp for q in events if q.rollback}
    return [q for q in events
            if not q.rollback and q.timestamp not in rolled_back]


def create_artifacts_from_tracer(tracer: WitnessTracer,
                                 geometry: GeometryConfig,
                                 initial_storage=None) -> BlockArtifacts:
    """initial_storage: optional {(shard, address, key): value} pre-state
    (predeployed contracts etc.) seeded into the storage-application tree
    before the block's writes are applied."""
    # 1. full log queue through the Poseidon2 simulator
    log_entries = tracer.final_log_queue()
    log_queue = QueueSimulator()
    log_queue.push_many([encode_log_query(q) for _, q in log_entries])

    # 2. demux
    demuxed = demux_log_queue(log_entries)

    # 3. memory queues (unsorted + sorted by (page, index, timestamp) — the
    # reference's memory sorting key, memory_query.rs:6-14)
    memory_queue = FullWidthQueueSimulator()
    memory_queue.push_many([encode_memory_query(q)
                            for _, q in tracer.memory_queries])
    sorted_mem = sorted((q for _, q in tracer.memory_queries),
                        key=memory_sorting_key)
    sorted_memory_queue = FullWidthQueueSimulator()
    sorted_memory_queue.push_many([encode_memory_query(q) for q in sorted_mem])

    # 4. dedups
    storage_qs = [q for _, q in demuxed["storage"]]
    _, dedup_storage = sort_storage_access_queries(storage_qs)
    dedup_ev = dedup_events([q for _, q in demuxed["events"]])
    dedup_l1 = dedup_events([q for _, q in demuxed["l1"]])

    # 5. per-circuit instance counts at geometry capacities
    g = geometry
    from ..witness.log_demux import compute_log_demux_artifacts
    from ..witness.sorters import compute_events_circuit_artifacts
    ev_art = compute_events_circuit_artifacts(
        [q for _, q in demuxed["events"]],
        g.cycles_per_events_or_l1_messages_sorter, circuit_type=11)
    l1_art = compute_events_circuit_artifacts(
        [q for _, q in demuxed["l1"]],
        g.cycles_per_events_or_l1_messages_sorter, circuit_type=12)
    demux_art = compute_log_demux_artifacts(
        [q for _, q in log_entries], g.cycles_per_log_demuxer)
    from ..witness.sorters import (compute_decommitts_circuit_artifacts,
                                   compute_storage_circuit_artifacts)
    decommitts_art = compute_decommitts_circuit_artifacts(
        [q for _, q in tracer.decommittment_queries],
        g.cycles_per_code_decommitter_sorter)
    storage_art = compute_storage_circuit_artifacts(
        storage_qs, g.cycles_per_storage_sorter)
    from ..witness.precompile_circuits import (
        compute_keccak_circuit_artifacts, compute_sha256_circuit_artifacts)
    keccak_art = compute_keccak_circuit_artifacts(
        [data for (_, q, data, _r) in tracer.precompile_calls
         if q.address == DefaultPrecompilesProcessor.KECCAK_ADDRESS],
        g.cycles_per_keccak256_circuit)
    sha256_art = compute_sha256_circuit_artifacts(
        [data for (_, q, data, _r) in tracer.precompile_calls
         if q.address == DefaultPrecompilesProcessor.SHA256_ADDRESS],
        g.cycles_per_sha256_circuit)
    from ..witness.linear_hasher import compute_hasher_circuit_artifacts
    hasher_art = compute_hasher_circuit_artifacts(
        dedup_l1, g.limit_for_l1_messages_pudata_hasher)
    from ..witness.decommitter import compute_code_decommitter_artifacts
    code_dec_art = compute_code_decommitter_artifacts(
        [q for _, q in tracer.decommittment_queries if q.is_fresh],
        tracer.decommitted_bytecodes)
    from ..prover.layers import main_vm_geometry_for_capacity
    from ..witness.main_vm import compute_main_vm_artifacts
    from ..witness.main_vm import crosscheck_query_binding
    _vm_geo = main_vm_geometry_for_capacity(g.cycles_per_vm_snapshot)
    main_vm_art = compute_main_vm_artifacts(tracer, _vm_geo,
                                            g.cycles_per_vm_snapshot)
    # cross-circuit glue: the MainVM accumulator PIs must re-derive from the
    # SAME traced query objects the RAM-permutation / log-demux circuits
    # consume (witness/main_vm.crosscheck_query_binding docstring)
    crosscheck_query_binding(tracer, _vm_geo, main_vm_art)
    from ..witness.ecrecover_witness import ecrecover_decompose
    ecrecover_art = ecrecover_decompose(
        [data for (_, q, data, _r) in tracer.precompile_calls
         if q.address == DefaultPrecompilesProcessor.ECRECOVER_ADDRESS],
        g.cycles_per_ecrecover_circuit)
    from ..witness.storage_application import (
        compute_storage_application_artifacts, storage_key_to_index)
    from ..witness.tree import SparseStorageTree
    pre_tree = SparseStorageTree(depth=getattr(g, "storage_tree_depth", 256))
    for (shard, address, key), value in sorted(
            (initial_storage or {}).items()):
        if shard == 0 and value:
            pre_tree.insert_leaf(storage_key_to_index(address, key),
                                 int(value).to_bytes(32, "big"))
    storage_app_art = compute_storage_application_artifacts(
        pre_tree, dedup_storage, g.cycles_per_storage_application)
    counts = {
        BaseLayerCircuitType.MAIN_VM:
            (len(main_vm_art.instances) * g.cycles_per_vm_snapshot,
             g.cycles_per_vm_snapshot),
        BaseLayerCircuitType.CODE_DECOMMITTMENTS_SORTER:
            (len(tracer.decommittment_queries), g.cycles_per_code_decommitter_sorter),
        BaseLayerCircuitType.CODE_DECOMMITTER:
            (len(code_dec_art.instances) * g.cycles_per_code_decommitter,
             g.cycles_per_code_decommitter),
        BaseLayerCircuitType.LOG_DEMUXER:
            (len(demux_art.instances) * g.cycles_per_log_demuxer,
             g.cycles_per_log_demuxer),
        BaseLayerCircuitType.KECCAK_ROUND_FUNCTION:
            (len(keccak_art.instances) * g.cycles_per_keccak256_circuit,
             g.cycles_per_keccak256_circuit),
        BaseLayerCircuitType.SHA256_ROUND_FUNCTION:
            (len(sha256_art.instances) * g.cycles_per_sha256_circuit,
             g.cycles_per_sha256_circuit),
        BaseLayerCircuitType.ECRECOVER:
            (len(demuxed["ecrecover"]), g.cycles_per_ecrecover_circuit),
        BaseLayerCircuitType.RAM_PERMUTATION:
            (len(tracer.memory_queries), g.cycles_per_ram_permutation),
        BaseLayerCircuitType.STORAGE_SORTER:
            (len(storage_art.instances) * g.cycles_per_storage_sorter,
             g.cycles_per_storage_sorter),
        BaseLayerCircuitType.STORAGE_APPLICATION:
            (len(dedup_storage), g.cycles_per_storage_application),
        # events/L1 sorters: instance counts come from the decomposer's
        # SAFE-SPLIT boundaries (may exceed ceil(count/capacity))
        BaseLayerCircuitType.EVENTS_SORTER:
            (len(ev_art.instances) *
             g.cycles_per_events_or_l1_messages_sorter,
             g.cycles_per_events_or_l1_messages_sorter),
        BaseLayerCircuitType.L1_MESSAGES_SORTER:
            (len(l1_art.instances) *
             g.cycles_per_events_or_l1_messages_sorter,
             g.cycles_per_events_or_l1_messages_sorter),
        BaseLayerCircuitType.L1_MESSAGES_HASHER:
            (len(dedup_l1), g.limit_for_l1_messages_pudata_hasher),
    }
    per_circuit: Dict[int, PerCircuitArtifacts] = {}
    recursion_queues: Dict[int, RecursionQueueSimulator] = {}
    for ctype, (count, cap) in counts.items():
        n_inst = _instances_for(count, cap)
        per_circuit[int(ctype)] = PerCircuitArtifacts(
            queue=QueueSimulator(), num_instances=n_inst, capacity=cap)
        rq = RecursionQueueSimulator()
        for idx in range(n_inst):
            # public input placeholder: commitment filled by the prover when
            # the instance is proven (CircuitMaker parity,
            # postprocessing/mod.rs:94-420)
            rq.push_request(RecursionRequest(int(ctype), (idx, 0, 0, 0)))
        recursion_queues[int(ctype)] = rq

    ram_art = compute_ram_circuit_snapshots(
        [q for _, q in tracer.memory_queries], g.cycles_per_ram_permutation)

    from .callstack_sim import simulate_callstack
    callstack_wit = simulate_callstack(tracer)

    return BlockArtifacts(
        log_queue=log_queue, demuxed=demuxed, memory_queue=memory_queue,
        sorted_memory_queue=sorted_memory_queue,
        deduplicated_storage=dedup_storage, deduplicated_events=dedup_ev,
        deduplicated_l1_messages=dedup_l1, per_circuit=per_circuit,
        recursion_queues=recursion_queues, ram_permutation=ram_art,
        events_sorter=ev_art, l1_messages_sorter=l1_art,
        log_demuxer=demux_art, decommitts_sorter=decommitts_art,
        storage_sorter=storage_art, keccak_rounds=keccak_art,
        sha256_rounds=sha256_art, linear_hasher=hasher_art,
        code_decommitter=code_dec_art, main_vm=main_vm_art,
        ecrecover=ecrecover_art, storage_application=storage_app_art,
        callstack_witness=callstack_wit)
