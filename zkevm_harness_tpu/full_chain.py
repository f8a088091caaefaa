"""Full-chain block proving: block -> base -> leaf -> node -> scheduler ->
compression -> SNARK wrapper, every link a REAL proof of the previous link.

The basic_test analogue (reference:
src/tests/complex_tests/mod.rs:268-1142 — base loop :316-407, leaf
:529-647, node :797-945, scheduler :1081-1142, then wrap_proof,
src/proof_wrapper_utils/mod.rs:99-154). No mocks, no metadata tasks:

  1. the block executes and every selected base type's decomposer instances
     are proven with their real gate sets (verify-after-prove);
  2. per type, a LEAF circuit verifies that type's base proofs IN-CIRCUIT
     (circuits/leaf_circuit.py: shared VK transcript replay + recursion
     queue absorption) and is itself proven;
  3. a NODE circuit verifies the leaf proof in-circuit and re-exposes the
     spliced queue interval (circuits/node_circuit.py);
  4. the SCHEDULER circuit verifies every type's node proof in-circuit —
     heterogeneous shapes, one verifier slot per type — checks each queue
     was consumed from EMPTY, and emits the block commitment
     (circuits/scheduler_circuit.synthesize_scheduler_multi);
  5. compression mode 1..k verifies the scheduler proof in-circuit
     (prover/layers.CompressionChain), and the BN254 PLONK wrapper packs
     the scheduler commitment into the single L1 public input.

Scale knobs (the reference's testing-geometry analogue,
run_manually.rs:184-200): `chain_types` selects which base types feed the
recursion tower (production: all 13; CPU tests: narrow types — wide
circuits like keccak/storage-application verify in-circuit only at TPU
scale), and `base_cfg`/`recursion_cfg`/`compression_cfg` set the FRI
parameters (production: layer proof configs of circuits/types.py).

Cross-bindings asserted along the way:
  - every leaf tail equals the harness recursion queue tail for that type
    (the DAG's queue of REAL closed-form-input digests is what the leaf
    circuit recomputes in-circuit from the child proofs);
  - tampering any base proof makes the leaf circuit unsatisfiable
    (tests/test_full_chain.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

from . import harness
from .circuits import leaf_circuit as lc
from .circuits import node_circuit as nc
from .circuits import scheduler_circuit as sc
from .circuits.types import GeometryConfig, testing_geometry
from .ops import goldilocks as gl
from .prover import compression as cmp
from .prover import layers as ly
from .prover import plonkish as pk
from .utils import snark_wrapper as sw

P = gl.P


@dataclasses.dataclass
class StageProof:
    """One recursion-tower stage: the proof plus everything needed to
    verify it in-circuit one level up."""
    proof: pk.PlonkishProof
    vk: list
    ir: pk.PlonkishIR
    cfg: pk.PlonkishConfig


@dataclasses.dataclass
class FullChainResult:
    block: harness.BlockProvingResult
    chain_types: Tuple[int, ...]
    base_proofs: Dict[int, List[pk.PlonkishProof]]
    base_setups: Dict[int, ly.SetupData]
    leaves: Dict[int, StageProof]
    nodes: Dict[int, StageProof]
    scheduler: StageProof
    scheduler_pi: List[int]  # 4-lane block commitment
    final: Optional[dict]    # compression output + snark_public_input
    snark: Optional[dict]    # BN254 PLONK wrapper proof/vk


def prove_block_full_chain(code, chain_types: Sequence[int],
                           geometry: Optional[GeometryConfig] = None,
                           base_cfg: Optional[pk.PlonkishConfig] = None,
                           recursion_cfg: Optional[pk.PlonkishConfig] = None,
                           compression_cfg: Optional[pk.PlonkishConfig] = None,
                           compression_layers: int = 1,
                           contracts=None, cycle_limit: int = 10_000,
                           block_number: int = 1,
                           wrap: bool = True,
                           for_wrapper: bool = False,
                           progress=None, source=None) -> FullChainResult:
    """Prove one block through every layer. Returns the assembled tower;
    raises if any link fails verification. `source` (e.g. a
    LocalFileDataSource) receives every real proof in the reference's
    get/set naming scheme (complex_tests/mod.rs:588-592 resume protocol)."""
    geometry = geometry or testing_geometry()
    chain_types = tuple(sorted(int(t) for t in chain_types))
    assert 10 not in chain_types, \
        "type 10 proofs are read/write pairs; chain support is TPU-scale work"
    recursion_cfg = recursion_cfg or pk.PlonkishConfig(
        rate=2, cap_size=4, num_queries=2, final_fri_size=8)

    def say(msg):
        if progress:
            progress(msg)

    # -- 1. base layer ------------------------------------------------------
    with ly.engine_override(base_cfg):
        blk = harness.run_block(code, geometry=geometry, prove_mode="spot",
                                spot_types=chain_types, contracts=contracts,
                                cycle_limit=cycle_limit, source=source)
        base_setups = {t: ly.base_setup_for_type(t, geometry)
                       for t in chain_types}
    say("base layer proven")

    base_proofs: Dict[int, List[pk.PlonkishProof]] = {}
    for t in chain_types:
        n_inst = blk.artifacts.per_circuit[t].num_instances
        proofs = []
        for i in range(n_inst):
            rec = blk.source.get_base_layer_proof(t, i)
            assert rec is not None and rec.get("real"), \
                f"base type {t} instance {i} was not really proven"
            proofs.append(rec["proof"])
        assert proofs, f"base type {t} produced no instances for this block"
        assert len(proofs) <= 32, \
            "one leaf chunk per type at chain-test scale (production splits " \
            "at RECURSION_ARITY=32 via witness/recursion.create_leaf_witnesses)"
        base_proofs[t] = proofs

    # -- 2./3. leaf + node per type ------------------------------------------
    leaves: Dict[int, StageProof] = {}
    nodes: Dict[int, StageProof] = {}
    for t in chain_types:
        sd = base_setups[t]
        proofs = base_proofs[t]
        b, lay = lc.synthesize_leaf(sd.ir, sd.config, arity=len(proofs),
                                    base_circuit_type=t)
        built = b.finalize()
        W = b.fill_witness(lc.leaf_assignments(lay, sd.vk, proofs))
        setup = built.setup(recursion_cfg)
        leaf_proof = pk.prove(built.ir, setup, W, recursion_cfg)
        expect = lc.leaf_public_inputs(lay, sd.vk, proofs)
        assert [int(v) for v in leaf_proof.public_inputs] == \
            [int(v) % P for v in expect], "leaf PI mismatch"
        assert pk.verify(built.ir, setup.vk(), leaf_proof, recursion_cfg), \
            f"leaf proof for type {t} failed verification"
        # the in-circuit queue tail must equal the DAG's recursion queue
        # tail (real closed-form-input digests, harness.py real_payloads)
        rq_tail = tuple(int(v) % P
                        for v in blk.artifacts.recursion_queues[t].tail)
        got_tail = tuple(int(v) % P for v in leaf_proof.public_inputs[-12:])
        assert got_tail == rq_tail, \
            f"leaf tail diverged from the recursion queue for type {t}"
        leaves[t] = StageProof(proof=leaf_proof, vk=setup.vk(),
                               ir=built.ir, cfg=recursion_cfg)
        # replace the DAG's metadata record with the REAL proof (resume +
        # inspection read the data source, complex_tests/mod.rs:588-592)
        blk.source.set_leaf_layer_proof(leaf_proof, t, 0)
        say(f"leaf[{t}] proven over {len(proofs)} base proofs")

        nb, nlay = nc.synthesize_node(built.ir, recursion_cfg, arity=1)
        nbuilt = nb.finalize()
        nW = nb.fill_witness(nc.node_assignments(nlay, leaves[t].vk,
                                                 [leaf_proof]))
        nsetup = nbuilt.setup(recursion_cfg)
        node_proof = pk.prove(nbuilt.ir, nsetup, nW, recursion_cfg)
        nexpect = nc.node_public_inputs(nlay, leaves[t].vk, [leaf_proof])
        assert [int(v) for v in node_proof.public_inputs] == \
            [int(v) % P for v in nexpect], "node PI mismatch"
        assert pk.verify(nbuilt.ir, nsetup.vk(), node_proof, recursion_cfg), \
            f"node proof for type {t} failed verification"
        nodes[t] = StageProof(proof=node_proof, vk=nsetup.vk(),
                              ir=nbuilt.ir, cfg=recursion_cfg)
        blk.source.set_node_layer_proof(node_proof, t, 0, 0)
        say(f"node[{t}] proven")

    # -- 4. scheduler ---------------------------------------------------------
    aux = sc.scheduler_aux_values(blk.scheduler_witness)
    sb, slay = sc.synthesize_scheduler_multi(
        [(nodes[t].ir, nodes[t].cfg) for t in chain_types],
        type_ids=chain_types, aux_len=len(aux))
    sbuilt = sb.finalize()
    node_vks = [nodes[t].vk for t in chain_types]
    node_prfs = [nodes[t].proof for t in chain_types]
    sW = sb.fill_witness(sc.scheduler_multi_assignments(
        slay, node_vks, node_prfs, block_number, aux))
    ssetup = sbuilt.setup(recursion_cfg)
    sched_proof = pk.prove(sbuilt.ir, ssetup, sW, recursion_cfg)
    sched_pi = sc.scheduler_multi_public_inputs(slay, node_vks, node_prfs,
                                                block_number, aux)
    assert [int(v) for v in sched_proof.public_inputs] == \
        [int(v) % P for v in sched_pi], "scheduler PI mismatch"
    assert pk.verify(sbuilt.ir, ssetup.vk(), sched_proof, recursion_cfg), \
        "scheduler proof failed verification"
    scheduler = StageProof(proof=sched_proof, vk=ssetup.vk(),
                           ir=sbuilt.ir, cfg=recursion_cfg)
    say("scheduler proven (block commitment bound)")

    # -- 5. compression + SNARK wrapper --------------------------------------
    final = snark = None
    if wrap:
        outer_cfgs = ({m: compression_cfg
                       for m in range(1, compression_layers + 1)}
                      if compression_cfg is not None else None)
        # `for_wrapper` hashes the FINAL mode's trees/transcript with the
        # Bn256 Poseidon2 sponge (the reference always does; optional here
        # because the host-side Bn254 hashing adds minutes at CPU test
        # scale — test_compression covers the for-wrapper mode directly)
        chain = ly.CompressionChain(
            scheduler.ir, scheduler.cfg, scheduler.vk,
            outer_cfgs=outer_cfgs,
            wrapper_mode=compression_layers if for_wrapper else None)
        cfg = cmp.WrapperConfig(compression_layers=compression_layers)
        final = cmp.wrap_proof(sched_proof, sched_pi, cfg,
                               chain.prove_fn, chain.verify_fn,
                               source=blk.source)
        say("compression chain proven")
        wsetup = sw.wrapper_setup()
        snark_proof = sw.wrap_scheduler_pi(wsetup, sched_pi)
        assert sw.verify_wrapped_proof(wsetup.vk, snark_proof,
                                       expected_scheduler_pi=sched_pi), \
            "SNARK wrapper proof failed verification"
        assert int(snark_proof.public_inputs[-1]) == \
            int(final["snark_public_input"])
        snark = {"proof": snark_proof, "vk": wsetup.vk}
        say("SNARK wrapper proven")

    return FullChainResult(
        block=blk, chain_types=chain_types, base_proofs=base_proofs,
        base_setups=base_setups, leaves=leaves, nodes=nodes,
        scheduler=scheduler, scheduler_pi=sched_pi, final=final, snark=snark)
