"""Typed per-layer prover surface: setup/prove/verify per circuit type.

Parity with the 17 functions of src/prover_utils.rs (SURVEY L4):
`create_{base,recursive,compression,eip4844,compression_for_wrapper}
_layer_setup_data`, `prove_*_circuit`, `verify_*_proof` — realized over the
PLONKish engine with a circuit REGISTRY mapping circuit-type ids to their IR
+ setup builders (the reference's 13-variant enum dispatch,
prover_utils.rs:231-336, becomes a table).

Layer proof configs come from circuits/types.py (base/recursion lde 2 cap 16;
compression modes up to lde 4096 — the engine's `rate` is the lde factor).
Setup data is cached through the data source exactly like the reference
reuses setup per circuit type across instances (complex_tests/mod.rs:316-407).

Registered circuits (round 1): the flagship MainVM-shaped circuit as the
stand-in for the 13 base geometries until the zkEVM gate library lands, the
Poseidon2 permutation circuit, and the queue-commitment circuit. New gate
sets plug in by registering a factory — nothing else changes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

from ..circuits import decommitts_sorter_circuit as dscirc
from ..circuits import events_sorter_circuit as ecirc
from ..circuits import flagship as fl
from ..circuits import log_demux_circuit as dcirc
from ..circuits import poseidon2_circuit as p2c
from ..circuits import queue_circuit as qc
from ..circuits import decommitter_circuit as cdcirc
from ..circuits import ecrecover_circuit as eccirc
from ..circuits import ffarith as ffmod
from ..circuits import keccak_circuit as kcirc
from ..circuits import main_vm_circuit as mvcirc
from ..circuits import storage_application_circuit as sappcirc
from ..circuits import linear_hasher_circuit as lhcirc
from ..circuits import narrow_region as nrr_mod
from ..circuits import ram_permutation_circuit as rcirc
from ..circuits import sha256_circuit as shcirc
from ..circuits import storage_sorter_circuit as sscirc
from ..circuits.types import (BASE_LAYER_PROOF_CONFIG,
                              RECURSION_LAYER_PROOF_CONFIG, BaseLayerCircuitType,
                              ProofSystemConfig)
from . import plonkish as pk


@dataclasses.dataclass(frozen=True)
class CircuitFactory:
    make_ir: Callable[[], pk.PlonkishIR]
    make_setup: Callable[[pk.PlonkishIR, pk.PlonkishConfig], pk.PlonkishSetup]


def _flagship_factory(log_n: int, width: int) -> CircuitFactory:
    return CircuitFactory(
        make_ir=lambda: fl.flagship_ir(log_n=log_n, width=width),
        make_setup=lambda ir, cfg: fl.flagship_setup(ir, cfg))


def _poseidon_factory(log_n: int) -> CircuitFactory:
    return CircuitFactory(
        make_ir=lambda: p2c.poseidon2_ir(log_n),
        make_setup=lambda ir, cfg: p2c.poseidon2_setup(ir, cfg))


def _queue_factory(log_n: int) -> CircuitFactory:
    return CircuitFactory(
        make_ir=lambda: qc.queue_ir(log_n),
        make_setup=lambda ir, cfg: qc.queue_setup(ir, cfg))


# base-layer registry: types WITHOUT a real gate set route to the
# MainVM-shaped flagship stand-in; real circuits (REAL_BASE_CIRCUITS below)
# are served by their own setup/prove/verify adapters instead.
_TEST_LOG_N = 8
BASE_REGISTRY: Dict[int, CircuitFactory] = {
    int(t): _flagship_factory(_TEST_LOG_N, 16) for t in BaseLayerCircuitType
    if t not in (BaseLayerCircuitType.MAIN_VM,
                 BaseLayerCircuitType.CODE_DECOMMITTMENTS_SORTER,
                 BaseLayerCircuitType.CODE_DECOMMITTER,
                 BaseLayerCircuitType.LOG_DEMUXER,
                 BaseLayerCircuitType.KECCAK_ROUND_FUNCTION,
                 BaseLayerCircuitType.SHA256_ROUND_FUNCTION,
                 BaseLayerCircuitType.ECRECOVER,
                 BaseLayerCircuitType.RAM_PERMUTATION,
                 BaseLayerCircuitType.STORAGE_SORTER,
                 BaseLayerCircuitType.STORAGE_APPLICATION,
                 BaseLayerCircuitType.EVENTS_SORTER,
                 BaseLayerCircuitType.L1_MESSAGES_SORTER,
                 BaseLayerCircuitType.L1_MESSAGES_HASHER)
}
RECURSION_REGISTRY: Dict[int, CircuitFactory] = {
    1: _queue_factory(_TEST_LOG_N),     # scheduler stand-in
    2: _poseidon_factory(_TEST_LOG_N),  # node stand-in
}
for _leaf in range(3, 16):
    RECURSION_REGISTRY[_leaf] = _poseidon_factory(_TEST_LOG_N)


_ENGINE_OVERRIDE: Optional[pk.PlonkishConfig] = None


def _engine_config(psc: ProofSystemConfig) -> pk.PlonkishConfig:
    if _ENGINE_OVERRIDE is not None:
        return _ENGINE_OVERRIDE
    return pk.PlonkishConfig(rate=psc.lde_factor, cap_size=psc.merkle_cap_size,
                             num_queries=max(8, psc.security_bits // 2),
                             final_fri_size=32)


import contextlib


@contextlib.contextmanager
def engine_override(cfg: Optional[pk.PlonkishConfig]):
    """Run setup/prove/verify under an explicit engine config (reduced FRI
    parameters for CPU-scale full-chain tests; the reference's analogue is
    running under DevCSConfig / testing proof configs). Setup-cache keys
    include the active config, so overridden setups never collide with the
    production-config cache entries."""
    global _ENGINE_OVERRIDE
    prev = _ENGINE_OVERRIDE
    _ENGINE_OVERRIDE = cfg
    try:
        yield
    finally:
        _ENGINE_OVERRIDE = prev


def _cfg_key() -> tuple:
    c = _ENGINE_OVERRIDE
    if c is None:
        return ()
    return (c.rate, c.cap_size, c.num_queries, c.final_fri_size)


@dataclasses.dataclass
class SetupData:
    ir: pk.PlonkishIR
    setup: pk.PlonkishSetup
    vk: list
    config: pk.PlonkishConfig


_SETUP_CACHE: Dict[Tuple[str, int], SetupData] = {}


def _create_setup(layer: str, registry, circuit_type: int,
                  psc: ProofSystemConfig, source=None) -> SetupData:
    key = (layer, circuit_type) + _cfg_key()
    if key not in _SETUP_CACHE:
        factory = registry[circuit_type]
        ir = factory.make_ir()
        cfg = _engine_config(psc)
        setup = factory.make_setup(ir, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:  # record the VK even when the setup was cached
        if layer == "base":
            source.set_base_layer_vk(sd.vk, circuit_type)
        elif layer == "recursion":
            source.set_recursion_layer_vk(sd.vk, circuit_type)
    return sd


# -- the typed surface (reference prover_utils.rs function set) -------------

def create_base_layer_setup_data(circuit_type: int, source=None) -> SetupData:
    return _create_setup("base", BASE_REGISTRY, circuit_type,
                         BASE_LAYER_PROOF_CONFIG, source)


def prove_base_layer_circuit(circuit_type: int, witness, source=None):
    sd = create_base_layer_setup_data(circuit_type, source)
    return pk.prove(sd.ir, sd.setup, witness, sd.config)


def verify_base_layer_proof(circuit_type: int, proof, vk=None) -> bool:
    sd = create_base_layer_setup_data(circuit_type)
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def create_recursive_layer_setup_data(circuit_type: int, source=None) -> SetupData:
    return _create_setup("recursion", RECURSION_REGISTRY, circuit_type,
                         RECURSION_LAYER_PROOF_CONFIG, source)


def prove_recursion_layer_circuit(circuit_type: int, witness, source=None):
    sd = create_recursive_layer_setup_data(circuit_type, source)
    return pk.prove(sd.ir, sd.setup, witness, sd.config)


def verify_recursion_layer_proof(circuit_type: int, proof, vk=None) -> bool:
    sd = create_recursive_layer_setup_data(circuit_type)
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


# -- real base circuits: decomposer witness -> columns -> proof -------------
#
# Each entry maps a base circuit type to an adapter that turns the witness
# decomposer's per-instance payload into proven columns (the
# witness->synthesis path of prover_utils.rs:231-336). Types without an
# adapter still go through the flagship stand-in.

def ram_geometry_for_capacity(capacity: int) -> rcirc.RamGeometry:
    """Smallest trace covering `capacity` queries per instance: n >= 256 for
    the byte lookup table; sponge tiles sized so tiles*n/32 >= capacity and
    the dense region (capacity + 1 rows) still fits."""
    log_n = 8
    while True:
        n = 1 << log_n
        tiles = max(1, -(-capacity * rcirc.ROWS_PER_PERMUTATION // n))
        geo = rcirc.RamGeometry(log_n, tiles)
        if geo.capacity >= capacity and geo.capacity + 1 <= n:
            return geo
        log_n += 1


def ram_setup_data(capacity: int,
                   psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                   source=None) -> Tuple[SetupData, rcirc.RamGeometry]:
    geo = ram_geometry_for_capacity(capacity)
    key = ("base_ram", geo.log_n, geo.tiles_per_queue) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = rcirc.ram_ir(geo.log_n, geo.tiles_per_queue)
        cfg = _engine_config(psc)
        setup = rcirc.ram_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(sd.vk, int(BaseLayerCircuitType.RAM_PERMUTATION))
    return sd, geo


def prove_ram_instance(inst_w, challenges, capacity: int, source=None):
    """Prove ONE RamPermutationInstanceWitness from the decomposer; the
    proof's public inputs are checked against the instance payload before
    returning (expected-public-input assert,
    circuit_definitions/src/circuit_definitions/mod.rs:139-147)."""
    sd, geo = ram_setup_data(capacity, source=source)
    inst = rcirc.instance_inputs(inst_w, challenges)
    witness = rcirc.ram_witness(sd.ir, geo, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = rcirc.instance_public_inputs(geo, inst_w, challenges)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_ram_instance(inst_w, challenges, capacity: int, proof,
                        vk=None) -> bool:
    sd, geo = ram_setup_data(capacity)
    expected = rcirc.instance_public_inputs(geo, inst_w, challenges)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def events_geometry_for_capacity(capacity: int) -> ecirc.EventsGeometry:
    """Smallest events-sorter trace covering `capacity` elements per
    instance: n >= 256 for the byte table; 3 sponge regions of `tiles` tiles
    each (96 rows per element), one extra slot for the emission lag, and the
    dense region (capacity + 2 rows incl. the PI row) must fit."""
    log_n = 8
    while True:
        n = 1 << log_n
        slots_needed = capacity + 1
        ept = (n // ecirc.nrr.ROWS_PER_PERMUTATION) // ecirc.nrr.CHUNKS
        tiles = max(1, -(-slots_needed // ept))
        geo = ecirc.EventsGeometry(log_n, tiles)
        if geo.capacity >= capacity and geo.capacity + 2 <= n:
            return geo
        log_n += 1


def events_setup_data(capacity: int,
                      psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                      source=None, circuit_type: int = 11
                      ) -> Tuple[SetupData, ecirc.EventsGeometry]:
    geo = events_geometry_for_capacity(capacity)
    key = ("base_events", geo.log_n, geo.tiles) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = ecirc.events_ir(geo.log_n, geo.tiles)
        cfg = _engine_config(psc)
        setup = ecirc.events_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(sd.vk, int(circuit_type))
    return sd, geo


def prove_events_instance(inst_w, challenges, capacity: int, source=None,
                          circuit_type: int = 11):
    """Prove ONE EventsCircuitInstance from the decomposer (types 11/12 share
    the gate set; only the FS domain tag in the challenges differs)."""
    sd, geo = events_setup_data(capacity, source=source,
                                circuit_type=circuit_type)
    inst = ecirc.instance_inputs(inst_w, challenges)
    witness = ecirc.events_witness(sd.ir, geo, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = ecirc.instance_public_inputs(geo, inst_w, challenges)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_events_instance(inst_w, challenges, capacity: int, proof,
                           vk=None, circuit_type: int = 11) -> bool:
    sd, geo = events_setup_data(capacity, circuit_type=circuit_type)
    expected = ecirc.instance_public_inputs(geo, inst_w, challenges)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def decommitts_geometry_for_capacity(capacity: int
                                     ) -> dscirc.DecommittsGeometry:
    """Smallest decommitts-sorter trace covering `capacity` requests per
    instance (3 full-width strips, one 32-row block per request)."""
    log_n = 8
    while True:
        n = 1 << log_n
        tiles = max(1, -(-capacity * dscirc.ROWS_PER_PERMUTATION // n))
        geo = dscirc.DecommittsGeometry(log_n, tiles)
        if geo.capacity >= capacity and geo.capacity + 1 <= n:
            return geo
        log_n += 1


def decommitts_setup_data(capacity: int,
                          psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                          source=None
                          ) -> Tuple[SetupData, dscirc.DecommittsGeometry]:
    geo = decommitts_geometry_for_capacity(capacity)
    key = ("base_decommitts", geo.log_n, geo.tiles_per_queue) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = dscirc.decommitts_ir(geo.log_n, geo.tiles_per_queue)
        cfg = _engine_config(psc)
        setup = dscirc.decommitts_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(
            sd.vk, int(BaseLayerCircuitType.CODE_DECOMMITTMENTS_SORTER))
    return sd, geo


def prove_decommitts_instance(inst_w, challenges, capacity: int, source=None):
    """Prove ONE DecommittsCircuitInstance from the decomposer."""
    sd, geo = decommitts_setup_data(capacity, source=source)
    inst = dscirc.instance_inputs(inst_w, challenges)
    witness = dscirc.decommitts_witness(sd.ir, geo, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = dscirc.instance_public_inputs(geo, inst_w, challenges)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_decommitts_instance(inst_w, challenges, capacity: int, proof,
                               vk=None) -> bool:
    sd, geo = decommitts_setup_data(capacity)
    expected = dscirc.instance_public_inputs(geo, inst_w, challenges)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def demux_geometry_for_capacity(capacity: int) -> dcirc.DemuxGeometry:
    """Smallest demux trace covering `capacity` log queries per instance."""
    log_n = 8
    while True:
        n = 1 << log_n
        ept = (n // dcirc.nrr.ROWS_PER_PERMUTATION) // dcirc.nrr.CHUNKS
        tiles = max(1, -(-capacity // ept))
        geo = dcirc.DemuxGeometry(log_n, tiles)
        if geo.capacity >= capacity and geo.capacity + 1 <= n:
            return geo
        log_n += 1


def demux_setup_data(capacity: int,
                     psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                     source=None) -> Tuple[SetupData, dcirc.DemuxGeometry]:
    geo = demux_geometry_for_capacity(capacity)
    key = ("base_demux", geo.log_n, geo.tiles) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = dcirc.demux_ir(geo.log_n, geo.tiles)
        cfg = _engine_config(psc)
        setup = dcirc.demux_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(sd.vk, int(BaseLayerCircuitType.LOG_DEMUXER))
    return sd, geo


def prove_demux_instance(inst_w, capacity: int, source=None):
    sd, geo = demux_setup_data(capacity, source=source)
    witness = dcirc.demux_witness(sd.ir, geo, inst_w)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = dcirc.instance_public_inputs(geo, inst_w)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_demux_instance(inst_w, capacity: int, proof, vk=None) -> bool:
    sd, geo = demux_setup_data(capacity)
    expected = dcirc.instance_public_inputs(geo, inst_w)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def storage_geometry_for_capacity(capacity: int) -> sscirc.StorageGeometry:
    """Smallest storage-sorter trace covering `capacity` elements per
    instance (3 narrow regions, 96 rows per element, one emission-lag
    slot)."""
    log_n = 8
    while True:
        n = 1 << log_n
        slots_needed = capacity + 1
        ept = (n // nrr_mod.ROWS_PER_PERMUTATION) // nrr_mod.CHUNKS
        tiles = max(1, -(-slots_needed // max(1, ept)))
        geo = sscirc.StorageGeometry(log_n, tiles)
        if geo.capacity >= capacity and geo.capacity + 2 <= n:
            return geo
        log_n += 1


def storage_setup_data(capacity: int,
                       psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                       source=None
                       ) -> Tuple[SetupData, sscirc.StorageGeometry]:
    geo = storage_geometry_for_capacity(capacity)
    key = ("base_storage", geo.log_n, geo.tiles) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = sscirc.storage_ir(geo.log_n, geo.tiles)
        cfg = _engine_config(psc)
        setup = sscirc.storage_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(sd.vk,
                                 int(BaseLayerCircuitType.STORAGE_SORTER))
    return sd, geo


def prove_storage_instance(inst_w, challenges, capacity: int, source=None):
    """Prove ONE StorageCircuitInstance from the decomposer."""
    sd, geo = storage_setup_data(capacity, source=source)
    inst = sscirc.instance_inputs(inst_w, challenges)
    witness = sscirc.storage_witness(sd.ir, geo, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = sscirc.instance_public_inputs(geo, inst_w, challenges)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_storage_instance(inst_w, challenges, capacity: int, proof,
                            vk=None) -> bool:
    sd, geo = storage_setup_data(capacity)
    expected = sscirc.instance_public_inputs(geo, inst_w, challenges)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def keccak_geometry_for_capacity(capacity: int) -> kcirc.KeccakGeometry:
    """Smallest keccak trace covering `capacity` keccak-f invocations
    (32 rows each)."""
    log_n = 7
    while (1 << log_n) // kcirc.ROWS_PER_INVOCATION < capacity:
        log_n += 1
    return kcirc.KeccakGeometry(log_n)


def keccak_setup_data(capacity: int,
                      psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                      source=None) -> Tuple[SetupData, kcirc.KeccakGeometry]:
    geo = keccak_geometry_for_capacity(capacity)
    key = ("base_keccak", geo.log_n) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = kcirc.keccak_ir(geo.log_n)
        cfg = _engine_config(psc)
        setup = kcirc.keccak_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(
            sd.vk, int(BaseLayerCircuitType.KECCAK_ROUND_FUNCTION))
    return sd, geo


def prove_keccak_instance(inst_w, challenges_gammas, capacity: int,
                          source=None):
    """Prove ONE RoundFunctionInstanceWitness (type 5) from the decomposer."""
    sd, geo = keccak_setup_data(capacity, source=source)
    ch, gm = challenges_gammas
    inst = kcirc.instance_inputs(inst_w.invocations, ch, gm, inst_w.acc_in,
                                 inst_w.cnt_in)
    witness = kcirc.keccak_witness(sd.ir, geo, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = kcirc.instance_public_inputs(geo, inst_w, challenges_gammas)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_keccak_instance(inst_w, challenges_gammas, capacity: int, proof,
                           vk=None) -> bool:
    sd, geo = keccak_setup_data(capacity)
    expected = kcirc.instance_public_inputs(geo, inst_w, challenges_gammas)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def sha256_geometry_for_capacity(capacity: int) -> shcirc.Sha256Geometry:
    """Smallest sha256 trace covering `capacity` compressions (66 rows
    each)."""
    log_n = 8
    while (1 << log_n) // shcirc.ROWS_PER_INVOCATION < capacity:
        log_n += 1
    return shcirc.Sha256Geometry(log_n)


def sha256_setup_data(capacity: int,
                      psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                      source=None) -> Tuple[SetupData, shcirc.Sha256Geometry]:
    geo = sha256_geometry_for_capacity(capacity)
    key = ("base_sha256", geo.log_n) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = shcirc.sha256_ir(geo.log_n)
        cfg = _engine_config(psc)
        setup = shcirc.sha256_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(
            sd.vk, int(BaseLayerCircuitType.SHA256_ROUND_FUNCTION))
    return sd, geo


def prove_sha256_instance(inst_w, challenges_gammas, capacity: int,
                          source=None):
    """Prove ONE RoundFunctionInstanceWitness (type 6) from the decomposer."""
    sd, geo = sha256_setup_data(capacity, source=source)
    ch, gm = challenges_gammas
    inst = shcirc.instance_inputs(inst_w.invocations, ch, gm, inst_w.acc_in,
                                  inst_w.cnt_in)
    witness = shcirc.sha256_witness(sd.ir, geo, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = shcirc.instance_public_inputs(geo, inst_w, challenges_gammas)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_sha256_instance(inst_w, challenges_gammas, capacity: int, proof,
                           vk=None) -> bool:
    sd, geo = sha256_setup_data(capacity)
    expected = shcirc.instance_public_inputs(geo, inst_w, challenges_gammas)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def hasher_geometry_for_capacity(capacity: int) -> lhcirc.HasherGeometry:
    """Smallest hasher trace covering the keccak-f blocks of `capacity`
    serialized L1 messages (88 bytes each, one pad block)."""
    max_blocks = -(-(88 * capacity + 1) // 136)
    log_n = 5
    while (1 << log_n) // lhcirc.ROWS_PER_INVOCATION < max_blocks:
        log_n += 1
    return lhcirc.HasherGeometry(log_n)


def hasher_setup_data(capacity: int,
                      psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                      source=None) -> Tuple[SetupData, lhcirc.HasherGeometry]:
    geo = hasher_geometry_for_capacity(capacity)
    key = ("base_hasher", geo.log_n) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = lhcirc.hasher_ir(geo.log_n)
        cfg = _engine_config(psc)
        setup = lhcirc.hasher_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(
            sd.vk, int(BaseLayerCircuitType.L1_MESSAGES_HASHER))
    return sd, geo


def prove_hasher_instance(inst, capacity: int, source=None):
    """Prove ONE HasherInstanceInputs (type 13): in-circuit keccak256 of
    the serialized L1-message stream."""
    sd, geo = hasher_setup_data(capacity, source=source)
    witness = lhcirc.hasher_witness(sd.ir, geo, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = lhcirc.expected_public_inputs(geo, inst)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_hasher_instance(inst, capacity: int, proof, vk=None) -> bool:
    sd, geo = hasher_setup_data(capacity)
    expected = lhcirc.expected_public_inputs(geo, inst)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def code_decommitter_geometry_for_capacity(capacity: int
                                           ) -> cdcirc.DecommitterGeometry:
    """Smallest decommitter trace covering the sha256 blocks of `capacity`
    32-byte bytecode words (+ padding block)."""
    max_blocks = -(-(32 * capacity + 9) // 64)
    log_n = 7
    while (1 << log_n) // cdcirc.ROWS_PER_INVOCATION < max_blocks:
        log_n += 1
    return cdcirc.DecommitterGeometry(log_n)


def code_decommitter_setup_data(
        capacity: int, psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
        source=None) -> Tuple[SetupData, cdcirc.DecommitterGeometry]:
    geo = code_decommitter_geometry_for_capacity(capacity)
    key = ("base_code_decommitter", geo.log_n) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = cdcirc.decommitter_ir(geo.log_n)
        cfg = _engine_config(psc)
        setup = cdcirc.decommitter_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(
            sd.vk, int(BaseLayerCircuitType.CODE_DECOMMITTER))
    return sd, geo


def prove_code_decommitter_instance(inst, capacity: int, source=None):
    """Prove ONE DecommitterInstanceInputs (type 3): in-circuit sha256 of
    one fresh bytecode."""
    sd, geo = code_decommitter_setup_data(capacity, source=source)
    witness = cdcirc.decommitter_witness(sd.ir, geo, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = cdcirc.expected_public_inputs(geo, inst)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_code_decommitter_instance(inst, capacity: int, proof,
                                     vk=None) -> bool:
    sd, geo = code_decommitter_setup_data(capacity)
    expected = cdcirc.expected_public_inputs(geo, inst)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def main_vm_geometry_for_capacity(capacity: int,
                                  limb_bits: int = 8) -> mvcirc.VmGeometry:
    """Smallest MainVM trace covering `capacity` cycles per instance
    (and the 2^limb_bits range table). Registers are FULL u256: 32 u8
    limbs here (CPU-testable range table); production uses 16 u16 limbs
    at 2^16+ rows."""
    log_n = max(limb_bits, 4)
    while (1 << log_n) < capacity:
        log_n += 1
    return mvcirc.VmGeometry(log_n, limb_bits=limb_bits,
                             num_limbs=256 // limb_bits)


def main_vm_setup_data(capacity: int,
                       psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                       source=None) -> Tuple[SetupData, mvcirc.VmGeometry]:
    geo = main_vm_geometry_for_capacity(capacity)
    key = ("base_main_vm", geo.log_n, geo.limb_bits) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = mvcirc.main_vm_ir(geo)
        cfg = _engine_config(psc)
        setup = mvcirc.main_vm_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(sd.vk, int(BaseLayerCircuitType.MAIN_VM))
    return sd, geo


def prove_main_vm_instance(inst, capacity: int, source=None):
    """Prove ONE VmCircuitInstance (type 1): the block's actual per-cycle
    execution trace."""
    sd, geo = main_vm_setup_data(capacity, source=source)
    witness = mvcirc.main_vm_witness(sd.ir, geo, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = mvcirc.expected_public_inputs(geo, inst)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_main_vm_instance(inst, capacity: int, proof, vk=None) -> bool:
    sd, geo = main_vm_setup_data(capacity)
    expected = mvcirc.expected_public_inputs(geo, inst)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof, sd.config)


def _ecrecover_program():
    key = ("ecrecover_prog",)
    if key not in _SETUP_CACHE:
        curve = eccirc.secp256k1_params(limb_bits=8)
        _SETUP_CACHE[key] = eccirc.build_ecrecover_program(curve)
    return _SETUP_CACHE[key]


def ecrecover_setup_data(psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                         source=None):
    """Type-7 setup: one full secp256k1 recovery program per proof
    (production scale: ~37k rows at u8 limbs; proving runs on TPU)."""
    eprog = _ecrecover_program()
    key = ("base_ecrecover", eprog.layout.log_n) + _cfg_key()
    if key not in _SETUP_CACHE:
        cfg = _engine_config(psc)
        ir, setup = ffmod.ff_setup(eprog.layout, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(sd.vk, int(BaseLayerCircuitType.ECRECOVER))
    return sd, eprog


def _lift_r_point(r: int, v: int) -> int:
    """y of the lifted R = (r, y) with parity v on secp256k1."""
    p = eccirc.SECP_P
    y = pow((r * r * r + 7) % p, (p + 1) // 4, p)
    assert y * y % p == (r * r * r + 7) % p, "r is not an x-coordinate"
    return y if (y & 1) == (int(v) & 1) else p - y


def prove_ecrecover_invocation(inv, source=None):
    """Prove ONE EcrecoverInvocation (type 7) at full secp256k1 scale."""
    sd, eprog = ecrecover_setup_data(source=source)
    h = int.from_bytes(inv.msg_hash, "big") % eccirc.SECP_N
    ry = _lift_r_point(inv.r, inv.v)
    witness = eccirc.ecrecover_witness(
        eprog, sd.ir, h, inv.r % eccirc.SECP_N, inv.s % eccirc.SECP_N,
        inv.recovered_point, ry)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = eccirc.expected_public_inputs(
        eprog, h, inv.r % eccirc.SECP_N, inv.s % eccirc.SECP_N,
        inv.recovered_point)
    assert [int(x) for x in proof.public_inputs] == \
        [int(x) % pk.gl.P for x in expected], "instance PI mismatch"
    return proof


def verify_ecrecover_invocation(inv, proof, vk=None) -> bool:
    sd, eprog = ecrecover_setup_data()
    h = int.from_bytes(inv.msg_hash, "big") % eccirc.SECP_N
    expected = eccirc.expected_public_inputs(
        eprog, h, inv.r % eccirc.SECP_N, inv.s % eccirc.SECP_N,
        inv.recovered_point)
    if [int(x) for x in proof.public_inputs] != \
            [int(x) % pk.gl.P for x in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof,
                     sd.config)


def storage_application_setup_data(
        psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG, source=None,
        depth: int = 256) -> Tuple[SetupData, sappcirc.PathGeometry]:
    """Type-10 setup: one Blake2s path per proof at the state-tree depth
    (production 256: 3084 rows x ~2.9k columns, proving runs on TPU;
    reduced depths are the testing-geometry analogue)."""
    geo = sappcirc.PathGeometry(depth=depth)
    key = ("base_storage_app", depth, geo.log_n) + _cfg_key()
    if key not in _SETUP_CACHE:
        ir = sappcirc.path_ir(geo)
        cfg = _engine_config(psc)
        setup = sappcirc.path_setup(ir, geo, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    if source is not None:
        source.set_base_layer_vk(
            sd.vk, int(BaseLayerCircuitType.STORAGE_APPLICATION))
    return sd, geo


def prove_storage_application_path(inst, source=None):
    """Prove ONE PathInstanceInputs (type 10): a Blake2s Merkle opening of
    the state tree at the instance's depth (production 256)."""
    sd, geo = storage_application_setup_data(source=source,
                                             depth=len(inst.path_bits))
    witness = sappcirc.path_witness(sd.ir, geo, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = sappcirc.expected_public_inputs(geo, inst)
    assert [int(x) for x in proof.public_inputs] == \
        [int(x) % pk.gl.P for x in expected], "instance PI mismatch"
    return proof


@dataclasses.dataclass
class StorageApplicationQueryProof:
    """Read+write path proofs for one storage query (the reference proves
    both directions of the tree update inside one instance)."""
    read: object
    write: object

    @property
    def public_inputs(self):
        return list(self.read.public_inputs) + list(self.write.public_inputs)


def prove_storage_application_query(pair, source=None
                                    ) -> StorageApplicationQueryProof:
    read_inst, write_inst = pair
    return StorageApplicationQueryProof(
        read=prove_storage_application_path(read_inst, source),
        write=prove_storage_application_path(write_inst))


def verify_storage_application_query(pair, qproof) -> bool:
    read_inst, write_inst = pair
    return (verify_storage_application_path(read_inst, qproof.read)
            and verify_storage_application_path(write_inst, qproof.write))


def verify_storage_application_path(inst, proof, vk=None) -> bool:
    sd, geo = storage_application_setup_data(depth=len(inst.path_bits))
    expected = sappcirc.expected_public_inputs(geo, inst)
    if [int(x) for x in proof.public_inputs] != \
            [int(x) % pk.gl.P for x in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof,
                     sd.config)


def create_eip4844_setup_data(n_elements: int = 4096, limb_bits: int = 8,
                              psc: ProofSystemConfig = BASE_LAYER_PROOF_CONFIG,
                              source=None):
    """EIP-4844 typed surface (prover_utils.rs eip4844 analogue): setup for
    the blob-fold circuit at `n_elements` chunks."""
    key = ("eip4844", n_elements, limb_bits) + _cfg_key()
    if key not in _SETUP_CACHE:
        from ..circuits import eip4844_circuit as e4
        prog = e4.build_eip4844_program(n_elements, limb_bits=limb_bits)
        cfg = _engine_config(psc)
        ir, setup = ffmod.ff_setup(prog.layout, cfg)
        sd = SetupData(ir=ir, setup=setup, vk=setup.vk(), config=cfg)
        _SETUP_CACHE[key] = (sd, prog)
    sd, prog = _SETUP_CACHE[key]
    if source is not None and hasattr(source, "set_eip4844_vk"):
        source.set_eip4844_vk(sd.vk)
    return sd, prog


def prove_eip4844(elements, x: int, n_elements: int = 4096,
                  limb_bits: int = 8, source=None):
    """Prove the blob-opening fold for one blob (reference: prove_eip4844,
    src/prover_utils.rs eip4844 surface)."""
    from ..circuits import eip4844_circuit as e4
    sd, prog = create_eip4844_setup_data(n_elements, limb_bits,
                                         source=source)
    inst = e4.instance_inputs(elements, x)
    witness = e4.eip4844_witness(prog, sd.ir, inst)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    expected = e4.expected_public_inputs(prog, inst)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected], "instance PI mismatch"
    return proof


def verify_eip4844(elements, x: int, proof, n_elements: int = 4096,
                   limb_bits: int = 8, vk=None) -> bool:
    from ..circuits import eip4844_circuit as e4
    sd, prog = create_eip4844_setup_data(n_elements, limb_bits)
    inst = e4.instance_inputs(elements, x)
    expected = e4.expected_public_inputs(prog, inst)
    if [int(v) for v in proof.public_inputs] != \
            [int(v) % pk.gl.P for v in expected]:
        return False
    return pk.verify(sd.ir, vk if vk is not None else sd.vk, proof,
                     sd.config)


REAL_BASE_CIRCUITS = {int(BaseLayerCircuitType.MAIN_VM),
                      int(BaseLayerCircuitType.CODE_DECOMMITTMENTS_SORTER),
                      int(BaseLayerCircuitType.CODE_DECOMMITTER),
                      int(BaseLayerCircuitType.LOG_DEMUXER),
                      int(BaseLayerCircuitType.KECCAK_ROUND_FUNCTION),
                      int(BaseLayerCircuitType.SHA256_ROUND_FUNCTION),
                      int(BaseLayerCircuitType.ECRECOVER),
                      int(BaseLayerCircuitType.RAM_PERMUTATION),
                      int(BaseLayerCircuitType.STORAGE_SORTER),
                      int(BaseLayerCircuitType.STORAGE_APPLICATION),
                      int(BaseLayerCircuitType.EVENTS_SORTER),
                      int(BaseLayerCircuitType.L1_MESSAGES_SORTER),
                      int(BaseLayerCircuitType.L1_MESSAGES_HASHER)}


def real_base_instance_public_inputs(ctype: int, inst_w, challenges,
                                     capacity: int):
    """Expected public inputs of a REAL base circuit instance — computable
    from the decomposer payload alone (before proving), which is what lets
    the recursion queues carry real PI commitments (the reference's
    CircuitMaker simulates the commitment the same way,
    src/witness/utils.rs:269-308)."""
    if ctype == int(BaseLayerCircuitType.CODE_DECOMMITTMENTS_SORTER):
        return dscirc.instance_public_inputs(
            decommitts_geometry_for_capacity(capacity), inst_w, challenges)
    if ctype == int(BaseLayerCircuitType.LOG_DEMUXER):
        return dcirc.instance_public_inputs(
            demux_geometry_for_capacity(capacity), inst_w)
    if ctype == int(BaseLayerCircuitType.RAM_PERMUTATION):
        return rcirc.instance_public_inputs(
            ram_geometry_for_capacity(capacity), inst_w, challenges)
    if ctype == int(BaseLayerCircuitType.STORAGE_SORTER):
        return sscirc.instance_public_inputs(
            storage_geometry_for_capacity(capacity), inst_w, challenges)
    if ctype in (int(BaseLayerCircuitType.EVENTS_SORTER),
                 int(BaseLayerCircuitType.L1_MESSAGES_SORTER)):
        return ecirc.instance_public_inputs(
            events_geometry_for_capacity(capacity), inst_w, challenges)
    if ctype == int(BaseLayerCircuitType.KECCAK_ROUND_FUNCTION):
        return kcirc.instance_public_inputs(
            keccak_geometry_for_capacity(capacity), inst_w, challenges)
    if ctype == int(BaseLayerCircuitType.SHA256_ROUND_FUNCTION):
        return shcirc.instance_public_inputs(
            sha256_geometry_for_capacity(capacity), inst_w, challenges)
    if ctype == int(BaseLayerCircuitType.L1_MESSAGES_HASHER):
        return lhcirc.expected_public_inputs(
            hasher_geometry_for_capacity(capacity), inst_w)
    if ctype == int(BaseLayerCircuitType.CODE_DECOMMITTER):
        return cdcirc.expected_public_inputs(
            code_decommitter_geometry_for_capacity(capacity), inst_w)
    if ctype == int(BaseLayerCircuitType.MAIN_VM):
        return mvcirc.expected_public_inputs(
            main_vm_geometry_for_capacity(capacity), inst_w)
    if ctype == int(BaseLayerCircuitType.ECRECOVER):
        inv = inst_w.invocations[0]
        h = int.from_bytes(inv.msg_hash, "big") % eccirc.SECP_N
        return eccirc.expected_public_inputs(
            _ecrecover_program(), h, inv.r % eccirc.SECP_N,
            inv.s % eccirc.SECP_N, inv.recovered_point)
    if ctype == int(BaseLayerCircuitType.STORAGE_APPLICATION):
        # instances are individual PATHS (read/write flattened) so the
        # recursion tower can verify each as one proof slot
        geo = sappcirc.PathGeometry(depth=len(inst_w.path_bits))
        return sappcirc.expected_public_inputs(geo, inst_w)
    raise KeyError(ctype)


def base_setup_for_type(ctype: int, geometry) -> SetupData:
    """The SetupData (inner ir/setup/vk/engine config) that
    prove_*_instance uses for `ctype` at this geometry — the single
    accessor the recursion layers need to verify base proofs in-circuit
    (the reference passes base VKs into create_leaf_witnesses,
    recursive_aggregation.rs:71-161)."""
    g = geometry
    if ctype == 1:
        return main_vm_setup_data(g.cycles_per_vm_snapshot)[0]
    if ctype == 2:
        return decommitts_setup_data(g.cycles_per_code_decommitter_sorter)[0]
    if ctype == 3:
        return code_decommitter_setup_data(g.cycles_per_code_decommitter)[0]
    if ctype == 4:
        return demux_setup_data(g.cycles_per_log_demuxer)[0]
    if ctype == 5:
        return keccak_setup_data(g.cycles_per_keccak256_circuit)[0]
    if ctype == 6:
        return sha256_setup_data(g.cycles_per_sha256_circuit)[0]
    if ctype == 7:
        return ecrecover_setup_data()[0]
    if ctype == 8:
        return ram_setup_data(g.cycles_per_ram_permutation)[0]
    if ctype == 9:
        return storage_setup_data(g.cycles_per_storage_sorter)[0]
    if ctype == 10:
        return storage_application_setup_data(
            depth=getattr(g, "storage_tree_depth", 256))[0]
    if ctype in (11, 12):
        return events_setup_data(g.cycles_per_events_or_l1_messages_sorter,
                                 circuit_type=ctype)[0]
    if ctype == 13:
        return hasher_setup_data(g.limit_for_l1_messages_pudata_hasher)[0]
    raise KeyError(ctype)


# -- compression layer: REAL in-circuit verifier proofs ---------------------
#
# Mode k's circuit verifies the previous layer's proof in-circuit
# (reference: aux_layer/compression_modes/mode_{1..5}.rs + the
# create/prove/verify_compression_layer_* surface, prover_utils.rs:566-711).
# The circuit is the synthesized verifier (circuits/verifier_circuit.py);
# mode 1's inner is the scheduler proof, mode k>1's inner is mode k-1's
# circuit — so the whole chain is real, each link a proof-of-verification.

@dataclasses.dataclass
class CompressionSetup:
    sd: SetupData
    builder: object
    layout: object


def compression_engine_config(mode: int) -> pk.PlonkishConfig:
    from ..circuits.types import COMPRESSION_PROOF_CONFIGS, CompressionMode
    return _engine_config(COMPRESSION_PROOF_CONFIGS[CompressionMode(mode)])


def create_compression_layer_setup_data(
        mode: int, inner_ir: pk.PlonkishIR, inner_cfg: pk.PlonkishConfig,
        outer_cfg: Optional[pk.PlonkishConfig] = None) -> CompressionSetup:
    from ..circuits import verifier_circuit as vc
    outer_cfg = outer_cfg or compression_engine_config(mode)
    key = ("compression", mode, inner_ir.log_n, inner_ir.num_witness,
           inner_cfg.rate, inner_cfg.cap_size, inner_cfg.num_queries,
           inner_cfg.final_fri_size, outer_cfg.rate, outer_cfg.num_queries)
    if key not in _SETUP_CACHE:
        b, lay = vc.synthesize_verifier(inner_ir, inner_cfg, slots=8)
        built = b.finalize()
        setup = built.setup(outer_cfg)
        sd = SetupData(ir=built.ir, setup=setup, vk=setup.vk(),
                       config=outer_cfg)
        _SETUP_CACHE[key] = CompressionSetup(sd=sd, builder=b, layout=lay)
    return _SETUP_CACHE[key]


def prove_compression_layer_circuit(
        mode: int, inner_ir: pk.PlonkishIR, inner_cfg: pk.PlonkishConfig,
        inner_vk, inner_proof,
        outer_cfg: Optional[pk.PlonkishConfig] = None):
    from ..circuits import verifier_circuit as vc
    cs = create_compression_layer_setup_data(mode, inner_ir, inner_cfg,
                                             outer_cfg)
    asg = vc.verifier_assignments(cs.layout, inner_vk, inner_proof)
    witness = cs.builder.fill_witness(asg)
    proof = pk.prove(cs.sd.ir, cs.sd.setup, witness, cs.sd.config)
    expected = vc.verifier_public_inputs(inner_vk, inner_proof)
    assert [int(v) for v in proof.public_inputs] == expected, \
        "compression PI mismatch (inner vk + inner public inputs)"
    return proof


def verify_compression_layer_proof(
        mode: int, inner_ir: pk.PlonkishIR, inner_cfg: pk.PlonkishConfig,
        proof, vk=None, expected_inner_vk=None,
        outer_cfg: Optional[pk.PlonkishConfig] = None) -> bool:
    cs = create_compression_layer_setup_data(mode, inner_ir, inner_cfg,
                                             outer_cfg)
    if expected_inner_vk is not None:
        k = len(expected_inner_vk)
        if [int(v) for v in proof.public_inputs[:k]] != \
                [int(v) % pk.gl.P for v in expected_inner_vk]:
            return False
    return pk.verify(cs.sd.ir, vk if vk is not None else cs.sd.vk, proof,
                     cs.sd.config)


class CompressionChain:
    """Pluggable prove/verify pair for compression.compute_compression_circuits
    where every mode is a REAL proof-of-verification of the previous layer."""

    def __init__(self, scheduler_ir: pk.PlonkishIR,
                 scheduler_cfg: pk.PlonkishConfig, scheduler_vk,
                 outer_cfgs: Optional[Dict[int, pk.PlonkishConfig]] = None,
                 wrapper_mode: Optional[int] = None):
        """`wrapper_mode` routes that mode through the compression-FOR-
        WRAPPER path (Bn256 Poseidon2 trees/transcript) — the reference's
        final mode before the SNARK (WrapperConfig.get_final_compression_
        type, proof_wrapper_utils/mod.rs:88-92)."""
        self._inner: Dict[int, Tuple] = {
            1: (scheduler_ir, scheduler_cfg, scheduler_vk)}
        self._outer_cfgs = outer_cfgs or {}
        self._wrapper_mode = wrapper_mode

    def _outer(self, mode: int) -> Optional[pk.PlonkishConfig]:
        return self._outer_cfgs.get(mode)

    def prove_fn(self, mode: int, prev_proof):
        ir, cfg, vk = self._inner[mode]
        if mode == self._wrapper_mode:
            fw = create_compression_for_wrapper_setup_data(
                mode, ir, cfg, self._outer(mode))
            proof = prove_compression_for_wrapper_circuit(
                mode, ir, cfg, vk, prev_proof, self._outer(mode))
            self._inner[mode + 1] = (fw.sd.ir, fw.sd.config, fw.vk_fr)
            return proof, fw.vk_fr
        cs = create_compression_layer_setup_data(mode, ir, cfg,
                                                 self._outer(mode))
        proof = prove_compression_layer_circuit(mode, ir, cfg, vk, prev_proof,
                                                self._outer(mode))
        self._inner[mode + 1] = (cs.sd.ir, cs.sd.config, cs.sd.vk)
        return proof, cs.sd.vk

    def verify_fn(self, mode: int, proof, vk) -> bool:
        ir, cfg, inner_vk = self._inner[mode]
        if mode == self._wrapper_mode:
            return verify_compression_for_wrapper_proof(
                mode, ir, cfg, proof, vk, expected_inner_vk=inner_vk,
                outer_cfg=self._outer(mode))
        return verify_compression_layer_proof(
            mode, ir, cfg, proof, vk, expected_inner_vk=inner_vk,
            outer_cfg=self._outer(mode))

    def final_shape(self, final_mode: int):
        """(ir, cfg, vk) of the FINAL mode's own circuit — what the SNARK
        wrapper verifies (populated by prove_fn(final_mode, ...))."""
        return self._inner[final_mode + 1]


# -- compression FOR WRAPPER: Bn256-Poseidon2-hashed final mode -------------
#
# The reference's last compression step re-proves the same verifier circuit
# with the FRI trees and transcript hashed by a Bn256 Poseidon2 sponge, so
# the BN254 PLONK WrapperCircuit can consume the proof with native-field
# hash gates (create/prove/verify_compression_for_wrapper_*,
# src/prover_utils.rs:823-967; hasher types proof_wrapper_utils/mod.rs:30-31).

@dataclasses.dataclass
class ForWrapperSetup:
    sd: SetupData          # ir + polynomial setup (hash-independent)
    builder: object
    layout: object
    backend: object        # hash_backend.Bn254Backend
    vk_fr: list            # Bn254 cap of the setup tree (THE for-wrapper VK)
    setup_tree: object     # Bn254Tree over the setup LDE


def for_wrapper_engine_config(mode: int) -> pk.PlonkishConfig:
    from ..circuits.types import (COMPRESSION_FOR_WRAPPER_PROOF_CONFIGS,
                                  CompressionMode)
    return _engine_config(
        COMPRESSION_FOR_WRAPPER_PROOF_CONFIGS[CompressionMode(mode)])


def create_compression_for_wrapper_setup_data(
        mode: int, inner_ir: pk.PlonkishIR, inner_cfg: pk.PlonkishConfig,
        outer_cfg: Optional[pk.PlonkishConfig] = None) -> ForWrapperSetup:
    from ..circuits import verifier_circuit as vc
    from ..ops import ntt as nt
    from . import hash_backend as hb
    outer_cfg = outer_cfg or for_wrapper_engine_config(mode)
    key = ("compression_fw", mode, inner_ir.log_n, inner_ir.num_witness,
           inner_cfg.rate, inner_cfg.cap_size, inner_cfg.num_queries,
           inner_cfg.final_fri_size, outer_cfg.rate, outer_cfg.num_queries)
    if key not in _SETUP_CACHE:
        b, lay = vc.synthesize_verifier(inner_ir, inner_cfg, slots=8)
        built = b.finalize()
        setup = built.setup(outer_cfg)
        backend = hb.Bn254Backend()
        setup_cols = pk.gl.concatenate(
            [setup.const_cols, setup.sigma_cols, setup.table_cols], axis=0)
        setup_lde = nt.coset_lde(setup_cols, outer_cfg.rate)
        tree = backend.commit_rows(pk.gl.to_ints(setup_lde).T,
                                   outer_cfg.cap_size)
        sd = SetupData(ir=built.ir, setup=setup, vk=list(tree.cap),
                       config=outer_cfg)
        _SETUP_CACHE[key] = ForWrapperSetup(
            sd=sd, builder=b, layout=lay, backend=backend,
            vk_fr=list(tree.cap), setup_tree=tree)
    return _SETUP_CACHE[key]


def prove_compression_for_wrapper_circuit(
        mode: int, inner_ir: pk.PlonkishIR, inner_cfg: pk.PlonkishConfig,
        inner_vk, inner_proof,
        outer_cfg: Optional[pk.PlonkishConfig] = None):
    from ..circuits import verifier_circuit as vc
    fw = create_compression_for_wrapper_setup_data(mode, inner_ir,
                                                   inner_cfg, outer_cfg)
    asg = vc.verifier_assignments(fw.layout, inner_vk, inner_proof)
    witness = fw.builder.fill_witness(asg)
    proof = pk.prove(fw.sd.ir, fw.sd.setup, witness, fw.sd.config,
                     backend=fw.backend,
                     backend_setup=(fw.vk_fr, fw.setup_tree))
    expected = vc.verifier_public_inputs(inner_vk, inner_proof)
    assert [int(v) for v in proof.public_inputs] == expected, \
        "for-wrapper PI mismatch (inner vk + inner public inputs)"
    return proof


def verify_compression_for_wrapper_proof(
        mode: int, inner_ir: pk.PlonkishIR, inner_cfg: pk.PlonkishConfig,
        proof, vk=None, expected_inner_vk=None,
        outer_cfg: Optional[pk.PlonkishConfig] = None) -> bool:
    fw = create_compression_for_wrapper_setup_data(mode, inner_ir,
                                                   inner_cfg, outer_cfg)
    if expected_inner_vk is not None:
        k = len(expected_inner_vk)
        if [int(v) for v in proof.public_inputs[:k]] != \
                [int(v) % pk.gl.P for v in expected_inner_vk]:
            return False
    return pk.verify(fw.sd.ir, vk if vk is not None else fw.vk_fr, proof,
                     fw.sd.config, backend=fw.backend)


# -- real leaf queue-segment proofs ----------------------------------------

def prove_leaf_queue_segment(task, cfg: Optional[pk.PlonkishConfig] = None):
    """Prove a leaf task's queue-segment statement with the queue-commitment
    circuit: PIs bind the chunk's head tail and resulting tail, so the node
    layer can check queue continuity against proven values.

    Requires a power-of-two item count (full ARITY chunks in production; the
    remainder chunk keeps metadata-only until selector-gated absorption
    lands). This is the queue-statement HALF of a leaf only: the full leaf —
    in-circuit verification of the child proofs — is circuits/leaf_circuit.py.
    """
    k = len(task.encodings)
    assert k >= 1 and k & (k - 1) == 0, "segment length must be a power of two"
    log_n = (k * qc.ROWS_PER_PERMUTATION).bit_length() - 1
    ir = qc.queue_ir(log_n)
    cfg = cfg or _engine_config(RECURSION_LAYER_PROOF_CONFIG)
    key = ("leaf_queue", log_n, cfg.rate, cfg.cap_size)
    if key not in _SETUP_CACHE:
        setup = qc.queue_setup(ir, cfg)
        _SETUP_CACHE[key] = SetupData(ir=ir, setup=setup, vk=setup.vk(),
                                      config=cfg)
    sd = _SETUP_CACHE[key]
    encs = [[int(v) for v in row] for row in task.encodings]
    witness = qc.queue_witness(sd.ir, encs, head=task.queue_head)
    proof = pk.prove(sd.ir, sd.setup, witness, sd.config)
    # the proven PIs must equal the witness-side queue states: head capacity
    # lanes (the only head lanes the chain consumes) + the full 12-lane tail
    assert tuple(proof.public_inputs[:4]) == tuple(task.queue_head[8:12])
    assert tuple(proof.public_inputs[4:16]) == tuple(task.queue_tail)
    return proof, sd.vk


def verify_leaf_queue_segment(task, proof, vk,
                              cfg: Optional[pk.PlonkishConfig] = None) -> bool:
    k = len(task.encodings)
    log_n = (k * qc.ROWS_PER_PERMUTATION).bit_length() - 1
    ir = qc.queue_ir(log_n)
    cfg = cfg or _engine_config(RECURSION_LAYER_PROOF_CONFIG)
    if tuple(proof.public_inputs[:4]) != tuple(task.queue_head[8:12]):
        return False
    if tuple(proof.public_inputs[4:16]) != tuple(task.queue_tail):
        return False
    return pk.verify(ir, vk, proof, cfg)
