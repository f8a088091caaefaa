"""The REAL log-demuxer base circuit (type 4): witness -> columns -> prove ->
verify, routing actual log queries into the six class queues in-circuit
(log_demux.rs:20 behavior)."""

import dataclasses as dc

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import log_demux_circuit as dx
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover import satisfy
from zkevm_harness_tpu.vm.environment import (AUX_BYTE_EVENT,
                                              AUX_BYTE_L1_MESSAGE,
                                              AUX_BYTE_PRECOMPILE,
                                              AUX_BYTE_STORAGE,
                                              DefaultPrecompilesProcessor,
                                              LogQuery)
from zkevm_harness_tpu.witness import log_demux as ld

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=8)
P = gl.P


def mixed_queries(rng, n):
    """One query of every class, then random ones."""
    kinds = [
        (AUX_BYTE_STORAGE, 0x1234),
        (AUX_BYTE_EVENT, 0x1234),
        (AUX_BYTE_L1_MESSAGE, 0x1234),
        (AUX_BYTE_PRECOMPILE, DefaultPrecompilesProcessor.KECCAK_ADDRESS),
        (AUX_BYTE_PRECOMPILE, DefaultPrecompilesProcessor.SHA256_ADDRESS),
        (AUX_BYTE_PRECOMPILE, DefaultPrecompilesProcessor.ECRECOVER_ADDRESS),
    ]
    out = []
    for i in range(n):
        aux, addr = kinds[i % len(kinds)] if i < len(kinds) else \
            kinds[int(rng.integers(0, len(kinds)))]
        out.append(LogQuery(
            timestamp=4 + 2 * i, tx_number_in_block=i % 3, aux_byte=aux,
            shard_id=0, address=addr,
            key=int.from_bytes(rng.bytes(32), "little"),
            read_value=int.from_bytes(rng.bytes(32), "little"),
            written_value=int.from_bytes(rng.bytes(32), "little"),
            rw_flag=bool(i % 2)))
    return out


def _setup_parts(geo):
    ir = dx.demux_ir(geo.log_n, geo.tiles)
    const = dx._const_rows(geo).T
    perm = pk.apply_copy_cycles(
        pk.identity_permutation(ir.num_witness, geo.n), dx._copy_cycles(geo))
    return ir, const, perm


def check_instance(geo, ir, const, perm, inst):
    W = gl.to_ints(dx.demux_witness(ir, geo, inst))
    pis = dx.instance_public_inputs(geo, inst)
    viol = satisfy.check_satisfied(ir, W, const, perm, pis)
    assert viol == [], (inst.index, viol[:8])
    return W, pis


def test_demux_circuit_satisfied_all_classes(rng):
    geo = dx.DemuxGeometry(log_n=8, tiles=3)  # capacity 6
    ir, const, perm = _setup_parts(geo)
    qs = mixed_queries(rng, 6)
    art = ld.compute_log_demux_artifacts(qs, capacity=geo.capacity)
    assert len(art.instances) == 1
    inst = art.instances[0]
    assert sorted(inst.classes.tolist()) == [0, 1, 2, 3, 4, 5]
    check_instance(geo, ir, const, perm, inst)


def test_demux_circuit_chained_instances(rng):
    geo = dx.DemuxGeometry(log_n=8, tiles=2)  # capacity 4
    ir, const, perm = _setup_parts(geo)
    qs = mixed_queries(rng, 10)
    art = ld.compute_log_demux_artifacts(qs, capacity=geo.capacity)
    assert len(art.instances) >= 2
    for inst in art.instances:
        check_instance(geo, ir, const, perm, inst)
    # FSM continuity binds instances; final tails match the oracle demux
    for a, b in zip(art.instances, art.instances[1:]):
        assert a.input_queue_state[1] == b.input_queue_state[0]
        for k in range(ld.NUM_CLASSES):
            assert a.output_queue_states[k][1] == b.output_queue_states[k][0]
    last = art.instances[-1]
    for k in range(ld.NUM_CLASSES):
        assert tuple(last.output_queue_states[k][1]) == \
            tuple(art.output_queues[k].tail)


def test_demux_circuit_rejects_misrouting(rng):
    geo = dx.DemuxGeometry(log_n=8, tiles=3)
    ir, const, perm = _setup_parts(geo)
    qs = mixed_queries(rng, 6)
    art = ld.compute_log_demux_artifacts(qs, capacity=geo.capacity)
    inst = art.instances[0]
    W, pis = check_instance(geo, ir, const, perm, inst)
    D = geo.dense_base
    # claim a storage query was an event (flip selectors on row 1)
    W2 = W.copy()
    r = 1
    assert int(W2[D + dx._D.SEL + 0, r]) == 1
    W2[D + dx._D.SEL + 0, r] = 0
    W2[D + dx._D.SEL + 1, r] = 1
    assert satisfy.check_satisfied(ir, W2, const, perm, pis)
    # claim an ecrecover call was keccak (row 6 is the ecrecover one)
    W3 = W.copy()
    r = next(i + 1 for i, c in enumerate(inst.classes) if c == 5)
    W3[D + dx._D.SEL + 5, r] = 0
    W3[D + dx._D.SEL + 3, r] = 1
    assert satisfy.check_satisfied(ir, W3, const, perm, pis)
    # tamper a per-class count PI
    bad_pis = list(pis)
    bad_pis[-1] = (int(bad_pis[-1]) + 1) % P
    assert satisfy.check_satisfied(ir, W, const, perm, bad_pis)


def test_demux_circuit_proves_and_verifies(rng):
    geo = dx.DemuxGeometry(log_n=8, tiles=3)
    ir, const, perm = _setup_parts(geo)
    qs = mixed_queries(rng, 6)
    art = ld.compute_log_demux_artifacts(qs, capacity=geo.capacity)
    inst = art.instances[0]
    setup = dx.demux_setup(ir, geo, CFG)
    witness = dx.demux_witness(ir, geo, inst)
    proof = pk.prove(ir, setup, witness, CFG)
    assert pk.verify(ir, setup.vk(), proof, CFG)
    pis = dx.instance_public_inputs(geo, inst)
    assert [int(v) for v in proof.public_inputs] == [v % P for v in pis]
    # tampered output-queue tail PI must fail
    bad = dc.replace(proof, public_inputs=list(proof.public_inputs))
    bad.public_inputs[12] = (int(bad.public_inputs[12]) + 1) % P
    assert not pk.verify(ir, setup.vk(), bad, CFG)
