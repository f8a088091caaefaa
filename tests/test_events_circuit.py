"""The REAL events/L1-messages sorter base circuit (types 11/12):
witness -> columns -> prove -> verify, from actual event log queries
through the decomposer.

Mirrors the reference flow compute_events_dedup_and_sort ->
prove_base_layer_circuit (events_sort_dedup.rs:16 + base_layer proving):
the proven columns ARE the demuxed event stream, its sort, and the
deduplicated output queue.
"""

import dataclasses as dc

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import events_sorter_circuit as ec
from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.prover import satisfy
from zkevm_harness_tpu.vm.environment import AUX_BYTE_EVENT, LogQuery
from zkevm_harness_tpu.witness import sorters

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=8)


def event_queries(rng, n, rollback_frac=0.4):
    """Synthetic event stream: unique timestamps; ~rollback_frac of events
    are cancelled by an adjacent (forward, rollback) pair."""
    out = []
    ts = 4
    for i in range(n):
        q = LogQuery(timestamp=ts, tx_number_in_block=i % 3,
                     aux_byte=AUX_BYTE_EVENT, shard_id=0,
                     address=int(rng.integers(1, 1 << 16)),
                     key=int.from_bytes(rng.bytes(32), "little"),
                     read_value=0,
                     written_value=int.from_bytes(rng.bytes(32), "little"),
                     rw_flag=True)
        out.append(q)
        if rng.random() < rollback_frac:
            out.append(dc.replace(q, rollback=True))
        ts += int(rng.integers(1, 5))
    return out


def _setup_parts(geo):
    ir = ec.events_ir(geo.log_n, geo.tiles)
    const = ec._const_rows(geo).T
    perm = pk.apply_copy_cycles(
        pk.identity_permutation(ir.num_witness, geo.n), ec._copy_cycles(geo))
    return ir, const, perm


def check_instance(geo, ir, const, perm, art, inst_w):
    inst = ec.instance_inputs(inst_w, art.challenges)
    W = gl.to_ints(ec.events_witness(ir, geo, inst))
    pis = ec.instance_public_inputs(geo, inst_w, art.challenges)
    violations = satisfy.check_satisfied(ir, W, const, perm, pis)
    assert violations == [], (inst_w.index, violations[:10])
    return W, pis


def test_events_circuit_satisfied_full_instance(rng):
    geo = ec.EventsGeometry(log_n=8, tiles=2)  # slots 4, capacity 3
    ir, const, perm = _setup_parts(geo)
    qs = event_queries(rng, 2)  # may expand with rollbacks, <= cap
    while len(qs) > geo.capacity:
        qs = qs[:-1]
    art = sorters.compute_events_circuit_artifacts(qs, capacity=geo.capacity)
    assert len(art.instances) == 1
    check_instance(geo, ir, const, perm, art, art.instances[0])


def test_events_circuit_chained_instances(rng):
    """Multi-instance chain with safe-split boundaries + dedup parity."""
    geo = ec.EventsGeometry(log_n=8, tiles=3)  # slots 6, capacity 5
    ir, const, perm = _setup_parts(geo)
    qs = event_queries(rng, 9)
    art = sorters.compute_events_circuit_artifacts(qs, capacity=geo.capacity)
    assert len(art.instances) >= 2
    for inst_w in art.instances:
        check_instance(geo, ir, const, perm, art, inst_w)
    # FSM continuity binds the instances
    for a, b in zip(art.instances, art.instances[1:]):
        assert a.accumulators_out == b.accumulators_in
        assert a.sorted_queue_state[1] == b.sorted_queue_state[0]
        assert a.output_queue_state[1] == b.output_queue_state[0]
    # permutation closes over the chain
    fa = art.final_accumulators
    assert fa[0] == fa[1] and fa[2] == fa[3]
    # output queue == the oracle's dedup_events result
    from zkevm_harness_tpu.witness.encodings import encode_log_query
    from zkevm_harness_tpu.witness.oracle import dedup_events
    from zkevm_harness_tpu.witness.queues import QueueSimulator
    expect = QueueSimulator()
    expect.push_many([encode_log_query(q) for q in dedup_events(list(qs))])
    assert tuple(art.output_queue.tail) == tuple(expect.tail)


def test_events_circuit_rejects_tampering(rng):
    geo = ec.EventsGeometry(log_n=8, tiles=2)
    ir, const, perm = _setup_parts(geo)
    qs = event_queries(rng, 2, rollback_frac=1.0)[:geo.capacity]
    # ensure at least one rollback pair survived the truncation
    assert any(q.rollback for q in qs)
    art = sorters.compute_events_circuit_artifacts(qs, capacity=geo.capacity)
    inst_w = art.instances[0]
    W, pis = check_instance(geo, ir, const, perm, art, inst_w)
    D = geo.dense_base

    # (a) flip an emission flag (claim a cancelled event was emitted)
    r = next(r for r in range(2, geo.capacity + 2)
             if int(W[D + ec._D.EMIT, r]) == 0 and int(W[D + ec._D.V, r - 1]))
    W2 = W.copy()
    W2[D + ec._D.EMIT, r] = 1
    assert satisfy.check_satisfied(ir, W2, const, perm, pis)

    # (b) tamper a grand-product accumulator mid-chain
    W3 = W.copy()
    W3[D + ec._D.ACC, 1] = (int(W3[D + ec._D.ACC, 1]) + 1) % gl.P
    assert satisfy.check_satisfied(ir, W3, const, perm, pis)

    # (c) lie in the timestamp-diff byte columns (mask an order violation)
    W4 = W.copy()
    row = next(r for r in range(1, geo.capacity + 1)
               if int(W4[D + ec._D.V, r]) and not int(W4[D + ec._D.ET, r]))
    W4[D + ec._D.DB, row] = (int(W4[D + ec._D.DB, row]) + 1) % 256
    assert satisfy.check_satisfied(ir, W4, const, perm, pis)

    # (d) tamper a sponge lane in the output region
    W5 = W.copy()
    base = 2 * 16 * geo.tiles
    W5[base, 5] = (int(W5[base, 5]) + 1) % gl.P

    # (e) unsorted stream: witness generation must refuse
    inst = ec.instance_inputs(inst_w, art.challenges)
    if inst.sorted_encodings.shape[0] >= 2:
        bad = dc.replace(
            inst, sorted_encodings=np.asarray(inst.sorted_encodings,
                                              dtype=object)[::-1])
        with pytest.raises(AssertionError):
            ec.events_witness(ir, geo, bad)


def test_events_circuit_proves_and_verifies(rng):
    """Full proof of a real instance + PI tamper rejection."""
    geo = ec.EventsGeometry(log_n=8, tiles=2)
    ir, const, perm = _setup_parts(geo)
    qs = event_queries(rng, 2)[:geo.capacity]
    art = sorters.compute_events_circuit_artifacts(qs, capacity=geo.capacity)
    inst_w = art.instances[0]
    inst = ec.instance_inputs(inst_w, art.challenges)
    setup = ec.events_setup(ir, geo, CFG)
    witness = ec.events_witness(ir, geo, inst)
    proof = pk.prove(ir, setup, witness, CFG)
    assert pk.verify(ir, setup.vk(), proof, CFG)
    # the proof's public inputs ARE the decomposer's instance payload
    pis = ec.instance_public_inputs(geo, inst_w, art.challenges)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % gl.P for v in pis]
    # tampered PI (claim a different output-queue tail) must fail
    k = ec.NUM_CHALLENGES + 8 + 8 + 4  # first out-tail slot
    bad_pis = list(proof.public_inputs)
    bad_pis[k] = (bad_pis[k] + 1) % gl.P
    bad = dc.replace(proof, public_inputs=bad_pis)
    assert not pk.verify(ir, setup.vk(), bad, CFG)
