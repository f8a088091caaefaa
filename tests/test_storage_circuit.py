"""Storage sorter circuit (type 9): real proofs with write/rollback replay,
net-access emission, FSM chaining, and tamper rejection."""

import dataclasses as dc

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import storage_sorter_circuit as ssc
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.vm.environment import LogQuery
from zkevm_harness_tpu.witness.sorters import (
    compute_storage_circuit_artifacts)

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)

A1 = 0x1111_2222_3333_4444_5555_6666_7777_8888_9999_AAAA
A2 = 0xBBBB_CCCC_DDDD_EEEE_0123_4567_89AB_CDEF_0000_1234
K1 = (7 << 200) | 42
K2 = (9 << 250) | 0xDEADBEEF


def _q(addr, key, ts, read, written, rw, rollback=False):
    return LogQuery(timestamp=ts, tx_number_in_block=0, aux_byte=0,
                    shard_id=0, address=addr, key=key, read_value=read,
                    written_value=written, rw_flag=rw, rollback=rollback)


def _queries():
    """Three cells exercising every emission class:
      (A1, K1): read, write, rollback of that write, read -> protective READ
      (A1, K2): write 0 -> 77 surviving                  -> net WRITE
      (A2, K1): write 5 -> 5 then rollback, never read   -> DROPPED
    """
    v = 1 << 100
    return [
        _q(A1, K1, 10, v, 0, rw=False),
        _q(A1, K2, 11, 0, 77, rw=True),
        _q(A1, K1, 12, v, v + 3, rw=True),
        _q(A2, K1, 13, 5, 9, rw=True),
        _q(A1, K1, 14, v, v + 3, rw=True, rollback=True),
        _q(A2, K1, 15, 5, 9, rw=True, rollback=True),
        _q(A1, K1, 16, v, 0, rw=False),
    ]


def _prove_instance(geo, art, i):
    ir = ssc.storage_ir(geo.log_n, geo.tiles)
    setup = ssc.storage_setup(ir, geo, CFG)
    inst = ssc.instance_inputs(art.instances[i], art.challenges)
    W = ssc.storage_witness(ir, geo, inst)
    proof = pk.prove(ir, setup, W, CFG)
    expected = ssc.instance_public_inputs(geo, art.instances[i],
                                          art.challenges)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected]
    assert pk.verify(ir, setup.vk(), proof, CFG)
    return ir, setup, proof


def test_emission_semantics():
    art = compute_storage_circuit_artifacts(_queries(), capacity=8)
    # protective read for (A1,K1) + net write for (A1,K2); (A2,K1) dropped
    assert len(art.output_queue) == 2


def test_single_instance_proves_and_verifies():
    art = compute_storage_circuit_artifacts(_queries(), capacity=8)
    assert len(art.instances) == 1
    geo = ssc.StorageGeometry(log_n=10, tiles=1)
    assert geo.capacity >= 7
    _prove_instance(geo, art, 0)


def test_fsm_chaining_across_instances():
    # capacity 4 forces a safe-split at the (A1,K1)-group boundary
    art = compute_storage_circuit_artifacts(_queries(), capacity=4)
    assert len(art.instances) >= 2
    geo = ssc.StorageGeometry(log_n=10, tiles=1)
    for i in range(len(art.instances)):
        _prove_instance(geo, art, i)
    for i in range(len(art.instances) - 1):
        a, b = art.instances[i], art.instances[i + 1]
        assert a.input_queue_state[1] == b.input_queue_state[0]
        assert a.sorted_queue_state[1] == b.sorted_queue_state[0]
        assert a.output_queue_state[1] == b.output_queue_state[0]
        assert a.accumulators_out == b.accumulators_in
    fa = art.final_accumulators
    assert fa[0] == fa[1] and fa[2] == fa[3]


def test_tampered_sorted_stream_rejected():
    art = compute_storage_circuit_artifacts(_queries(), capacity=8)
    geo = ssc.StorageGeometry(log_n=10, tiles=1)
    ir = ssc.storage_ir(geo.log_n, geo.tiles)
    inst = ssc.instance_inputs(art.instances[0], art.challenges)
    bad = np.array(inst.sorted_encodings, dtype=object)
    bad[[0, 1]] = bad[[1, 0]]
    inst_bad = dc.replace(inst, sorted_encodings=bad)
    with pytest.raises(AssertionError):
        ssc.storage_witness(ir, geo, inst_bad)


def test_stale_read_rejected():
    """A read not seeing the current value is refused at witness time."""
    v = 1 << 100
    qs = [_q(A1, K1, 10, 0, v, rw=True),
          _q(A1, K1, 11, 123, 0, rw=False)]  # reads 123, current is v
    with pytest.raises(AssertionError):
        compute_storage_circuit_artifacts(qs, capacity=8)


def test_tampered_proof_pi_rejected():
    art = compute_storage_circuit_artifacts(_queries(), capacity=8)
    geo = ssc.StorageGeometry(log_n=10, tiles=1)
    ir, setup, proof = _prove_instance(geo, art, 0)
    pis = list(proof.public_inputs)
    pis[0] = (int(pis[0]) + 1) % pk.gl.P
    bad = dc.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(ir, setup.vk(), bad, CFG)
