"""Code-decommittments sorter circuit (type 2): real proofs from request
streams, FSM chaining, and tamper rejection."""

import numpy as np
import pytest

from zkevm_harness_tpu.circuits import decommitts_sorter_circuit as dsc
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.vm.environment import DecommittmentQuery
from zkevm_harness_tpu.witness.sorters import (
    compute_decommitts_circuit_artifacts)

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)


def _requests():
    """A request stream with duplicates (same hash twice -> same page)."""
    h1 = (0x01 << 248) | 0xAABB_0000_1111
    h2 = (0x01 << 248) | 0xCCDD_2222_3333
    h3 = (0x01 << 248) | 0x0102_0304_0506
    return [
        DecommittmentQuery(hash=h2, timestamp=3, memory_page=100,
                           decommitted_length=4, is_fresh=True),
        DecommittmentQuery(hash=h1, timestamp=7, memory_page=104,
                           decommitted_length=2, is_fresh=True),
        DecommittmentQuery(hash=h2, timestamp=11, memory_page=100,
                           decommitted_length=4, is_fresh=False),
        DecommittmentQuery(hash=h3, timestamp=15, memory_page=108,
                           decommitted_length=1, is_fresh=True),
        DecommittmentQuery(hash=h1, timestamp=19, memory_page=104,
                           decommitted_length=2, is_fresh=False),
    ]


def _prove_instance(geo, art, i):
    ir = dsc.decommitts_ir(geo.log_n, geo.tiles_per_queue)
    setup = dsc.decommitts_setup(ir, geo, CFG)
    inst = dsc.instance_inputs(art.instances[i], art.challenges)
    W = dsc.decommitts_witness(ir, geo, inst)
    proof = pk.prove(ir, setup, W, CFG)
    expected = dsc.instance_public_inputs(geo, art.instances[i],
                                          art.challenges)
    assert [int(v) for v in proof.public_inputs] == \
        [int(v) % pk.gl.P for v in expected]
    assert pk.verify(ir, setup.vk(), proof, CFG)
    return ir, setup, proof


def test_single_instance_proves_and_verifies():
    art = compute_decommitts_circuit_artifacts(_requests(), capacity=8)
    assert len(art.instances) == 1
    geo = dsc.DecommittsGeometry(log_n=8, tiles_per_queue=1)
    assert geo.capacity >= 5
    _prove_instance(geo, art, 0)
    # the output queue holds exactly the 3 fresh requests
    assert len(art.output_queue) == 3


def test_fsm_chaining_across_instances():
    # capacity 2 -> 3 instances; boundary falls INSIDE the h2 group
    art = compute_decommitts_circuit_artifacts(_requests(), capacity=2)
    assert len(art.instances) == 3
    geo = dsc.DecommittsGeometry(log_n=8, tiles_per_queue=1)
    for i in range(3):
        _prove_instance(geo, art, i)
    # continuity: tails chain head-to-head
    for i in range(2):
        a, b = art.instances[i], art.instances[i + 1]
        assert a.unsorted_queue_state[1] == b.unsorted_queue_state[0]
        assert a.sorted_queue_state[1] == b.sorted_queue_state[0]
        assert a.output_queue_state[1] == b.output_queue_state[0]
        assert a.accumulators_out == b.accumulators_in
    # permutation argument closes: final lhs == rhs per repetition
    fa = art.final_accumulators
    assert fa[0] == fa[1] and fa[2] == fa[3]


def test_tampered_witness_rejected():
    art = compute_decommitts_circuit_artifacts(_requests(), capacity=8)
    geo = dsc.DecommittsGeometry(log_n=8, tiles_per_queue=1)
    ir = dsc.decommitts_ir(geo.log_n, geo.tiles_per_queue)
    setup = dsc.decommitts_setup(ir, geo, CFG)
    inst = dsc.instance_inputs(art.instances[0], art.challenges)
    # swap two sorted encodings: breaks the sort order
    bad = np.array(inst.sorted_encodings, dtype=object)
    bad[[0, 1]] = bad[[1, 0]]
    inst_bad = dsc.DecommittsInstanceInputs(
        unsorted_encodings=inst.unsorted_encodings, sorted_encodings=bad,
        unsorted_head=inst.unsorted_head, sorted_head=inst.sorted_head,
        output_head=inst.output_head, challenges=inst.challenges,
        acc_in=inst.acc_in, cnt_in=inst.cnt_in, ocnt_in=inst.ocnt_in,
        prev_sorted_entry=inst.prev_sorted_entry)
    with pytest.raises(AssertionError):
        dsc.decommitts_witness(ir, geo, inst_bad)


def test_tampered_proof_pi_rejected():
    art = compute_decommitts_circuit_artifacts(_requests(), capacity=8)
    geo = dsc.DecommittsGeometry(log_n=8, tiles_per_queue=1)
    ir, setup, proof = _prove_instance(geo, art, 0)
    import dataclasses
    pis = list(proof.public_inputs)
    pis[0] = (int(pis[0]) + 1) % pk.gl.P
    bad = dataclasses.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(ir, setup.vk(), bad, CFG)


def test_fresh_flag_mismatch_rejected():
    """A request stream whose is_fresh flags contradict first-per-hash order
    must be refused at witness time."""
    h = (0x01 << 248) | 0x1234
    qs = [DecommittmentQuery(hash=h, timestamp=1, memory_page=8,
                             decommitted_length=1, is_fresh=False),
          DecommittmentQuery(hash=h, timestamp=5, memory_page=8,
                             decommitted_length=1, is_fresh=True)]
    art = compute_decommitts_circuit_artifacts(qs, capacity=8)
    geo = dsc.DecommittsGeometry(log_n=8, tiles_per_queue=1)
    ir = dsc.decommitts_ir(geo.log_n, geo.tiles_per_queue)
    inst = dsc.instance_inputs(art.instances[0], art.challenges)
    with pytest.raises(AssertionError):
        dsc.decommitts_witness(ir, geo, inst)
