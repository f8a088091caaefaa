"""Events/storage sorter decomposers: permutation invariant + dedup outputs."""

import numpy as np

from zkevm_harness_tpu.vm.environment import LogQuery
from zkevm_harness_tpu.witness import sorters as so


def lq(ts, key, rv, wv, rw, rollback=False, aux=1):
    return LogQuery(ts, 0, aux, 0, 0xAA, key, rv, wv, rw, rollback)


def test_events_sorter(rng):
    qs = [lq(5, 1, 0, 10, True), lq(3, 2, 0, 20, True),
          lq(3, 2, 0, 20, True, rollback=True), lq(8, 3, 0, 30, True)]
    art = so.compute_events_dedup_and_sort(qs, capacity=3)
    assert art.final_lhs == art.final_rhs  # sorted is a permutation
    assert [i.index for i in art.instances] == [0, 1]
    # dedup output: rolled-back ts=3 pair cancelled, two survivors
    assert len(art.output_queue) == 2
    for a, b in zip(art.instances, art.instances[1:]):
        assert a.lhs_accumulator_out == b.lhs_accumulator_in


def test_storage_sorter(rng):
    qs = [lq(1, 5, 0, 10, True, aux=0), lq(2, 5, 10, 20, True, aux=0),
          lq(3, 7, 42, 42, False, aux=0)]
    art = so.compute_storage_dedup_and_sort(qs, capacity=8)
    assert art.final_lhs == art.final_rhs
    assert len(art.output_queue) == 2  # slot 5 net write + slot 7 read
    assert len(art.instances) == 1
    assert art.instances[0].start_flag and art.instances[0].completion_flag


def test_empty_sorter():
    art = so.compute_events_dedup_and_sort([], capacity=4)
    assert art.instances == [] and len(art.output_queue) == 0


def test_decommit_sorter():
    from zkevm_harness_tpu.vm.environment import DecommittmentQuery
    qs = [DecommittmentQuery(0xAAA, 10, 8, 4, True),
          DecommittmentQuery(0xBBB, 12, 9, 2, True),
          DecommittmentQuery(0xAAA, 14, 8, 4, False)]
    art = so.compute_decommitts_sorter(qs, capacity=2)
    assert art.final_lhs == art.final_rhs
    assert len(art.output_queue) == 2  # unique hashes only
    assert [i.index for i in art.instances] == [0, 1]


def test_linear_hasher():
    from zkevm_harness_tpu.witness import linear_hasher as lh
    from zkevm_harness_tpu.utils.native import keccak256
    msgs = [lq(i, i + 1, 0, 10 * i, True, aux=2) for i in range(5)]
    insts, final = lh.compute_linear_keccak256(msgs, capacity=2)
    assert len(insts) == 3
    assert insts[-1].completion_flag and insts[-1].output_hash == final
    assert final == keccak256(b"".join(lh.serialize_l1_message(q) for q in msgs))
    # queue continuity across instances
    for a, b in zip(insts, insts[1:]):
        assert a.input_queue_state[1] == b.input_queue_state[0]
    # empty queue: single instance hashing empty data
    insts0, final0 = lh.compute_linear_keccak256([], capacity=2)
    assert len(insts0) == 1 and final0 == keccak256(b"")
