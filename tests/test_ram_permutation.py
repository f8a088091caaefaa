"""RAM permutation witness: permutation invariant + FSM splitting."""

import numpy as np

from zkevm_harness_tpu.vm.environment import MemoryLocation, MemoryQuery
from zkevm_harness_tpu.witness import ram_permutation as rp


def make_queries(rng, n):
    out = []
    for i in range(n):
        out.append(MemoryQuery(
            timestamp=1024 + 2 * i,
            location=MemoryLocation(int(rng.integers(0, 4)),
                                    int(rng.integers(0, 8))),
            value=int(rng.integers(0, 2**63)),
            rw_flag=bool(rng.integers(0, 2))))
    return out


def test_grand_products_match_for_true_permutation(rng):
    qs = make_queries(rng, 23)
    art = rp.compute_ram_circuit_snapshots(qs, capacity=10)
    # sorted queue is a permutation of the unsorted one => products equal
    # in BOTH challenge repetitions
    assert art.final_accumulators[0] == art.final_accumulators[1]
    assert art.final_accumulators[2] == art.final_accumulators[3]
    assert art.final_accumulators[0] != art.final_accumulators[2]
    assert [i.num_items for i in art.instances] == [10, 10, 3]
    assert art.instances[0].start_flag and art.instances[-1].completion_flag
    # FSM continuation: out accumulator of k == in accumulator of k+1
    for a, b in zip(art.instances, art.instances[1:]):
        assert a.accumulators_out == b.accumulators_in
        assert a.unsorted_queue_state[1] == b.unsorted_queue_state[0]
        assert b.prev_sorted_entry == tuple(
            int(v) for v in a.sorted_encodings[-1])
        assert b.num_items_in == a.num_items_in + a.num_items
    assert art.instances[0].accumulators_in == (1, 1, 1, 1)
    assert art.instances[0].prev_sorted_entry is None


def test_corrupted_sort_breaks_product(rng):
    # if the "sorted" queue is not a permutation, products differ: simulate
    # by removing one query from the sorted side via direct recompute
    qs = make_queries(rng, 9)
    art = rp.compute_ram_circuit_snapshots(qs, capacity=16)
    qs2 = list(qs)
    qs2[3] = MemoryQuery(qs[3].timestamp, qs[3].location,
                         (qs[3].value + 1), qs[3].rw_flag)
    art2 = rp.compute_ram_circuit_snapshots(qs2, capacity=16)
    # different data -> different (still equal-per-run) products
    assert art.final_accumulators[0] != art2.final_accumulators[0]
    assert art2.final_accumulators[0] == art2.final_accumulators[1]


def test_empty_queue():
    art = rp.compute_ram_circuit_snapshots([], capacity=4)
    assert art.instances == [] and art.final_accumulators == (1, 1, 1, 1)
