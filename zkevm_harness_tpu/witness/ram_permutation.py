"""RAM permutation witness: sorted memory queue + grand-product argument.

Parity with `compute_ram_circuit_snapshots`
(src/witness/individual_circuits/ram_permutation.rs:26-120, SURVEY component
7): sort all memory queries by (location, timestamp), re-simulate the sorted
queue's Poseidon2 chain, derive Fiat-Shamir challenges from both queue tails,
and build the two grand-product chains whose equality proves the sorted queue
is a permutation of the execution-order queue. Long arguments split into
fixed-capacity instances carrying the partial products as hidden FSM state
(the closed-form-input continuation of SURVEY §5).

TPU mapping: the sort is `lax.sort` (witness/queues.sort_by_u64_keys family),
the hash chains are scan kernels, and the chains are `associative_scan`
prefix products — replacing rayon par_sort + the chunked sequential product
pass (PARALLELIZATION_CHUNK_SIZE = 1<<16, utils.rs:552).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from ..ops import goldilocks as gl
from ..prover.transcript import Transcript
from ..vm.environment import MemoryQuery
from .encodings import encode_memory_query, memory_sorting_key
from .queues import (FullWidthQueueSimulator, fs_challenge_terms,
                     grand_product_chain)

P = gl.P
NUM_CHALLENGES = 9  # 8 encoding elements + gamma offset (reference uses
# enc_width + 1 challenge tuples per repetition)


@dataclasses.dataclass
class RamPermutationInstanceWitness:
    index: int
    start_flag: bool
    completion_flag: bool
    unsorted_queue_state: Tuple[Tuple[int, ...], Tuple[int, ...], int]
    sorted_queue_state: Tuple[Tuple[int, ...], Tuple[int, ...], int]
    lhs_accumulator_in: int
    lhs_accumulator_out: int
    rhs_accumulator_in: int
    rhs_accumulator_out: int
    num_items: int


@dataclasses.dataclass
class RamPermutationArtifacts:
    instances: List[RamPermutationInstanceWitness]
    challenges: List[int]
    gamma: int
    final_lhs: int
    final_rhs: int


def compute_ram_circuit_snapshots(memory_queries: Sequence[MemoryQuery],
                                  capacity: int) -> RamPermutationArtifacts:
    unsorted_enc = np.array([encode_memory_query(q) for q in memory_queries],
                            dtype=object).reshape(-1, 8)
    order = sorted(range(len(memory_queries)),
                   key=lambda i: memory_sorting_key(memory_queries[i]))
    sorted_enc = unsorted_enc[order] if len(order) else unsorted_enc

    unsorted_q = FullWidthQueueSimulator()
    unsorted_q.push_many(unsorted_enc)
    sorted_q = FullWidthQueueSimulator()
    sorted_q.push_many(sorted_enc)

    # FS challenges bound to both queue commitments (produce_fs_challenges,
    # utils.rs:498-550 — the reference derives them from the queue tails)
    tr = Transcript(domain_tag=8)  # RAM_PERMUTATION circuit type
    tr.absorb_ints(list(unsorted_q.tail) + list(sorted_q.tail)
                   + [len(memory_queries)])
    challenges = [tr.challenge_base() for _ in range(8)]
    gamma = tr.challenge_base()

    n = len(memory_queries)
    if n == 0:
        return RamPermutationArtifacts([], challenges, gamma, 1, 1)

    ch_gf = gl.from_int(challenges)
    gamma_gf = gl.from_int(gamma)
    lhs_terms = fs_challenge_terms(gl.from_int(unsorted_enc), ch_gf, gamma_gf)
    rhs_terms = fs_challenge_terms(gl.from_int(sorted_enc), ch_gf, gamma_gf)
    lhs_chain = [int(v) for v in gl.to_u64(grand_product_chain(lhs_terms))]
    rhs_chain = [int(v) for v in gl.to_u64(grand_product_chain(rhs_terms))]

    u_tails = unsorted_q.tails()
    s_tails = sorted_q.tails()

    instances = []
    n_inst = -(-n // capacity)
    for i in range(n_inst):
        lo = i * capacity
        hi = min(n, (i + 1) * capacity)
        instances.append(RamPermutationInstanceWitness(
            index=i,
            start_flag=(i == 0),
            completion_flag=(i == n_inst - 1),
            unsorted_queue_state=(tuple(int(v) for v in u_tails[lo]),
                                  tuple(int(v) for v in u_tails[hi]), hi - lo),
            sorted_queue_state=(tuple(int(v) for v in s_tails[lo]),
                                tuple(int(v) for v in s_tails[hi]), hi - lo),
            lhs_accumulator_in=lhs_chain[lo - 1] if lo else 1,
            lhs_accumulator_out=lhs_chain[hi - 1],
            rhs_accumulator_in=rhs_chain[lo - 1] if lo else 1,
            rhs_accumulator_out=rhs_chain[hi - 1],
            num_items=hi - lo))
    return RamPermutationArtifacts(
        instances=instances, challenges=challenges, gamma=gamma,
        final_lhs=lhs_chain[-1], final_rhs=rhs_chain[-1])
