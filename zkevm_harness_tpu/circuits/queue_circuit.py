"""Queue-commitment circuit: Poseidon2 sponge chain with copy-wired tails.

Proves `new_tail_k = P2([enc_k(8) || tail_k(4)])[:4]` for a chain of queue
items — the in-circuit counterpart of the witness-side queue simulators
(circuit_encodings width-12 sponge with 4-field tail; every reference base
circuit carries queue-state checks of exactly this shape).

Built on the Poseidon2 permutation blocks (circuits/poseidon2_circuit.py):
block k's OUTPUT lanes 0..3 (row 32k+31) are copy-wired into block k+1's
INPUT lanes 8..11 (row 32k+32), so the chain continuity is enforced by the
copy-permutation argument, not by extra gates. Encoding lanes are free
witness; public inputs bind the initial tail and the final tail.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..ops import goldilocks as gl
from ..prover import plonkish as pk
from . import poseidon2_circuit as p2c
from .poseidon2_circuit import ROWS_PER_PERMUTATION, T

P = gl.P


def queue_ir(log_n: int) -> pk.PlonkishIR:
    base = p2c.poseidon2_ir(log_n)
    n_blocks = (1 << log_n) // ROWS_PER_PERMUTATION
    last_out_row = (n_blocks - 1) * ROWS_PER_PERMUTATION + ROWS_PER_PERMUTATION - 1
    pis = tuple((8 + c, 0) for c in range(4)) + \
        tuple((c, last_out_row) for c in range(4))
    return pk.PlonkishIR(
        log_n=base.log_n, num_witness=base.num_witness,
        num_const=base.num_const, gate_degree=base.gate_degree,
        num_gate_constraints=base.num_gate_constraints,
        eval_gates=base.eval_gates, copy_chunk=base.copy_chunk,
        public_input_cells=pis)


def queue_setup(ir: pk.PlonkishIR, cfg: pk.PlonkishConfig) -> pk.PlonkishSetup:
    n = 1 << ir.log_n
    n_blocks = n // ROWS_PER_PERMUTATION
    block = p2c._block_const_rows()
    tiled = np.tile(block, (n_blocks, 1)).T
    perm = pk.identity_permutation(T, n)
    cycles = []
    for k in range(n_blocks - 1):
        out_row = k * ROWS_PER_PERMUTATION + ROWS_PER_PERMUTATION - 1
        in_row = (k + 1) * ROWS_PER_PERMUTATION
        for c in range(4):
            cycles.append([(c, out_row), (8 + c, in_row)])
    perm = pk.apply_copy_cycles(perm, cycles)
    return pk.build_setup(ir, tiled, perm, cfg)


def queue_witness(ir: pk.PlonkishIR, encodings: Sequence[Sequence[int]],
                  initial_tail: Sequence[int] = (0, 0, 0, 0)) -> gl.GF:
    """Trace for a chain absorbing `encodings` starting from `initial_tail`.

    Unused blocks continue the chain with zero encodings (still valid sponge
    steps), so the final tail PI reflects the PADDED chain — callers size the
    circuit to the queue (len(encodings) == n_blocks) for exact tails.
    """
    n = 1 << ir.log_n
    n_blocks = n // ROWS_PER_PERMUTATION
    assert len(encodings) <= n_blocks
    tail = [int(v) % P for v in initial_tail]
    inputs = []
    for k in range(n_blocks):
        enc = (list(encodings[k]) if k < len(encodings) else [0] * 8)
        state = [int(v) % P for v in enc] + tail
        inputs.append(state)
        # next tail = permute(state)[:4] — reuse the exact row generator
        one_block_ir = ir
        tail = _permute_ints(state)[:4]
    return p2c.poseidon2_witness(ir, inputs)


def _permute_ints(state: List[int]) -> List[int]:
    from ..ops import poseidon2 as p2
    out = gl.to_u64(p2.permute(gl.from_int(np.array(state, dtype=object))))
    return [int(v) for v in out]


def expected_final_tail(encodings: Sequence[Sequence[int]], n_blocks: int,
                        initial_tail=(0, 0, 0, 0)) -> List[int]:
    tail = [int(v) % P for v in initial_tail]
    for k in range(n_blocks):
        enc = list(encodings[k]) if k < len(encodings) else [0] * 8
        tail = _permute_ints([int(v) % P for v in enc] + tail)[:4]
    return tail
