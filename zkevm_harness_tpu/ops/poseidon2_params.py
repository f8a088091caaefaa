"""Poseidon2-over-Goldilocks parameter set (t=12, R_F=8, R_P=22, alpha=7).

Matches the *shape* of boojum's `Poseidon2Goldilocks` used everywhere in the
reference harness (queue simulators, Merkle tree hasher, transcript,
public-input commitments — e.g. src/prover_utils.rs:36-44 `R = Poseidon2Goldilocks`,
circuit_encodings' width-12 sponge with 4-field tail).

Round constants and the internal-matrix diagonal are generated with the
Grain LFSR procedure from the Poseidon reference design (deterministic,
self-contained; no network) and are THE pinned production tables of this
framework: tests/test_poseidon2.py pins permutation vectors and
tests/test_golden.py pins whole proof transcripts over them, so any
accidental drift fails CI. They are NOT bit-identical to boojum's tables —
boojum's source is unreachable from this environment (zero egress; the
reference repo does not vendor it — verified round 4, see BASELINE.md
"Conformance"), so proofs cannot match the reference `test_proofs/` JSONs.
This remains the single designed swap point: drop boojum's tables into
`params/poseidon2_goldilocks.json` and every consumer picks them up through
`get_params()`; regenerate goldens via tools/make_golden.py.

External matrix: circ(2*M4, M4, M4) with the paper's M4.
Internal matrix: all-ones + diag(mu).
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np

from .goldilocks import P

T = 12  # state width
RATE = 8
CAPACITY = 4
R_F = 8  # external (full) rounds, split 4 + 4
R_P = 22  # internal (partial) rounds
ALPHA = 7  # S-box exponent, gcd(7, p-1) = 1

# 4x4 block of the external linear layer (Poseidon2 paper, sec. 5.1)
M4 = np.array(
    [[5, 7, 1, 3],
     [4, 6, 1, 1],
     [1, 3, 5, 7],
     [1, 1, 4, 6]], dtype=np.int64)

_PARAMS_PATH = os.path.join(os.path.dirname(__file__), "..", "params",
                            "poseidon2_goldilocks.json")


class _GrainLFSR:
    """Grain LFSR from the Poseidon reference parameter generation."""

    def __init__(self, field_bits: int, t: int, r_f: int, r_p: int):
        bits = []
        def push(value, width):
            bits.extend(int(b) for b in format(value, f"0{width}b"))
        push(1, 2)          # field type: prime
        push(ALPHA, 4)      # sbox descriptor
        push(field_bits, 12)
        push(t, 12)
        push(r_f, 10)
        push(r_p, 10)
        bits.extend([1] * 30)
        assert len(bits) == 80
        self.state = bits
        for _ in range(160):
            self._next_bit()

    def _next_bit(self) -> int:
        s = self.state
        # Grain update: b_{i+80} = b_{i+62} ^ b_{i+51} ^ b_{i+38} ^ b_{i+23}
        #               ^ b_{i+13} ^ b_i
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [new]
        return new

    def _filtered_bit(self) -> int:
        # "if the first output bit is 1, emit the second; else discard both"
        while True:
            b1 = self._next_bit()
            b2 = self._next_bit()
            if b1:
                return b2

    def field_element(self) -> int:
        """Next 64-bit value < p via rejection sampling."""
        while True:
            v = 0
            for _ in range(64):
                v = (v << 1) | self._filtered_bit()
            if v < P:
                return v


def _generate() -> dict:
    g = _GrainLFSR(64, T, R_F, R_P)
    external_initial = [[g.field_element() for _ in range(T)] for _ in range(R_F // 2)]
    internal = [g.field_element() for _ in range(R_P)]
    external_final = [[g.field_element() for _ in range(T)] for _ in range(R_F // 2)]
    # internal-matrix diagonal: sampled nonzero, mu_i != -1 (keeps the
    # all-ones+diag matrix invertible in practice; verified below)
    diag = []
    while len(diag) < T:
        v = g.field_element()
        if v not in (0, P - 1):
            diag.append(v)
    _check_internal_invertible(diag)
    return {
        "field": "goldilocks",
        "t": T, "rate": RATE, "capacity": CAPACITY,
        "r_f": R_F, "r_p": R_P, "alpha": ALPHA,
        "generator": "grain_lfsr_v1 (provisional; swap for boojum tables for bit-exact ref proofs)",
        "external_initial": external_initial,
        "internal": internal,
        "external_final": external_final,
        "internal_diag": diag,
    }


def _check_internal_invertible(diag):
    """det(all-ones + diag(mu)) = (prod mu_i) * (1 + sum 1/mu_i) mod p != 0."""
    prod = 1
    inv_sum = 0
    for m in diag:
        prod = (prod * m) % P
        inv_sum = (inv_sum + pow(m, P - 2, P)) % P
    det = (prod * (1 + inv_sum)) % P
    assert det != 0, "internal matrix singular; regenerate"


@functools.lru_cache(maxsize=None)
def get_params() -> dict:
    path = os.path.abspath(_PARAMS_PATH)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    params = _generate()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(params, f, indent=1)
    return params
