"""Poseidon2 over the BN254 scalar field (t=3, rate 2, alpha=5).

The for-wrapper hasher/transcript of the reference: the final compression
circuit's FRI trees and transcript are hashed with a Bn256 Poseidon2 sponge
so the BN254 PLONK WrapperCircuit can re-verify the proof with NATIVE field
gates (src/proof_wrapper_utils/mod.rs:30-31 `CircuitPoseidon2Sponge<Bn256,
2,3,3,true>` / `CircuitPoseidon2Transcript`, backed by the rescue_poseidon
crate's `poseidon2` branch; consumed by prover_utils.rs:823-967
create/prove/verify_compression_for_wrapper_*).

Shape: width t=3, rate 2, capacity 1, R_F=8 external rounds (4+4), R_P=56
internal rounds, x^5 S-box. External linear layer for t=3 is circ(2,1,1)
(y_i = x_i + sum); internal layer is all-ones + diag(mu) (Poseidon2 paper
§5.1/5.2 small-t instantiation). Round constants are Grain-LFSR generated
(the same deterministic procedure as ops/poseidon2_params.py).
CONFORMANCE NOTE: rescue_poseidon pins its own table; for bit-exact
reference wrapper proofs drop its constants into
params/poseidon2_bn254.json — every consumer reads get_params_bn254().
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Sequence

from .bn254 import R as FR  # BN254 scalar field modulus

T = 3
RATE = 2
CAPACITY = 1
R_F = 8
R_P = 56
ALPHA = 5

_PARAMS_PATH = os.path.join(os.path.dirname(__file__), "..", "params",
                            "poseidon2_bn254.json")


class _GrainLFSR:
    """Grain LFSR from the Poseidon reference parameter generation
    (identical update/filter rules to ops/poseidon2_params._GrainLFSR,
    instantiated for a 254-bit prime field)."""

    def __init__(self, field_bits: int, t: int, r_f: int, r_p: int):
        bits: List[int] = []

        def push(value, width):
            bits.extend(int(b) for b in format(value, f"0{width}b"))

        push(1, 2)
        push(ALPHA, 4)
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
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [new]
        return new

    def _filtered_bit(self) -> int:
        while True:
            b1 = self._next_bit()
            b2 = self._next_bit()
            if b1:
                return b2

    def field_element(self) -> int:
        while True:
            v = 0
            for _ in range(254):
                v = (v << 1) | self._filtered_bit()
            if v < FR:
                return v


def _check_internal_invertible(diag):
    prod = 1
    inv_sum = 0
    for m in diag:
        prod = (prod * m) % FR
        inv_sum = (inv_sum + pow(m, FR - 2, FR)) % FR
    det = (prod * (1 + inv_sum)) % FR
    assert det != 0, "internal matrix singular; regenerate"


def _generate() -> dict:
    g = _GrainLFSR(254, T, R_F, R_P)
    external_initial = [[g.field_element() for _ in range(T)]
                        for _ in range(R_F // 2)]
    internal = [g.field_element() for _ in range(R_P)]
    external_final = [[g.field_element() for _ in range(T)]
                      for _ in range(R_F // 2)]
    diag = []
    while len(diag) < T:
        v = g.field_element()
        if v not in (0, FR - 1):
            diag.append(v)
    _check_internal_invertible(diag)
    return {
        "field": "bn254_fr",
        "t": T, "rate": RATE, "capacity": CAPACITY,
        "r_f": R_F, "r_p": R_P, "alpha": ALPHA,
        "generator": "grain_lfsr_v1 (provisional; swap for rescue_poseidon "
                     "tables for bit-exact reference wrapper proofs)",
        "external_initial": external_initial,
        "internal": internal,
        "external_final": external_final,
        "internal_diag": diag,
    }


@functools.lru_cache(maxsize=None)
def get_params_bn254() -> dict:
    path = os.path.abspath(_PARAMS_PATH)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    params = _generate()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(params, f, indent=1)
    return params


def _sbox(x: int) -> int:
    x2 = x * x % FR
    x4 = x2 * x2 % FR
    return x4 * x % FR


def _m_external(s: List[int]) -> List[int]:
    # circ(2,1,1): y_i = x_i + (x_0 + x_1 + x_2)
    tot = sum(s) % FR
    return [(x + tot) % FR for x in s]


def _m_internal(s: List[int], diag: Sequence[int]) -> List[int]:
    tot = sum(s) % FR
    return [(tot + d * x) % FR for x, d in zip(s, diag)]


def permute(state: Sequence[int]) -> List[int]:
    """One Poseidon2-BN254 permutation of a width-3 state."""
    p = get_params_bn254()
    diag = p["internal_diag"]
    s = [int(v) % FR for v in state]
    assert len(s) == T
    s = _m_external(s)
    for rc in p["external_initial"]:
        s = [_sbox((x + c) % FR) for x, c in zip(s, rc)]
        s = _m_external(s)
    for c in p["internal"]:
        s[0] = _sbox((s[0] + c) % FR)
        s = _m_internal(s, diag)
    for rc in p["external_final"]:
        s = [_sbox((x + c) % FR) for x, c in zip(s, rc)]
        s = _m_external(s)
    return s


def hash_elements(vals: Sequence[int]) -> int:
    """Sponge hash (overwrite mode, rate 2): Fr elements -> one Fr digest."""
    vals = [int(v) % FR for v in vals]
    pad = (-len(vals)) % RATE
    vals = vals + [0] * pad
    state = [0] * T
    for i in range(0, len(vals), RATE):
        state[:RATE] = vals[i:i + RATE]
        state = permute(state)
    return state[0]


class SpongeBn254:
    """Duplex sponge over the width-3 state (absorb rate-2 blocks,
    overwrite mode; squeeze from the rate lanes) — the for-wrapper
    transcript core (CircuitPoseidon2Transcript role)."""

    def __init__(self):
        self.state = [0] * T
        self.buffer: List[int] = []
        self.squeezed: List[int] = []
        self.read_since_permute = False

    def absorb(self, vals: Sequence[int]):
        self.squeezed = []
        self.read_since_permute = False
        self.buffer.extend(int(v) % FR for v in vals)
        while len(self.buffer) >= RATE:
            chunk, self.buffer = self.buffer[:RATE], self.buffer[RATE:]
            self.state[:RATE] = chunk
            self.state = permute(self.state)

    def _flush(self):
        if self.buffer:
            chunk = self.buffer + [0] * (RATE - len(self.buffer))
            self.buffer = []
            self.state[:RATE] = chunk
            self.state = permute(self.state)

    def squeeze(self) -> int:
        if not self.squeezed:
            self._flush()
            if self.read_since_permute:
                self.state = permute(self.state)
            self.squeezed = list(self.state[:RATE])
            self.read_since_permute = True
        return self.squeezed.pop(0)
