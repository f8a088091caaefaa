"""Pluggable proof-hash backends: Merkle tree hasher + Fiat-Shamir transcript.

The reference's prover is generic over (H, TR) — Goldilocks Poseidon2 for
every layer except compression-FOR-WRAPPER, which switches to a Bn256
Poseidon2 sponge/transcript so the BN254 PLONK WrapperCircuit can verify
the FRI proof with native-field gates (src/prover_utils.rs:36-44 vs
:900-967; src/proof_wrapper_utils/mod.rs:30-31). Here the same switch is a
backend object threaded through plonkish.prove/verify and fri: the default
(None) keeps the fused Goldilocks Poseidon2 device path; `Bn254Backend`
hashes trees and runs the transcript host-side over BN254 Fr (the
for-wrapper circuit is the smallest in the pipeline and proves once per
block, so host hashing is not on the critical path).

Encoding: each Goldilocks element absorbs as one Fr element; a Merkle leaf
is the sponge hash of its row; a node is hash(left, right) (one rate-2
block = one permutation). Query paths carry one Fr per level.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from ..ops import goldilocks as gl
from ..utils import poseidon2_bn254 as p2b
from ..utils.bn254 import R as FR

P = gl.P


@dataclasses.dataclass
class Bn254Tree:
    levels: List[List[int]]  # levels[0] = leaf digests ... levels[-1] = cap
    cap_size: int

    @property
    def cap(self) -> List[int]:
        return self.levels[-1]

    @property
    def depth(self) -> int:
        return len(self.levels) - 1


class Bn254Transcript:
    """Same method surface as prover/transcript.Transcript, over the
    width-3 BN254 sponge. Goldilocks values absorb as one Fr each;
    challenges come from Fr squeezes split into two 64-bit halves reduced
    into Goldilocks (CircuitPoseidon2Transcript role)."""

    def __init__(self, domain_tag: int = 0):
        self._sp = p2b.SpongeBn254()
        if domain_tag:
            self._sp.state[p2b.T - 1] = domain_tag % FR

    # -- absorbing --------------------------------------------------------

    def absorb_ints(self, values: Sequence[int]):
        self._sp.absorb([int(v) % P for v in values])

    def absorb_gf(self, values: gl.GF):
        self.absorb_ints([int(v) for v in gl.to_ints(values).ravel()])

    absorb_gf_device = absorb_gf

    def absorb_fr(self, values: Sequence[int]):
        self._sp.absorb([int(v) % FR for v in values])

    # -- squeezing ---------------------------------------------------------

    def challenge_base(self) -> int:
        return (self._sp.squeeze() % (1 << 64)) % P

    def challenge_ext_ints(self):
        fr = self._sp.squeeze()
        return ((fr % (1 << 64)) % P, ((fr >> 64) % (1 << 64)) % P)

    def challenge_ext(self) -> gl.GF2:
        c0, c1 = self.challenge_ext_ints()
        return gl.ext_from_ints(c0, c1)

    def query_indices(self, count: int, domain: int) -> List[int]:
        return [self._sp.squeeze() % domain for _ in range(count)]


class Bn254Backend:
    """Tree hasher + transcript factory for the for-wrapper mode."""

    name = "bn254_poseidon2"

    def transcript(self, domain_tag: int = 0) -> Bn254Transcript:
        return Bn254Transcript(domain_tag)

    # -- trees --------------------------------------------------------------

    @staticmethod
    def pack_row(row) -> List[int]:
        """Pack canonical Goldilocks values 3-per-Fr (base-2^64 digits:
        v0 + v1*2^64 + v2*2^128 < 2^193 < R, injective). Cuts the in-SNARK
        wrapper's leaf-hash permutation count 3x (wrapper.rs's circuit
        absorbs GL values through the same dense packing)."""
        vals = [int(v) % P for v in row]
        out = []
        for i in range(0, len(vals), 3):
            fr = 0
            for j, x in enumerate(vals[i:i + 3]):
                fr |= x << (64 * j)
            out.append(fr)
        return out

    def hash_rows(self, rows: np.ndarray) -> List[int]:
        """rows: (k, w) object array of Goldilocks ints -> k Fr digests."""
        return [p2b.hash_elements(self.pack_row(row)) for row in rows]

    def commit_rows(self, rows: np.ndarray, cap_size: int) -> Bn254Tree:
        leaves = self.hash_rows(rows)
        cap_size = min(cap_size, len(leaves))
        levels = [leaves]
        while len(levels[-1]) > cap_size:
            cur = levels[-1]
            levels.append([p2b.hash_elements([cur[2 * i], cur[2 * i + 1]])
                           for i in range(len(cur) // 2)])
        return Bn254Tree(levels=levels, cap_size=cap_size)

    def open(self, tree: Bn254Tree, indices: Sequence[int]) -> np.ndarray:
        """(q, depth) object array: sibling digests bottom-up."""
        out = np.zeros((len(indices), tree.depth), dtype=object)
        for k, idx in enumerate(indices):
            i = int(idx)
            for d in range(tree.depth):
                out[k, d] = tree.levels[d][i ^ 1]
                i >>= 1
        return out

    def verify_paths(self, leaf_digests: Sequence[int],
                     indices: Sequence[int], paths: np.ndarray,
                     cap: Sequence[int]) -> bool:
        depth = paths.shape[1] if paths.size else 0
        for k, idx in enumerate(indices):
            cur = int(leaf_digests[k])
            i = int(idx)
            for d in range(depth):
                sib = int(paths[k, d])
                cur = (p2b.hash_elements([sib, cur]) if i & 1
                       else p2b.hash_elements([cur, sib]))
                i >>= 1
            if cur != int(cap[i]):
                return False
        return True
