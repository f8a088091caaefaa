"""Poseidon2 Merkle tree with cap, batched per level for TPU.

TPU-native replacement for boojum's `MerkleTreeWithCap` (reference:
src/prover_utils.rs:185-196 setup returns a Merkle tree with cap; proof config
cap sizes 8/16/256 per layer — circuit_definitions/src/lib.rs:28-57,
aux_layer/compression_modes). Each level is one batched Poseidon2 call over
all nodes, so the whole tree build is log2(n) fused kernels.

Digests are 4 Goldilocks elements. The tree stops at `cap_size` nodes; the cap
(all nodes at that level) is the commitment absorbed into the transcript.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from . import poseidon2 as p2
from .goldilocks import GF

DIGEST_WIDTH = 4


class MerkleTree(NamedTuple):
    # levels[0] = leaf digests (n, 4); levels[-1] = cap (cap_size, 4)
    levels: Tuple[GF, ...]

    @property
    def cap(self) -> GF:
        return self.levels[-1]

    @property
    def depth(self) -> int:
        return len(self.levels) - 1


def hash_leaves(rows: GF) -> GF:
    """(n, w) leaf rows -> (n, 4) leaf digests (one batched sponge)."""
    return p2.hash_elements(rows)


@functools.partial(jax.jit, static_argnums=(1,))
def commit(rows: GF, cap_size: int) -> MerkleTree:
    """Single fused kernel: leaf hashing + full tree build.

    One XLA program per (shape, cap) — the per-level python loop unrolls at
    trace time, so a whole commitment is ONE device dispatch (critical when
    driving the chip over a high-latency link).
    """
    return build_tree(hash_leaves(rows), cap_size)


def build_tree(leaf_digests: GF, cap_size: int) -> MerkleTree:
    n = leaf_digests.shape[0]
    assert n & (n - 1) == 0 and cap_size & (cap_size - 1) == 0
    assert n >= cap_size
    levels: List[GF] = [leaf_digests]
    cur = leaf_digests
    while cur.shape[0] > cap_size:
        pairs = cur.reshape(cur.shape[0] // 2, 2, DIGEST_WIDTH)
        cur = p2.hash_two_to_one(pairs[:, 0, :], pairs[:, 1, :])
        levels.append(cur)
    return MerkleTree(tuple(levels))


def open_indices(tree: MerkleTree, indices: np.ndarray) -> GF:
    """Sibling digests along the paths for `indices` -> (q, depth, 4)."""
    idx = jnp.asarray(np.asarray(indices, dtype=np.uint32))
    sibs = []
    cur = idx
    for level in tree.levels[:-1]:
        sib_idx = cur ^ 1
        sibs.append(gl.take(level, sib_idx, axis=0))
        cur = cur >> 1
    return gl.stack(sibs, axis=1) if sibs else gl.zeros((len(indices), 0, DIGEST_WIDTH))


def verify_paths(leaf_digests: GF, indices, paths: GF, cap: GF,
                 n_leaves: int = None, cap_size: int = None) -> jax.Array:
    """Recompute roots from (q,4) leaves + (q,depth,4) sibling paths vs cap.

    Returns a (q,) bool array. When `n_leaves`/`cap_size` are given (every
    verifier MUST pass them), the proof-supplied geometry is validated
    against them: path depth must be exactly log2(n_leaves/cap_size), the
    cap must have exactly cap_size entries, and indices must be in range —
    otherwise an attacker chooses the tree depth/cap size via the proof and
    the clamped gathers below silently accept out-of-range cap indices.
    """
    idx_np = np.asarray(indices, dtype=np.uint64)
    if n_leaves is not None:
        assert cap_size is not None
        expected_depth = (n_leaves // cap_size).bit_length() - 1
        if (paths.shape[1] != expected_depth or cap.shape[0] != cap_size
                or leaf_digests.shape[0] != len(idx_np)
                or (len(idx_np) and int(idx_np.max()) >= n_leaves)):
            return jnp.zeros((len(idx_np),), dtype=bool)
    idx = jnp.asarray(idx_np.astype(np.uint32))
    cur = leaf_digests
    depth = paths.shape[1]
    for d in range(depth):
        sib = paths[:, d, :]
        bit = (idx >> d) & 1
        left = gl.select((bit == 0)[:, None], cur, sib)
        right = gl.select((bit == 0)[:, None], sib, cur)
        cur = p2.hash_two_to_one(left, right)
    cap_idx = idx >> depth
    expected = gl.take(cap, cap_idx, axis=0)
    return jnp.all(jnp.asarray(gl.equal(cur, expected)), axis=-1)
