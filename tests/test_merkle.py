"""Merkle tree + path verification tests."""

import numpy as np

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import merkle as mk


def test_build_open_verify(rng):
    n, w, cap = 64, 6, 4
    rows = gl.from_int(rng.integers(0, 2**63, size=(n, w), dtype=np.uint64))
    tree = mk.build_tree(mk.hash_leaves(rows), cap)
    assert tree.cap.shape == (cap, 4)
    assert tree.depth == 4  # 64 -> 4 levels of halving to reach cap 4
    idx = np.array([0, 1, 17, 63, 33], dtype=np.uint32)
    paths = mk.open_indices(tree, idx)
    leaves = gl.take(mk.hash_leaves(rows), idx, axis=0)
    ok = mk.verify_paths(leaves, idx, paths, tree.cap)
    assert bool(np.all(np.asarray(ok)))
    # wrong leaf fails
    bad = gl.GF(np.asarray(leaves.lo) ^ 1, np.asarray(leaves.hi))
    ok2 = mk.verify_paths(bad, idx, paths, tree.cap)
    assert not bool(np.any(np.asarray(ok2)))


def test_cap_equals_leaves():
    rows = gl.from_int(np.arange(8 * 4).reshape(8, 4))
    digests = mk.hash_leaves(rows)
    tree = mk.build_tree(digests, 8)
    assert tree.depth == 0
    idx = np.arange(8, dtype=np.uint32)
    paths = mk.open_indices(tree, idx)
    ok = mk.verify_paths(digests, idx, paths, tree.cap)
    assert bool(np.all(np.asarray(ok)))
