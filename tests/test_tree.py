"""Sparse storage Merkle tree tests (Blake2s, enumeration indices)."""

import numpy as np

from zkevm_harness_tpu.witness import tree as tr


def key(i: int) -> bytes:
    return i.to_bytes(32, "little")


def test_empty_tree_and_default_query():
    t = tr.SparseStorageTree()
    assert t.next_enumeration_index == 1
    q = t.get_leaf(key(12345))
    assert q.leaf.index == 0 and q.leaf.value == b"\x00" * 32
    assert tr.SparseStorageTree.verify_inclusion(t.root, q)


def test_insert_get_verify():
    t = tr.SparseStorageTree()
    v1 = b"\x11" * 32
    q1 = t.insert_leaf(key(5), v1)
    assert q1.first_write and q1.leaf.index == 1
    assert tr.SparseStorageTree.verify_inclusion(t.root, q1)
    # second insert at a different slot
    q2 = t.insert_leaf(key(1 << 200), b"\x22" * 32)
    assert q2.first_write and q2.leaf.index == 2
    assert tr.SparseStorageTree.verify_inclusion(t.root, q2)
    # the old query's path is stale now, but a fresh read verifies
    q1b = t.get_leaf(key(5))
    assert q1b.leaf.value == v1 and q1b.leaf.index == 1
    assert tr.SparseStorageTree.verify_inclusion(t.root, q1b)
    # update keeps the enumeration index
    q1c = t.insert_leaf(key(5), b"\x33" * 32)
    assert not q1c.first_write and q1c.leaf.index == 1
    assert tr.SparseStorageTree.verify_inclusion(t.root, q1c)
    # wrong root fails
    assert not tr.SparseStorageTree.verify_inclusion(b"\x00" * 32, q1c)


def test_root_changes_and_is_order_independent_for_disjoint_keys():
    t1 = tr.SparseStorageTree()
    t2 = tr.SparseStorageTree()
    t1.insert_leaf(key(1), b"\xaa" * 32)
    t1.insert_leaf(key(2), b"\xbb" * 32)
    # different insertion order -> same values but enum indices differ,
    # so roots differ (enumeration is part of the leaf hash)
    t2.insert_leaf(key(2), b"\xbb" * 32)
    t2.insert_leaf(key(1), b"\xaa" * 32)
    assert t1.root != t2.root
    # same order => same root
    t3 = tr.SparseStorageTree()
    t3.insert_leaf(key(1), b"\xaa" * 32)
    t3.insert_leaf(key(2), b"\xbb" * 32)
    assert t1.root == t3.root


def test_filter_renumerate():
    t = tr.SparseStorageTree()
    t.insert_leaf(key(10), b"\x01" * 32)  # enum 1
    nxt, first, updates = t.filter_renumerate(
        [key(10), key(20), key(30)],
        [b"\x0a" * 32, b"\x0b" * 32, b"\x0c" * 32])
    assert nxt == 4  # started at 2, two first-writes
    assert [f[1].index for f in first] == [2, 3]
    assert len(updates) == 1 and updates[0].index == 1
    # tree unchanged
    assert t.next_enumeration_index == 2
