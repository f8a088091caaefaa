"""Storage application: tree updates with path witnesses + FSM roots."""

from zkevm_harness_tpu.vm.environment import LogQuery
from zkevm_harness_tpu.witness import storage_application as sa
from zkevm_harness_tpu.witness.tree import SparseStorageTree


def wq(key, value, addr=0xAA):
    return LogQuery(0, 0, 0, 0, addr, key, 0, value, rw_flag=True)


def rq(key, value, addr=0xAA):
    return LogQuery(0, 0, 0, 0, addr, key, value, value, rw_flag=False)


def test_apply_writes_and_reads():
    tree = SparseStorageTree()
    queries = [wq(1, 100), wq(2, 200), rq(1, 100), wq(1, 150)]
    insts = sa.decompose_into_storage_application_witnesses(tree, queries,
                                                           capacity=3)
    assert len(insts) == 2
    assert insts[0].start_flag and insts[1].completion_flag
    # FSM: roots chain across instances
    assert insts[0].final_root == insts[1].initial_root
    assert insts[0].initial_root != insts[0].final_root
    # enumeration: two first writes in instance 0, none in instance 1 (update)
    assert insts[0].final_next_enumeration_index == 3
    assert insts[1].final_next_enumeration_index == 3
    assert not insts[1].queries[0].first_write
    # final state readable
    q = tree.get_leaf(sa.storage_key_to_index(0xAA, 1))
    assert int.from_bytes(q.leaf.value, "big") == 150
    assert SparseStorageTree.verify_inclusion(tree.root, q)


def test_protective_read_mismatch_asserts():
    import pytest
    tree = SparseStorageTree()
    with pytest.raises(AssertionError):
        sa.decompose_into_storage_application_witnesses(
            tree, [rq(9, 123)], capacity=4)  # slot empty, read says 123
