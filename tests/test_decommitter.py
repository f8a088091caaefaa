"""Code decommitter witness: versioned hashing + write-stream chunking."""

import pytest

from zkevm_harness_tpu.vm.environment import DecommittmentQuery
from zkevm_harness_tpu.witness import decommitter as dc


def test_bytecode_hash_format():
    words = [1, 2, 3]
    h = dc.bytecode_hash(words)
    b = h.to_bytes(32, "big")
    assert b[0] == 0x01 and b[1] == 0x00
    assert int.from_bytes(b[2:4], "big") == 3


def test_decompose_and_mismatch():
    words_a = [10, 20, 30, 40, 50]
    words_b = [7]
    ha, hb = dc.bytecode_hash(words_a), dc.bytecode_hash(words_b)
    queries = [DecommittmentQuery(ha, 100, 8, 5, True),
               DecommittmentQuery(hb, 120, 9, 1, True)]
    insts = dc.compute_decommitter_circuit_snapshots(
        queries, {ha: words_a, hb: words_b}, capacity=4)
    assert [len(i.writes) for i in insts] == [4, 2]
    assert insts[0].writes[0].location.page == 8
    assert insts[1].completion_flag
    assert hb in insts[1].hashes_covered
    # tampered bytecode rejected
    with pytest.raises(AssertionError):
        dc.compute_decommitter_circuit_snapshots(
            queries, {ha: words_a, hb: [8]}, capacity=4)
