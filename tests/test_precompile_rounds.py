"""Keccak/sha256 round-function decomposers: digests match libraries."""

import hashlib

import numpy as np

from zkevm_harness_tpu.utils.keccak import keccak256 as py_keccak
from zkevm_harness_tpu.witness import precompile_rounds as pr


def test_keccak_rounds_digest_matches(rng):
    calls = [b"", b"abc", bytes(rng.integers(0, 256, size=300, dtype=np.uint8))]
    art = pr.keccak256_decompose(calls, capacity=2)
    assert art.digests == [py_keccak(c) for c in calls]
    # 300 bytes -> 3 permutations; total invocations 1 + 1 + 3 = 5
    assert len(art.invocations) == 5
    assert [len(i) for i in art.instances] == [2, 2, 1]
    # chaining within a call: state_out of round r == state_in of round r+1
    c2 = [v for v in art.invocations if v.call_index == 2]
    for a, b in zip(c2, c2[1:]):
        assert a.state_out == b.state_in
    assert c2[0].state_in == tuple([0] * 25)


def test_sha256_rounds_digest_matches(rng):
    calls = [b"abc", bytes(rng.integers(0, 256, size=120, dtype=np.uint8))]
    art = pr.sha256_decompose(calls, capacity=10)
    assert art.digests == [hashlib.sha256(c).digest() for c in calls]
    # 120 bytes + padding(9) = 129 -> 3 compressions; "abc" -> 1
    assert len(art.invocations) == 4
