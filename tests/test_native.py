"""Native hashers vs Python/hashlib references."""

import hashlib

import numpy as np
import pytest

from zkevm_harness_tpu.utils import native
from zkevm_harness_tpu.utils.keccak import keccak256 as py_keccak


def test_native_lib_loads():
    assert native.have_native(), "cpp/libzkhashers.so should build"


def test_keccak_matches_python(rng):
    for size in (0, 1, 31, 64, 135, 136, 137, 500):
        data = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        assert native.keccak256(data) == py_keccak(data)


def test_blake2s_matches_hashlib(rng):
    for size in (0, 1, 40, 63, 64, 65, 128, 200):
        data = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        assert native.blake2s256(data) == hashlib.blake2s(data).digest()


def test_batch_hashers(rng):
    items = [bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
             for _ in range(17)]
    assert native.keccak256_batch(items) == [py_keccak(b) for b in items]
    assert native.blake2s256_batch(items) == \
        [hashlib.blake2s(b).digest() for b in items]
