"""ctypes bindings for the native batch hashers (cpp/libzkhashers.so).

Builds lazily with `make -C cpp` if the shared object is missing; every entry
point has a pure-Python fallback (utils/keccak.py, hashlib.blake2s) so the
framework works without a toolchain. Used by the hash-heavy witness steps:
EIP-4844 linear hashes, L1-message keccak hashing, storage-tree levels.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional, Sequence

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_CPP_DIR, "libzkhashers.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_CPP_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        for name in ("keccak256", "blake2s256"):
            getattr(lib, name).argtypes = [
                ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p]
        for name in ("keccak256_batch", "blake2s256_batch"):
            getattr(lib, name).argtypes = [
                ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
                ctypes.c_char_p]
        lib.tree_node_layer.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                        ctypes.c_char_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _load() is not None


def keccak256(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        from .keccak import keccak256 as py_keccak
        return py_keccak(data)
    out = ctypes.create_string_buffer(32)
    lib.keccak256(data, len(data), out)
    return out.raw


def blake2s256(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        return hashlib.blake2s(data).digest()
    out = ctypes.create_string_buffer(32)
    lib.blake2s256(data, len(data), out)
    return out.raw


def keccak256_batch(items: Sequence[bytes]) -> List[bytes]:
    if not items:
        return []
    stride = len(items[0])
    assert all(len(b) == stride for b in items)
    lib = _load()
    if lib is None:
        from .keccak import keccak256 as py_keccak
        return [py_keccak(b) for b in items]
    blob = b"".join(items)
    out = ctypes.create_string_buffer(32 * len(items))
    lib.keccak256_batch(blob, stride, len(items), out)
    return [out.raw[32 * i:32 * (i + 1)] for i in range(len(items))]


def blake2s256_batch(items: Sequence[bytes]) -> List[bytes]:
    if not items:
        return []
    stride = len(items[0])
    assert all(len(b) == stride for b in items)
    lib = _load()
    if lib is None:
        return [hashlib.blake2s(b).digest() for b in items]
    blob = b"".join(items)
    out = ctypes.create_string_buffer(32 * len(items))
    lib.blake2s256_batch(blob, stride, len(items), out)
    return [out.raw[32 * i:32 * (i + 1)] for i in range(len(items))]
