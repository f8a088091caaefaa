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
        try:
            for msm_name in ("bn254_msm", "bls12381_msm"):
                getattr(lib, msm_name).argtypes = [
                    ctypes.POINTER(ctypes.c_uint64),
                    ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
                    ctypes.POINTER(ctypes.c_uint64)]
        except AttributeError:
            pass  # stale .so without the MSM; fallback stays Python
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


def bn254_msm(points, scalars):
    """Native Pippenger MSM over BN254 G1 (cpp/bn254_msm.cpp).

    points: sequence of affine (x, y) int pairs or None for infinity;
    scalars: ints. Returns (x, y) or None (infinity). Raises RuntimeError
    when the native library is unavailable (callers keep a Python
    fallback)."""
    lib = _load()
    if lib is None or not hasattr(lib, "bn254_msm"):
        raise RuntimeError("native bn254_msm unavailable")
    n = len(points)
    assert n == len(scalars)
    pts = (ctypes.c_uint64 * (8 * n))()
    scs = (ctypes.c_uint64 * (4 * n))()
    m64 = (1 << 64) - 1
    for i, (pt, sc) in enumerate(zip(points, scalars)):
        if pt is not None:
            x, y = int(pt[0]), int(pt[1])
            for j in range(4):
                pts[8 * i + j] = (x >> (64 * j)) & m64
                pts[8 * i + 4 + j] = (y >> (64 * j)) & m64
        s = int(sc)
        for j in range(4):
            scs[4 * i + j] = (s >> (64 * j)) & m64
    out = (ctypes.c_uint64 * 8)()
    lib.bn254_msm(pts, scs, n, out)
    x = sum(int(out[j]) << (64 * j) for j in range(4))
    y = sum(int(out[4 + j]) << (64 * j) for j in range(4))
    if x == 0 and y == 0:
        return None
    return (x, y)


def _curve_msm(fn_name: str, points, scalars, n_limbs: int):
    lib = _load()
    if lib is None or not hasattr(lib, fn_name):
        raise RuntimeError(f"native {fn_name} unavailable")
    n = len(points)
    assert n == len(scalars)
    pts = (ctypes.c_uint64 * (2 * n_limbs * n))()
    scs = (ctypes.c_uint64 * (4 * n))()
    m64 = (1 << 64) - 1
    for i, (pt, sc) in enumerate(zip(points, scalars)):
        if pt is not None:
            x, y = int(pt[0]), int(pt[1])
            base = 2 * n_limbs * i
            for j in range(n_limbs):
                pts[base + j] = (x >> (64 * j)) & m64
                pts[base + n_limbs + j] = (y >> (64 * j)) & m64
        s = int(sc)
        for j in range(4):
            scs[4 * i + j] = (s >> (64 * j)) & m64
    out = (ctypes.c_uint64 * (2 * n_limbs))()
    getattr(lib, fn_name)(pts, scs, n, out)
    x = sum(int(out[j]) << (64 * j) for j in range(n_limbs))
    y = sum(int(out[n_limbs + j]) << (64 * j) for j in range(n_limbs))
    if x == 0 and y == 0:
        return None
    return (x, y)


def bls12381_msm(points, scalars):
    """Native Pippenger MSM over BLS12-381 G1 (EIP-4844 KZG commitments;
    reference kzg/src/lib.rs:195-217). Same contract as bn254_msm."""
    return _curve_msm("bls12381_msm", points, scalars, 6)
