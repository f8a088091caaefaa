"""Pallas Goldilocks mul kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import pallas_kernels as pkn


def test_poseidon2_kernel_math_matches_xla(rng):
    """The pallas Poseidon2 kernel body, run on array-backed refs, must be
    bit-identical to ops.poseidon2.permute (the kernel routes every TPU
    merkle/transcript hash, so a mismatch would break every proof).

    interpret=True for the full pallas_call takes >10 min on XLA:CPU (fat
    limb graphs — CLAUDE.md); the array-ref path compiles the same kernel
    jaxpr in ~1 min, leaving only BlockSpec/SMEM plumbing to the TPU-side
    check in tools/kernel_bench.py.
    """
    from zkevm_harness_tpu.ops import poseidon2 as p2
    vals = rng.integers(0, gl.P, size=(16, 12), dtype=np.uint64)
    vals[0] = gl.P - 1
    vals[1, :6] = 0
    vals[1, 6:] = gl.P - 2
    vals[2] = 0
    state = gl.from_u64(vals)
    ref = gl.to_u64(p2._permute_xla(state))
    got = gl.to_u64(pkn.poseidon2_kernel_reference(state))
    assert np.array_equal(ref, got)


def test_poseidon2_supported_gating():
    """Pallas route only for TPU-backed, block-tiling batches."""
    # on CPU (test env) the dispatcher must never pick pallas
    assert not pkn.poseidon2_supported((pkn._P2_BLOCK_B, 12))
    assert not pkn.poseidon2_supported((4, 12))


@pytest.mark.skipif(not pkn.HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_mul_matches_xla(rng):
    n = 8 * 128 * 2
    va = [int(v) % gl.P for v in rng.integers(0, gl.P, size=n, dtype=np.uint64)]
    vb = [int(v) % gl.P for v in rng.integers(0, gl.P, size=n, dtype=np.uint64)]
    edges = [0, 1, gl.P - 1, gl.P - 2, 0xFFFFFFFF, 1 << 32, (1 << 63), 7]
    va[:8] = [e % gl.P for e in edges]
    vb[:8] = [e % gl.P for e in reversed(edges)]
    a, b = gl.from_int(va), gl.from_int(vb)
    want = gl.mul(a, b)
    got = pkn.pallas_mul(a, b)
    assert bool(np.all(np.asarray(gl.equal(got, want))))
