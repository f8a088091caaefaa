"""Pallas Goldilocks mul kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import pallas_kernels as pkn


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
