"""BN254 groundwork: curve laws, MSM, FFT, Kate commitments."""

import numpy as np

from zkevm_harness_tpu.utils import bn254 as bn

R = bn.R


def test_curve_and_subgroup():
    g = bn.G1_GENERATOR
    assert bn.g1_is_on_curve(g)
    assert bn.g1_mul(g, R) is None  # group order
    assert bn.g1_add(bn.g1_mul(g, 11), bn.g1_mul(g, 31)) == bn.g1_mul(g, 42)


def test_msm_matches_naive(rng):
    pts = [bn.g1_mul(bn.G1_GENERATOR, k) for k in range(1, 10)]
    scalars = [int(s) for s in rng.integers(1, 2**63, size=9)]
    want = None
    for p, s in zip(pts, scalars):
        want = bn.g1_add(want, bn.g1_mul(p, s))
    assert bn.g1_msm(pts, scalars) == want


def test_fft_root_and_eval(rng):
    w = bn.fr_root_of_unity(3)
    assert pow(w, 8, R) == 1 and pow(w, 4, R) == R - 1
    poly = [int(v) % R for v in rng.integers(0, 2**63, size=8)]
    evals = bn.fr_fft(poly)
    for i in (0, 3, 7):
        x = pow(w, i, R)
        assert evals[i] == sum(c * pow(x, j, R) for j, c in enumerate(poly)) % R


def test_kate_commitment_homomorphic(rng):
    crs = bn.simulated_crs(8)
    p1 = [int(v) % R for v in rng.integers(0, 2**62, size=8)]
    p2 = [int(v) % R for v in rng.integers(0, 2**62, size=8)]
    c1 = bn.kate_commit(crs, p1)
    c2 = bn.kate_commit(crs, p2)
    csum = bn.kate_commit(crs, [(a + b) % R for a, b in zip(p1, p2)])
    assert bn.g1_add(c1, c2) == csum  # additive homomorphism
