"""BLS12-381 group/pairing laws + KZG commit/prove/verify roundtrip."""

import os

import numpy as np
import pytest

from zkevm_harness_tpu.utils import bls12_381 as bls
from zkevm_harness_tpu.utils import kzg

R = bls.R


def test_generators_on_curve():
    assert bls.g1_is_on_curve(bls.G1_GENERATOR)
    assert bls.g2_is_on_curve(bls.G2_GENERATOR)
    # subgroup order
    assert bls.g1_mul(bls.G1_GENERATOR, R) is None
    assert bls.g2_mul(bls.G2_GENERATOR, R) is None


def test_group_laws():
    g = bls.G1_GENERATOR
    assert bls.g1_add(bls.g1_mul(g, 5), bls.g1_mul(g, 7)) == bls.g1_mul(g, 12)
    h = bls.G2_GENERATOR
    assert bls.g2_add(bls.g2_mul(h, 5), bls.g2_mul(h, 7)) == bls.g2_mul(h, 12)


def test_compression_roundtrip():
    for k in (1, 2, 12345):
        p = bls.g1_mul(bls.G1_GENERATOR, k)
        assert bls.g1_decompress(bls.g1_compress(p)) == p


def test_msm_matches_naive():
    rng = np.random.default_rng(0)
    pts = [bls.g1_mul(bls.G1_GENERATOR, int(k)) for k in range(1, 9)]
    scalars = [int(s) for s in rng.integers(0, 2**63, size=8)]
    want = None
    for p, s in zip(pts, scalars):
        want = bls.g1_add(want, bls.g1_mul(p, s))
    assert bls.g1_msm(pts, scalars) == want


def test_pairing_bilinearity():
    e_ab = bls.pairing(bls.g1_mul(bls.G1_GENERATOR, 6),
                       bls.g2_mul(bls.G2_GENERATOR, 5))
    e_base = bls.pairing(bls.G1_GENERATOR, bls.G2_GENERATOR)
    assert e_ab == bls.f12_pow(e_base, 30)
    assert e_base != bls.F12_ONE
    # non-degenerate + inverse law via combined check
    assert bls.pairings_equal(
        [(bls.g1_mul(bls.G1_GENERATOR, 6), bls.g2_mul(bls.G2_GENERATOR, 5))],
        [(bls.g1_mul(bls.G1_GENERATOR, 30), bls.G2_GENERATOR)])


def test_kzg_roundtrip_small():
    settings = kzg.KzgSettings.testing(8)
    rng = np.random.default_rng(1)
    blob = [int(v) % R for v in rng.integers(0, 2**63, size=8)]
    commitment = kzg.compute_commitment(settings, blob)
    z = 0xDEADBEEF12345
    y, proof = kzg.compute_proof(settings, blob, z)
    assert kzg.verify_kzg_proof(settings, commitment, z, y, proof)
    # wrong evaluation rejected
    assert not kzg.verify_kzg_proof(settings, commitment, z, (y + 1) % R, proof)
    # in-domain opening
    z_in = settings.reversed_roots[3]
    y_in, proof_in = kzg.compute_proof(settings, blob, z_in)
    assert y_in == blob[3]
    assert kzg.verify_kzg_proof(settings, commitment, z_in, y_in, proof_in)


@pytest.mark.skipif(not os.path.exists("/root/reference/kzg/src/trusted_setup.json"),
                    reason="ceremony setup file unavailable")
def test_real_setup_loads_first_points():
    # decompress a few ceremony points without building the full 4096 MSM
    import json
    with open("/root/reference/kzg/src/trusted_setup.json") as f:
        data = json.load(f)
    for h in data["g1_lagrange"][:4]:
        p = bls.g1_decompress(bytes.fromhex(h[2:]))
        assert bls.g1_is_on_curve(p)
