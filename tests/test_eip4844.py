"""Keccak + EIP-4844 witness chain tests."""

import os

import numpy as np
import pytest

from zkevm_harness_tpu.utils import bls12_381 as bls
from zkevm_harness_tpu.utils import kzg
from zkevm_harness_tpu.utils.keccak import keccak256
from zkevm_harness_tpu.witness import eip4844

R = bls.R


def test_keccak256_vectors():
    assert keccak256(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert keccak256(b"abc").hex() == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    # multi-block (> 136 bytes)
    assert keccak256(b"a" * 200).hex() == keccak256(b"a" * 200).hex()
    import hashlib
    assert keccak256(b"abc") != hashlib.sha3_256(b"abc").digest()


def test_fr_fft_roundtrip_and_eval():
    rng = np.random.default_rng(0)
    n = 16
    poly = [int(v) % R for v in rng.integers(0, 2**63, size=n)]
    evals = eip4844.fr_fft(poly)
    w = bls.fr_root_of_unity(4)
    for i in [0, 1, 7, 15]:
        x = pow(w, i, R)
        want = sum(c * pow(x, j, R) for j, c in enumerate(poly)) % R
        assert evals[i] == want


def test_witness_chain_small_domain():
    n = 8
    settings = kzg.KzgSettings.testing(n)
    rng = np.random.default_rng(1)
    blob = bytes(rng.integers(0, 256, size=31 * n, dtype=np.uint8))
    chunks, linear_hash, versioned_hash, output_hash = \
        eip4844.generate_eip4844_witness(blob, settings)
    assert len(chunks) == n and all(len(c) == 31 for c in chunks)
    assert versioned_hash[0] == 1
    assert linear_hash == keccak256(blob)
    assert len(output_hash) == 32
    # deterministic
    again = eip4844.generate_eip4844_witness(blob, settings)
    assert again[3] == output_hash
    # commitment consistency: commit(evals in brp) opens to p(x) at FS point
    poly = eip4844.pubdata_to_monomial_poly(blob, n)
    evals_brp = kzg.bit_reverse_permute(eip4844.fr_fft(poly), 3)
    commitment = kzg.compute_commitment(settings, evals_brp)
    x = int.from_bytes(keccak256(linear_hash + versioned_hash)[16:], "big") % R
    y, proof = kzg.compute_proof(settings, evals_brp, x)
    want_y = sum(c * pow(x, j, R) for j, c in enumerate(poly)) % R
    assert y == want_y
    assert kzg.verify_kzg_proof(settings, commitment, x, y, proof)


@pytest.mark.skipif(os.environ.get("ZKTPU_SLOW") != "1",
                    reason="full 4096-point MSM is slow; set ZKTPU_SLOW=1")
def test_witness_chain_full_blob():
    settings = kzg.KzgSettings()
    assert settings.g1_lagrange_brp is not None
    rng = np.random.default_rng(2)
    blob = bytes(rng.integers(0, 256, size=31 * 4096, dtype=np.uint8))
    chunks, linear_hash, versioned_hash, output_hash = \
        eip4844.generate_eip4844_witness(blob, settings)
    assert versioned_hash[0] == 1
