"""Compression orchestration + PI compression tests."""

import pytest

from zkevm_harness_tpu.prover import compression as cp
from zkevm_harness_tpu.utils.data_source import InMemoryDataSource


def test_pi_compression_packing():
    pis = [1, 2, 3, 4]
    got = cp.compress_stark_pi_to_snark_pi(pis)
    want = (1 << (56 * 3)) + (2 << (56 * 2)) + (3 << 56) + 4
    assert got == want % cp.BN254_FR
    # order sensitivity
    assert cp.compress_stark_pi_to_snark_pi([4, 3, 2, 1]) != got


def test_wrapper_config_layers():
    cfg = cp.WrapperConfig(compression_layers=3)
    assert cfg.get_compression_types() == [1, 2]
    assert cfg.get_final_compression_type() == 3
    with pytest.raises(AssertionError):
        cp.WrapperConfig(compression_layers=6)


def test_compression_chain_with_resume():
    calls = []

    def prove_fn(mode, prev):
        calls.append(mode)
        return {"mode": mode, "prev": prev["mode"] if isinstance(prev, dict)
                else "scheduler"}, {"vk": mode}

    def verify_fn(mode, proof, vk):
        return proof["mode"] == mode

    src = InMemoryDataSource()
    out = cp.wrap_proof({"mode": "scheduler"}, [1, 2, 3, 4],
                        cp.WrapperConfig(3), prove_fn, verify_fn, src)
    assert calls == [1, 2, 3]
    assert out["final_proof"]["mode"] == 3
    assert out["final_proof"]["prev"] == 2
    assert src.get_compression_proof(1) is not None
    # resume: modes 1..k-1 skipped, final recomputed
    calls.clear()
    cp.wrap_proof({"mode": "scheduler"}, [1, 2, 3, 4], cp.WrapperConfig(3),
                  prove_fn, verify_fn, src)
    assert calls == [3]


def test_failed_verification_aborts():
    def prove_fn(mode, prev):
        return {"mode": mode}, {}

    def verify_fn(mode, proof, vk):
        return False

    with pytest.raises(AssertionError):
        cp.wrap_proof({"m": 0}, [0, 0, 0, 0], cp.WrapperConfig(2),
                      prove_fn, verify_fn)
