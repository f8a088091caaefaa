"""Typed per-layer prover surface: setup caching + prove/verify dispatch."""

from zkevm_harness_tpu.circuits import flagship as fl
from zkevm_harness_tpu.prover import layers as ly
from zkevm_harness_tpu.utils.data_source import InMemoryDataSource


def test_base_layer_roundtrip():
    src = InMemoryDataSource()
    sd = ly.create_base_layer_setup_data(8, src)  # RAM permutation slot
    assert src.get_base_layer_vk(8) == sd.vk
    # setup reused across instances (cache identity)
    assert ly.create_base_layer_setup_data(8) is sd
    witness = fl.flagship_witness(sd.ir)
    proof = ly.prove_base_layer_circuit(8, witness)
    assert ly.verify_base_layer_proof(8, proof)
    # wrong-type verify fails (different setup/vk)
    assert not ly.verify_base_layer_proof(8, proof, vk=[0] * len(sd.vk))
