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


def test_leaf_queue_segment_proof():
    from zkevm_harness_tpu.witness import recursion as rec
    q = rec.RecursionQueueSimulator()
    for i in range(4):
        q.push_request(rec.RecursionRequest(1, (i, i, i, i)))
    tasks = rec.create_leaf_witnesses(1, q, arity=2)
    assert len(tasks) == 2
    cfg = ly.pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8,
                               final_fri_size=16)
    proof, vk = ly.prove_leaf_queue_segment(tasks[1], cfg)
    assert ly.verify_leaf_queue_segment(tasks[1], proof, vk, cfg)
    # proof does not transfer to a different segment (head/tail mismatch)
    assert not ly.verify_leaf_queue_segment(tasks[0], proof, vk, cfg)
