"""Data-source (checkpoint/resume) and circuit-type registry tests."""

from zkevm_harness_tpu.circuits import types as ct
from zkevm_harness_tpu.utils.data_source import InMemoryDataSource, LocalFileDataSource


def test_circuit_type_numbering():
    assert int(ct.BaseLayerCircuitType.MAIN_VM) == 1
    assert int(ct.BaseLayerCircuitType.L1_MESSAGES_HASHER) == 13
    assert int(ct.RecursionLayerCircuitType.SCHEDULER) == 1
    assert int(ct.RecursionLayerCircuitType.NODE) == 2
    assert ct.leaf_for(ct.BaseLayerCircuitType.MAIN_VM) == \
        ct.RecursionLayerCircuitType.LEAF_MAIN_VM
    assert ct.base_for_leaf(ct.RecursionLayerCircuitType.LEAF_L1_MESSAGES_HASHER) == \
        ct.BaseLayerCircuitType.L1_MESSAGES_HASHER
    assert ct.RECURSION_ARITY == 32
    assert ct.SCHEDULER_CAPACITY == 24100
    assert ct.COMPRESSION_PROOF_CONFIGS[ct.CompressionMode.MODE_4].merkle_cap_size == 256


def test_in_memory_roundtrip():
    ds = InMemoryDataSource()
    assert ds.get_base_layer_proof(1, 0) is None
    ds.set_base_layer_proof({"p": 1}, 1, 0)
    assert ds.get_base_layer_proof(1, 0) == {"p": 1}
    ds.set_node_layer_proof({"n": 2}, 3, 1, 4)
    assert ds.get_node_layer_proof(3, 1, 4) == {"n": 2}
    assert ds.get_node_layer_proof(3, 1, 5) is None


def test_local_file_resume(tmp_path):
    ds = LocalFileDataSource(str(tmp_path))
    assert ds.get_base_layer_vk(1) is None
    ds.set_base_layer_vk({"vk": [1, 2, 3]}, 1)
    # a fresh instance sees the artifact (resume)
    ds2 = LocalFileDataSource(str(tmp_path))
    assert ds2.get_base_layer_vk(1) == {"vk": [1, 2, 3]}
    assert (tmp_path / "setup" / "base_layer" / "vk_1.json").exists()
    ds2.set_scheduler_proof({"s": 1})
    assert ds2.get_scheduler_proof() == {"s": 1}


def test_sequencer_api_commitments():
    from zkevm_harness_tpu.utils import sequencer_api as sq
    from zkevm_harness_tpu.vm.environment import LogQuery
    ev = [LogQuery(5, 0, 1, 0, 0xAA, 1, 0, 2, True)]
    c1 = sq.events_queue_commitment(ev)
    assert c1 != (0, 0, 0, 0)
    assert sq.events_queue_commitment([]) == (0, 0, 0, 0)
    h1 = sq.initial_heap_content_commitment([1, 2, 3])
    h2 = sq.initial_heap_content_commitment([1, 2, 4])
    # full-width memory queues carry 12-lane sponge-state tails
    # (memory_query.rs:120-128 / FullWidthQueueSimulator)
    assert h1 != h2 and len(h1) == 12
    # re-exports present
    assert sq.GeometryConfig and sq.sort_storage_access_queries
