"""Typed per-layer prover surface: setup caching + prove/verify dispatch."""

from zkevm_harness_tpu.prover import layers as ly
from zkevm_harness_tpu.utils.data_source import InMemoryDataSource


def test_all_base_types_are_real():
    """Every base-layer type has a REAL gate set — the flagship stand-in
    registry is empty (round-1's random-witness path is gone)."""
    assert ly.BASE_REGISTRY == {}
    assert ly.REAL_BASE_CIRCUITS == set(range(1, 14))


def test_main_vm_setup_roundtrip():
    """Typed setup caching + VK recording on the real MainVM surface."""
    src = InMemoryDataSource()
    sd, geo = ly.main_vm_setup_data(5, source=src)
    assert src.get_base_layer_vk(1) == sd.vk
    sd2, _ = ly.main_vm_setup_data(5)
    assert sd2 is sd  # cache identity


def test_ram_instance_surface(rng):
    """prove_ram_instance/verify_ram_instance over decomposer payloads."""
    import numpy as np

    from zkevm_harness_tpu.vm.environment import MemoryLocation, MemoryQuery
    from zkevm_harness_tpu.witness import ram_permutation as rp

    qs = []
    mem = {}
    for i in range(6):
        page, index = int(rng.integers(1, 3)), int(rng.integers(0, 4))
        write = bool(rng.integers(0, 2))
        value = (int.from_bytes(rng.bytes(8), "little") if write
                 else mem.get((page, index), 0))
        if write:
            mem[(page, index)] = value
        qs.append(MemoryQuery(timestamp=8 + 2 * i,
                              location=MemoryLocation(page, index),
                              value=value, rw_flag=write))
    cap = 4
    art = rp.compute_ram_circuit_snapshots(qs, capacity=cap)
    assert len(art.instances) == 2
    src = InMemoryDataSource()
    for inst_w in art.instances:
        proof = ly.prove_ram_instance(inst_w, art.challenges, cap, src)
        assert ly.verify_ram_instance(inst_w, art.challenges, cap, proof)
    assert src.get_base_layer_vk(8) is not None
    # a proof does not verify against the OTHER instance's payload
    assert not ly.verify_ram_instance(art.instances[0], art.challenges, cap,
                                      proof)


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
