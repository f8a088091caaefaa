"""Recursive-aggregation builders + proof-DAG scheduler tests."""

import numpy as np

from zkevm_harness_tpu.circuits.types import RECURSION_ARITY
from zkevm_harness_tpu.prover import scheduler as sch
from zkevm_harness_tpu.utils.data_source import InMemoryDataSource
from zkevm_harness_tpu.witness import recursion as rec
from zkevm_harness_tpu.witness.queues import QueueSimulator


def make_queue(n):
    q = rec.RecursionQueueSimulator()
    for i in range(n):
        q.push_request(rec.RecursionRequest(1, (i, i + 1, i + 2, i + 3)))
    return q


def test_leaf_split_shapes():
    q = make_queue(70)  # 70 = 32 + 32 + 6
    tasks = rec.create_leaf_witnesses(1, q)
    assert [t.num_items for t in tasks] == [32, 32, 6]
    assert tasks[0].queue_head == (0,) * 12
    assert tasks[0].queue_tail == tuple(tasks[1].queue_head)
    assert tasks[-1].queue_tail == q.tail
    assert tasks[1].proof_indices[0] == 32


def test_node_aggregation_until_single():
    q = make_queue(40)
    leafs = rec.create_leaf_witnesses(1, q)  # 2 leaf tasks
    levels = rec.aggregate_to_single_node(1, leafs)
    assert len(levels) == 1 and len(levels[0]) == 1
    assert levels[0][0].num_items == 40
    # deeper: force multiple levels with many leaves
    q2 = make_queue(33 * 32)  # 33 leaf chunks -> 2 nodes -> 1 node
    leafs2 = rec.create_leaf_witnesses(1, q2)
    assert len(leafs2) == 33
    levels2 = rec.aggregate_to_single_node(1, leafs2)
    assert [len(l) for l in levels2] == [2, 1]


def test_vk_commitments():
    params = rec.compute_leaf_params({1: [1, 2, 3], 2: [4, 5, 6]})
    assert len(params) == 2 and params[0][0] == 1
    com = rec.compute_leaf_vks_and_params_commitment(params)
    assert len(com) == 4 and any(c != 0 for c in com)
    assert rec.commit_vk([1, 2, 3]) == rec.commit_vk([1, 2, 3])
    assert rec.commit_vk([1, 2, 3]) != rec.commit_vk([1, 2, 4])


def test_dag_build_and_run_with_resume():
    queues = {1: make_queue(40), 8: make_queue(5)}
    dag = sch.build_block_dag(queues, {1: 40, 8: 5})
    kinds = [t.kind for t in dag]
    assert kinds.count("base") == 45
    assert kinds.count("leaf") == 3  # 2 for type 1, 1 for type 8
    assert kinds[-1] == "scheduler"

    calls = []

    def prove_fn(task, deps):
        calls.append(task.key())
        return {"task": task.key(), "ndeps": len(deps)}

    src = InMemoryDataSource()
    done = sch.run_dag(dag, prove_fn, src)
    assert len(done) == len(dag)
    sched = done[("scheduler", 1, 0, 0)]
    assert sched["ndeps"] == 2  # one final node per base type
    # resume: nothing recomputed
    calls.clear()
    done2 = sch.run_dag(dag, prove_fn, src)
    assert calls == []
    assert len(done2) == len(dag)


def test_ready_batches_parallel_waves():
    queues = {1: make_queue(40)}
    dag = sch.build_block_dag(queues, {1: 40})
    waves = sch.ready_batches(dag)
    assert len(waves[0]) == 40  # all base proofs in parallel
    assert all(t.kind == "base" for t in waves[0])
    assert waves[-1][0].kind == "scheduler"


def test_run_dag_parallel_matches_sequential():
    """max_workers > 1 dispatches waves concurrently with identical results
    and resume semantics (instance-level data parallelism)."""
    import threading

    queues = {1: make_queue(40), 8: make_queue(5)}
    dag = sch.build_block_dag(queues, {1: 40, 8: 5})

    concurrency = {"cur": 0, "peak": 0}
    lock = threading.Lock()

    def prove_fn(task, deps):
        with lock:
            concurrency["cur"] += 1
            concurrency["peak"] = max(concurrency["peak"], concurrency["cur"])
        import time
        time.sleep(0.005)
        with lock:
            concurrency["cur"] -= 1
        return {"task": task.key(), "ndeps": len(deps)}

    src_seq = InMemoryDataSource()
    done_seq = sch.run_dag(dag, prove_fn, src_seq)
    src_par = InMemoryDataSource()
    done_par = sch.run_dag(dag, prove_fn, src_par, max_workers=8)
    assert done_par.keys() == done_seq.keys()
    assert all(done_par[k] == done_seq[k] for k in done_seq)
    assert concurrency["peak"] > 1  # waves actually ran concurrently

    # resume under parallel dispatch: nothing recomputed
    calls = []

    def prove_fn2(task, deps):
        calls.append(task.key())
        return {}

    done3 = sch.run_dag(dag, prove_fn2, src_par, max_workers=8)
    assert calls == [] and len(done3) == len(dag)
